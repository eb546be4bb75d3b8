package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ManifestTable
import graft.sinks.ManifestTable.Manifest

/** The manifest is a hand-rolled flat-JSON format with a regex parser —
  * deliberately dependency-free, but that makes render→parse identity a
  * PROPERTY, not a given: every field added over the rounds (txns,
  * dirRows, dirStats with s64 string bounds, bloomCols, tombstone
  * coverage sets) extends both sides, and a silent round-trip loss in
  * any of them corrupts commits, statistics, or delete semantics. This
  * spec drives the whole value space the renderer accepts (the
  * manifest-safe charsets it enforces with require) through render →
  * parse and demands exact structural identity — a regression in either
  * direction fails here before any table does.
  */
class ManifestRoundTripSpec extends AnyFunSuite {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (h :: t).mkString

  private val dirPath: Gen[String] = for {
    a <- Gen.listOfN(8, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '_', '-')))
    b <- Gen.chooseNum(0, 64)
  } yield s"data/${a.mkString}/b=$b"

  private val numBound: Gen[(String, String)] = for {
    lo <- Gen.chooseNum(-1e12, 1e12)
    hi <- Gen.chooseNum(-1e12, 1e12)
  } yield (BigDecimal(math.min(lo, hi)).underlying.toPlainString,
           BigDecimal(math.max(lo, hi)).underlying.toPlainString)

  private val strBound: Gen[(String, String)] = for {
    a <- Gen.listOfN(6, Gen.asciiPrintableChar).map(_.mkString)
    b <- Gen.listOfN(6, Gen.asciiPrintableChar).map(_.mkString)
  } yield {
    val (lo, hi) = if (a <= b) (a, b) else (b, a)
    (ManifestTable.encodeBound(lo.getBytes("UTF-8")),
     ManifestTable.encodeBound(hi.getBytes("UTF-8")))
  }

  private val manifest: Gen[Manifest] = for {
    version <- Gen.chooseNum(1, 99999999)
    nBuckets <- Gen.chooseNum(1, 64)
    keyCol <- ident
    cols <- Gen.nonEmptyListOf(ident).map(_.distinct)
    buckets <- Gen.mapOf(for {
      b <- Gen.chooseNum(0, 63)
      ds <- Gen.nonEmptyListOf(dirPath).map(_.distinct.take(4))
    } yield b -> ds)
    txns <- Gen.mapOf(for {
      a <- ident; v <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield a -> v)
    dirRows <- Gen.mapOf(for {
      d <- dirPath; n <- Gen.chooseNum(0L, 1L << 40)
    } yield d -> n)
    dirStats <- Gen.mapOf(for {
      d <- dirPath
      st <- Gen.mapOf(for {
        c <- ident
        bd <- Gen.oneOf(numBound, strBound)
      } yield c -> bd)
    } yield d -> st)
    bloomCols <- Gen.listOf(ident).map(_.distinct)
    droppedCols <- Gen.listOf(ident).map(_.distinct)
    tombstones <- Gen.mapOf(for {
      b <- Gen.chooseNum(0, 63)
      es <- Gen.listOf(for {
        ts <- dirPath
        over <- Gen.nonEmptyListOf(dirPath).map(_.distinct.take(3))
      } yield (ts, over)).map(_.take(3))
    } yield b -> es)
    dirFiles <- Gen.mapOf(for {
      d <- dirPath
      fs <- Gen.listOf(for {
        n <- Gen.listOfN(10, Gen.oneOf(Gen.alphaNumChar,
          Gen.oneOf('.', '_', '-'))).map(x => s"part-${x.mkString}.parquet")
        b <- Gen.chooseNum(0L, 1L << 38)
      } yield (n, b)).map(_.take(3))
    } yield d -> fs)
    dirNdv <- Gen.mapOf(for {
      d <- dirPath
      nv <- Gen.mapOf(for {
        c <- ident
        nulls <- Gen.chooseNum(0L, 1L << 40)
        hx <- Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq))
          .map(_.mkString)
      } yield c -> s"${nulls}n$hx")
    } yield d -> nv)
    writerVersion <- Gen.chooseNum(0, 3)
    constraints <- Gen.mapOf(for {
      n <- ident.suchThat(x => !Set("version", "writerVersion", "nBuckets",
        "keyCol", "schemaDdl", "constraints", "txns", "dirRows", "dirStats",
        "dirNdv", "bloomCols", "droppedCols", "tombstones", "dirFiles",
        "buckets").contains(x))
      e <- Gen.listOfN(12, Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf(' ', '>', '<', '=', '+', '-', '(', ')', ',', ':', '\'')))
        .map(_.mkString)
    } yield n -> e)
  } yield Manifest(version, nBuckets, keyCol,
    // DDL round-trips through StructType.fromDDL elsewhere; here the
    // field carries an arbitrary quote-free token like the renderer allows
    s"${cols.head} BIGINT", buckets, txns, dirRows, dirStats, bloomCols,
    tombstones, dirFiles, dirNdv, droppedCols, writerVersion, constraints)

  test("render → parse is the identity over the manifest-safe value space") {
    def norm(x: Manifest) = x.copy(
      tombstones = x.tombstones.view.mapValues(
        _.map { case (ts, over) => (ts, over.toList) }).toMap.filter(_._2.nonEmpty),
      buckets = x.buckets.view.mapValues(_.toList).toMap)
    val prop = Prop.forAll(manifest) { m =>
      norm(ManifestTable.parseForTest(ManifestTable.renderForTest(m))) == norm(m)
    }
    val result = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, s"round-trip property failed: ${result.status}")
  }

  test("legacy manifests with field-shaped tokens nested in later objects parse clean") {
    // A manifest written BEFORE the constraints / writerVersion fields
    // existed, whose user-chosen names legitimately collide with them:
    // a data column named `constraints` (recorded in dirStats), an
    // appendOnce appId `writerVersion` (in txns), a dir named `buckets`
    // (in dirFiles). The parser must anchor on TOP-LEVEL keys only —
    // an unanchored indexOf would crash on the inverted substring
    // bounds or fabricate phantom constraints / a false feature level.
    val legacy =
      """{"version":7,"nBuckets":4,"keyCol":"id",""" +
      """"schemaDdl":"id BIGINT,constraints BIGINT",""" +
      """"txns":{"writerVersion":5},""" +
      """"dirRows":{"data/a/b=0":10},""" +
      """"dirStats":{"data/a/b=0":{"constraints":["1","9"]}},""" +
      """"dirFiles":{"buckets":["part-x.parquet;33"]},""" +
      """"buckets":{"0":["data/a/b=0"]}}"""
    val m = ManifestTable.parseForTest(legacy)
    assert(m.constraints.isEmpty)        // NOT the dirStats column
    assert(m.writerVersion == 0)         // NOT the txn's appId value
    assert(m.txns == Map("writerVersion" -> 5L))
    assert(m.dirStats == Map("data/a/b=0" -> Map("constraints" -> ("1", "9"))))
    assert(m.dirFiles == Map("buckets" -> Seq(("part-x.parquet", 33L))))
    assert(m.buckets == Map(0 -> Seq("data/a/b=0")))
  }

  test("hostile inputs are rejected at render time, never silently corrupted") {
    val base = Manifest(1, 4, "id", "id BIGINT", Map(0 -> Seq("data/x/b=0")))
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(schemaDdl = """id STRING COMMENT "x"""")) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(txns = Map("a\"b" -> 1L))) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(dirRows = Map("data/x;y" -> 1L))) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(bloomCols = Seq("not safe"))) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(
        tombstones = Map(0 -> Seq(("data/t\"s", Seq("data/x/b=0")))))) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(
        dirStats = Map("data/x/b=0" -> Map("c" -> ("1;2", "3"))))) }
    intercept[IllegalArgumentException] {
      ManifestTable.renderForTest(base.copy(
        dirFiles = Map("data/x/b=0" -> Seq(("part;1.parquet", 7L))))) }
    intercept[IllegalArgumentException] { // expr with a double quote
      ManifestTable.renderForTest(base.copy(
        constraints = Map("c" -> "name <> \"x\""))) }
    intercept[IllegalArgumentException] { // expr with a brace
      ManifestTable.renderForTest(base.copy(
        constraints = Map("c" -> "map{}"))) }
    intercept[IllegalArgumentException] { // name shadowing a manifest field
      ManifestTable.renderForTest(base.copy(
        constraints = Map("txns" -> "score >= 0"))) }
  }
}
