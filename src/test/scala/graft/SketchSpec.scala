package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.ops.{Dedup, TextAnalysis}

/** Custom sketch expressions vs executable specs / HOF formulations. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different content about spark engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "one"), // fewer tokens than shingle size
    (5L, "spark engines about different completely shuffles and content")
  ).toDF("doc_id", "text")

  test("minhash_sig: deterministic, right length; dups identical, near-dups mostly agree") {
    val sigs = docs.select($"doc_id", Sketches.minhash_sig($"text", 2, 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs.values.forall(_.length == 64))
    assert(sigs(0L) == sigs(3L)) // exact duplicates → identical signatures
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (x, y) => x == y }
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (x, y) => x == y }
    assert(agree01 > 32, s"near-dup agreement $agree01/64") // J≈0.8 expected
    assert(agree02 < 16, s"unrelated agreement $agree02/64")
    // second evaluation identical (no RNG state)
    val sigs2 = docs.select($"doc_id", Sketches.minhash_sig($"text", 2, 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs == sigs2)
  }

  test("custom simhash == HOF formulation, and fits the portable 60 bits") {
    val viaHof = docs.select($"doc_id",
      Dedup.simhash(TextAnalysis.tokens($"text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val viaExpr = docs.select($"doc_id", Sketches.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(viaHof == viaExpr)
    assert(viaExpr.values.forall(v => v >= 0L && (v >>> 60) == 0L))
  }

  test("portable minhash/band kernels match an independent Scala fold") {
    // independent reimplementation of the portable family (no shared code
    // with the kernel beyond the published constants)
    val P = Sketches.P1
    def ph(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    val (pa, pb) = Sketches.permCoeffs(8)
    def sigOf(text: String, n: Int): Seq[Long] = {
      val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      val sh = if (toks.length < n) Seq(toks.mkString(" "))
               else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      (0 until 8).map(j => sh.map(s => (pa(j) * ph(s) + pb(j)) % P).min)
    }
    val got = docs.select($"doc_id", Sketches.minhash_sig($"text", 2, 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == sigOf(t, 2), s"sig mismatch for doc $id")
    }
    // band fold: seeded with the band index, polyHash-folded over the slice
    val bandsGot = docs.select($"doc_id",
      Sketches.minhash_bands($"text", 2, 8, 4).as("b")).as[(Long, Seq[Long])]
      .collect().toMap
    texts.foreach { case (id, t) =>
      val sig = sigOf(t, 2)
      val exp = (0 until 4).map(b =>
        sig.slice(b * 2, b * 2 + 2).foldLeft(b.toLong)((a, x) => (a * 31 + x) % P))
      assert(bandsGot(id) == exp, s"band mismatch for doc $id")
    }
  }

  test("chained shingles→sig→bands path == the direct text kernels (prepareMinhash shape)") {
    val direct = docs.select($"doc_id",
        Sketches.minhash_sig($"text", 3, 64).as("sig"),
        Sketches.minhash_bands($"text", 3, 64, 16).as("bands"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (i, s, b) => i -> ((s, b)) }.toMap
    val chained = Dedup.prepareMinhash(docs, "doc_id", "text", 3, 64, 16)
      .select($"id", $"sig", $"bands")
      .as[(Long, Seq[Long], Seq[Long])].collect()
      .map { case (i, s, b) => i -> ((s, b)) }.toMap
    assert(chained == direct)
  }

  test("custom word_shingles == HOF wordShingles") {
    val viaHof = docs.select($"doc_id",
      Dedup.wordShingles($"text", 3).as("sh")).as[(Long, Seq[String])].collect().toMap
    val viaExpr = docs.select($"doc_id",
      Sketches.word_shingles($"text", 3).as("sh")).as[(Long, Seq[String])].collect().toMap
    assert(viaHof.view.mapValues(_.toSet).toMap == viaExpr.view.mapValues(_.toSet).toMap)
  }

  test("minhash near-dup pipeline finds planted exact and near duplicates") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)), "exact duplicate pair missed")
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L)), "near-dup pair missed")
    assert(!pairs.contains((0L, 2L)), "unrelated pair flagged")
  }

  test("exact jaccard matches a Scala set computation") {
    def shingles(s: String, n: Int): Set[String] =
      s.split("\\s+").sliding(n).map(_.mkString(" ")).toSet
    val exp = {
      val a = shingles("the quick brown fox jumps over the lazy dog", 2)
      val b = shingles("the quick brown fox jumps over the lazy cat", 2)
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val got = docs.filter($"doc_id".isin(0L, 1L))
      .agg(collect_list($"text")).as[Seq[String]].collect().head
    val gotJ = Seq((got(0), got(1))).toDF("a", "b")
      .select(Dedup.jaccard(Dedup.wordShingles($"a", 2), Dedup.wordShingles($"b", 2)))
      .as[Double].collect().head
    assert(math.abs(gotJ - exp) < 1e-12)
  }

  test("jaccard kernel == HOF spec on the fixture corpus (all pairs of shingle sets)") {
    val sh = graft.model.Tables.documents(spark, sfDir)
      .select($"doc_id", Sketches.word_shingles($"text", 2).as("sh"))
    val pairs = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .limit(5000)
      .select(
        Dedup.jaccard($"a.sh", $"b.sh").as("hof"),
        Sketches.jaccard($"a.sh", $"b.sh").as("kernel"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    // bit-identical: same integer counts, same double division
    assert(pairs.forall { case (h, k) => h == k })
    // degenerate empty sets: HOF convention jaccard = 1
    val empty = Seq(("", "")).toDF("a", "b")
      .select(Sketches.jaccard(
        Sketches.word_shingles($"a", 2), Sketches.word_shingles($"b", 2)))
      .as[Double].collect().head
    assert(empty == 1.0)
  }

  test("simhash near-dup: exact dups at distance 0, near-dups close, unrelated far") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 12,
        approximate = true)
      .select($"id_l", $"id_r", $"dist").as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs((0L, 3L)) == 0)
    assert(pairs.get((0L, 1L)).forall(_ <= 12))
  }

  test("banded Hamming beyond nBands-1 is opt-in: refused without approximate=true") {
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 12)
    }
    assert(e.getMessage.contains("approximate"))
  }

  test("fingerprint: identical texts collide, distinct texts don't (on fixture)") {
    val fps = docs.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(0L) == fps(3L))
    assert(fps(0L) != fps(2L))
  }

  test("sf0.1 fixture: the near-dup funnel finds the planted duplicates") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val pairs = graft.queries.ExtendedQueries
      .ngramJaccardPairs(spark, "/root/testdata/sf0.1")
      .select($"jaccard").as[Double].collect()
    assert(pairs.length == 20)
    assert(pairs.max >= 0.99, s"max jaccard ${pairs.max}")
    assert(pairs.count(_ >= 0.9) >= 10, "expected ≥10 planted near-dup pairs")
  }

  test("repetition_stats kernel matches a direct Scala computation") {
    val got = docs.select($"doc_id",
      graft.functions.TextKernels.repetition_stats($"text").as("rs"))
      .as[(Long, Seq[Long])].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    texts.foreach { case (id, t) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val exp = Seq(toks.length.toLong, toks.distinct.length.toLong,
        if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.size).max.toLong,
        bigrams.length.toLong, bigrams.distinct.length.toLong)
      assert(got(id) == exp, s"repetition stats mismatch for doc $id")
    }
  }

  test("decontamination: shared-gram counts bounded and positive, ordered by doc") {
    val rows = graft.queries.ExtendedQueries.decontamination(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty, "no contaminated docs found in the fixture")
    rows.foreach { case (id, nGrams, nShared, frac) =>
      assert(id < 450, "eval docs must not appear in the output")
      assert(nShared >= 1 && nShared <= nGrams)
      assert(math.abs(frac - nShared.toDouble / nGrams) == 0.0)
    }
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
  }

  test("portable kernels on degenerate text: empty, whitespace-only, single token") {
    val edge = Seq((0L, ""), (1L, "   \t\n  "), (2L, "solo"), (3L, "a b"))
      .toDF("doc_id", "text")
    // tokenize of empty/whitespace → no tokens: simhash 0, repetition all-0
    val sh = edge.select($"doc_id", Sketches.simhash($"text")).as[(Long, Long)]
      .collect().toMap
    assert(sh(0L) == 0L && sh(1L) == 0L && sh(2L) != 0L)
    val rs = edge.select($"doc_id",
      graft.functions.TextKernels.repetition_stats($"text"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(rs(0L) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(rs(1L) == Seq(0L, 0L, 0L, 0L, 0L))
    assert(rs(2L) == Seq(1L, 1L, 1L, 0L, 0L))
    assert(rs(3L) == Seq(2L, 2L, 1L, 1L, 1L))
    // minhash below-shingle-size fallback: whole text is the one shingle,
    // empty text hashes the empty string (h=0 → sig_j = b_j)
    val (_, pb) = Sketches.permCoeffs(4)
    val sig = edge.select($"doc_id", Sketches.minhash_sig($"text", 2, 4))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(0L) == pb.toSeq, "empty text: sig must be the b_j constants")
    assert(sig(0L) == sig(1L), "whitespace-only ≡ empty after tokenize")
    // n-grams of a doc shorter than n: empty, not a fallback shingle
    val ng = edge.select($"doc_id", Sketches.word_ngrams($"text", 2))
      .as[(Long, Seq[String])].collect().toMap
    assert(ng(0L).isEmpty && ng(2L).isEmpty && ng(3L) == Seq("a b"))
  }

  test("langId picks the majority-stopword language deterministically") {
    val rows = Seq(
      ("the cat and the dog of a house", "en"),
      ("el gato y la casa de un perro que", "es"),
      ("der hund und die katze ist nicht ein", "de"),
      ("xyzzy plugh qwerty", "und")
    ).toDF("text", "expected")
    val got = rows.select(TextAnalysis.langId($"text").as("got"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
  }

  test("text kernels match their HOF executable specs on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // lang_id kernel ≡ the per-language HOF argmax
    val langDiff = docs.select(
      TextAnalysis.langId($"text").as("kernel"),
      TextAnalysis.langIdHof($"text").as("spec"))
      .filter($"kernel" =!= $"spec").count()
    assert(langDiff == 0, s"$langDiff lang_id mismatches vs HOF spec")
    // stopword_hits kernel ≡ wordHits over the flattened union list
    val stopDiff = docs.select(
      TextAnalysis.stopwordHits($"text").as("kernel"),
      TextAnalysis.wordHits($"text",
        TextAnalysis.langStopwords.flatMap(_._2)).as("spec"))
      .filter($"kernel" =!= $"spec").count()
    assert(stopDiff == 0, s"$stopDiff stopword_hits mismatches vs HOF spec")
  }

  test("minhash estimator tracks exact Jaccard on SHORT-shingle sets (perm-family mixing pin)") {
    // regression pin for the degenerate family this repo shipped until
    // round 6: trailing-digit seeds made perm_j = perm_0 + j·(h+1), so
    // for small h (char trigrams hash < 4e6 ≪ P1) the per-slot argmin
    // never changed and agreement collapsed to 0-or-64. The templated
    // customer/supplier names are exactly that regime: estimator error
    // must stay estimator-sized, not coin-flip-sized.
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter($"c_custkey" <= 30)
      .select(graft.ops.Dedup.charShingles($"c_name", 3).as("cg"))
      .withColumn("sig_c", Sketches.minhash_from_shingles($"cg", 64))
    val supp = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(graft.ops.Dedup.charShingles($"s_name", 3).as("sg"))
      .withColumn("sig_s", Sketches.minhash_from_shingles($"sg", 64))
    val errs = cust.crossJoin(supp)
      .select(
        abs(graft.ops.Dedup.estJaccard($"sig_c", $"sig_s", 64) -
          Sketches.jaccard($"cg", $"sg")).as("err"))
      .agg(avg($"err"), max($"err")).as[(Double, Double)].head()
    assert(errs._1 < 0.06, f"mean |est-exact| ${errs._1}%.3f — family mixing regressed")
    assert(errs._2 < 0.30, f"max |est-exact| ${errs._2}%.3f — some pair collapsed")
  }
}
