package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.ops.Bpe

/** BPE merge-training: the single-pass merge kernel against the
  * run-parity window formulation the DuckDB oracle uses, plus the full
  * training loop against an in-memory reference trainer.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Run-parity model (the oracle's formulation): within each maximal
    * run of consecutive matching positions, the 1st, 3rd, … matches
    * apply; a position right after an applied match is consumed.
    */
  private def runParityMerge(syms: Seq[String], f: String, s: String): Seq[String] = {
    val mt = syms.indices.map(i =>
      i + 1 < syms.size && syms(i) == f && syms(i + 1) == s)
    val ap = Array.fill(syms.size)(false)
    var i = 0
    while (i < syms.size) {
      if (mt(i)) {
        var j = i
        var odd = true
        while (j < syms.size && mt(j)) { ap(j) = odd; odd = !odd; j += 1 }
        i = j
      } else i += 1
    }
    syms.indices
      .filterNot(i => i > 0 && ap(i - 1)) // consumed
      .map(i => if (ap(i)) s"${syms(i)} ${syms(i + 1)}" else syms(i))
  }

  /** Greedy scan model (what the kernel implements). */
  private def greedyMerge(syms: Seq[String], f: String, s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.size) {
      if (i + 1 < syms.size && syms(i) == f && syms(i + 1) == s) {
        out += s"$f $s"; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("bpe_merge kernel == greedy == run-parity, incl. overlap runs") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),            // odd overlap run
      (Seq("a", "a", "a", "a"), "a", "a"),       // even overlap run
      (Seq("a", "b", "a", "b", "a"), "a", "b"),  // alternating
      (Seq("x", "a", "b", "y", "a", "b"), "a", "b"),
      (Seq("a"), "a", "a"),                      // too short
      (Seq("a b", "c", "a b", "c"), "a b", "c")  // merged symbols re-merge
    )
    for ((syms, f, s) <- cases) {
      val expected = greedyMerge(syms, f, s)
      assert(runParityMerge(syms, f, s) == expected,
        s"run-parity diverges on $syms + ($f,$s)")
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(Sketches.bpe_merge($"syms", f, s).as("m"))
        .as[Seq[String]].head()
      assert(got == expected, s"kernel diverges on $syms + ($f,$s)")
    }
  }

  test("bpe_merge kernel == greedy on random symbol streams") {
    val rnd = new scala.util.Random(42)
    val alpha = Vector("a", "b", "c")
    val docs = (1 to 60).map(_ =>
      Seq.fill(1 + rnd.nextInt(20))(alpha(rnd.nextInt(alpha.size))))
    for (f <- alpha; s <- alpha) {
      val got = docs.map(Tuple1(_)).toDF("syms")
        .select(Sketches.bpe_merge($"syms", f, s).as("m"))
        .as[Seq[String]].collect().toSeq
      val expected = docs.map(greedyMerge(_, f, s))
      assert(got == expected, s"mismatch for pair ($f,$s)")
      assert(docs.map(runParityMerge(_, f, s)) == expected)
    }
  }

  /** In-memory reference trainer mirroring Bpe.train exactly. */
  private def refTrain(corpus: Seq[Seq[String]],
                       rounds: Int): Seq[(Int, String, String, Long)] = {
    var state = corpus.filter(_.size >= 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds if state.nonEmpty) {
      val counts = state.flatMap(ts => ts.zip(ts.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.nonEmpty) {
        val ((f, s), n) = counts.toSeq
          .sortBy { case ((f, s), n) => (-n, f, s) }.head
        out += ((r, f, s, n))
        state = state.map(greedyMerge(_, f, s)).filter(_.size >= 2)
      }
    }
    out.toSeq
  }

  test("Bpe.train matches the in-memory trainer on a planted corpus") {
    val texts = Seq(
      "the cat sat on the mat",
      "the cat ran to the cat",
      "a cat and the cat sat",
      "the cat sat on a log",
      "dogs bark")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 5)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val expected = refTrain(texts.map(_.split(" ").toSeq), 5)
    assert(got == expected)
    // the first merge must be the dominant pair and later rounds must
    // be able to pick pairs involving merged symbols
    assert(got.head._2 == "the" && got.head._3 == "cat")
    assert(got.exists(m => m._2.contains(" ") || m._3.contains(" ")))
  }

  test("adjacent_pairs kernel == the HOF executable spec (incl. empty, 1-sym, repeats)") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      Seq("a", "b", "a", "b", "b"),
      Seq("only"),
      Seq.empty[String],
      Seq("x", "x", "x")
    ).toDF("syms")
    val syms = col("syms")
    val kernel = df.select(
      graft.functions.Sketches.adjacent_pairs(syms).as("p")).collect()
    val hof = df.select(
      when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1), i =>
          struct(element_at(syms, i).as("first"),
            element_at(syms, i + 1).as("second"))))
        .otherwise(array().cast("array<struct<first:string,second:string>>"))
        .as("p")).collect()
    assert(kernel.map(_.toString).toSeq == hof.map(_.toString).toSeq)
  }

  test("char_symbols: code-point symbols with </w> on the last") {
    val rows = Seq("low", "né", "a").toDF("w")
      .select(Sketches.char_symbols(col("w")).as("s"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("l", "o", "w</w>"))
    assert(rows(1) == Seq("n", "é</w>"))
    assert(rows(2) == Seq("a</w>"))
    val empty = Seq("").toDF("w")
      .select(Sketches.char_symbols(col("w")).as("s"))
      .as[Seq[String]].collect()
    assert(empty.head.isEmpty)
  }

  test("trainChars reproduces the Sennrich worked example (weighted vocabulary, </w> markers)") {
    // the paper's classic corpus: low x5, lower x2, newest x6, widest x3.
    // Hand-computed rounds (engine tie-break: n DESC, first ASC, second ASC):
    //   r1: (e,s)  n=9  (newest 6 + widest 3; ties (s,t</w>) 9, 'e'<'s')
    //   r2: (e s, t</w>) n=9
    //   r3: (l,o)  n=7  (low 5 + lower 2)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // spread across documents to exercise the corpus->vocab aggregation
    val docs = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.trainChars(docs, "text", rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (1, "e", "s", 9L),
      (2, "e s", "t</w>", 9L),
      (3, "l", "o", 7L)), merges.toString)
  }

  test("trainChars weighting: duplicate words count as many times as they occur") {
    // one doc repeating a word vs many docs with it once — identical merges
    val a = Seq("ab ab ab").toDF("text")
    val b = Seq("ab", "ab", "ab").toDF("text")
    val ma = Bpe.trainChars(a, "text", 1).as[(Int, String, String, Long)].collect().toSeq
    val mb = Bpe.trainChars(b, "text", 1).as[(Int, String, String, Long)].collect().toSeq
    assert(ma == Seq((1, "a", "b</w>", 3L)))
    assert(ma == mb)
  }

  test("encode applies trained merges in order and keeps short documents") {
    val docs = Seq(
      "a b a b a b",   // merge target
      "a",             // too short to pair — must survive encode as-is
      "b a b x"
    ).toDF("text")
    val merges = Seq(("a", "b"), ("a b", "a b"))
    val got = Bpe.encode(docs, "text", merges)
      .as[Seq[String]].collect().toSeq
    // reference: greedy merges applied in order per doc
    val expected = Seq("a b a b a b", "a", "b a b x")
      .map(_.split(" ").toSeq)
      .map(s => merges.foldLeft(s)((acc, m) => greedyMerge(acc, m._1, m._2)))
    assert(got == expected, s"got $got expected $expected")
    assert(got(1) == Seq("a"), "short doc lost or altered")
  }

  test("encode keep-columns ride along unchanged; compression invariants hold") {
    val docs = Seq(
      (1L, "a b a b a b"), // merges fire: 6 words -> 3 syms, compression 2
      (2L, "x y z"),       // no merge fires: compression exactly 1
      (3L, "")             // zero symbols: NULL compression, not 0/0
    ).toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val enc = Bpe.encode(docs, "text", merges, keep = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc(1L) == Seq("a b", "a b", "a b"))
    assert(enc(2L) == Seq("x", "y", "z"))
    assert(enc(3L) == Seq.empty)
    val nw = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.functions.Sketches.word_ngrams(col("text"), 1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val comp = enc.map { case (id, syms) =>
      id -> (if (syms.isEmpty) None else Some(nw(id).toDouble / syms.size)) }
    assert(comp(1L).contains(2.0) && comp(2L).contains(1.0) && comp(3L).isEmpty)
  }

  test("decode(encode(x)) == x over the fixture corpus (word mode)") {
    // the round-trip property closing the tokenizer lifecycle: encode
    // under TRAINED merges, decode without them, recover the
    // whitespace-normalized token stream of every document
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val merges = Bpe.train(docs, "text", 8)
      .orderBy("round").as[(Int, String, String, Long)]
      .collect().toSeq.map(m => (m._2, m._3))
    assert(merges.nonEmpty, "fixture corpus trained no merges")
    val decoded = Bpe.decode(
      Bpe.encode(docs, "text", merges, keep = Seq("doc_id")),
      keep = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val normalized = docs
      .select(col("doc_id"),
        array_join(Sketches.word_ngrams(col("text"), 1), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decoded == normalized,
      "decode(encode(x)) diverged from the token stream: " +
        decoded.find(kv => normalized(kv._1) != kv._2).toString)
    // and the encoding was not a no-op — merges actually applied
    val symCount = Bpe.encode(docs, "text", merges)
      .select(sum(size(col("syms")))).as[Long].head()
    val tokCount = docs
      .select(sum(size(Sketches.word_ngrams(col("text"), 1)))).as[Long].head()
    assert(symCount < tokCount, "trained merges never fired on the corpus")
  }

  test("decodeChars inverts char-mode merges per word, incl. a literal </w> suffix") {
    val words = Seq("low", "lower", "newest", "widest", "né", "x</w>")
    val merges = Seq(("e", "s"), ("e s", "t</w>"), ("l", "o"))
    val df = words.toDF("w")
      .select(col("w"), Sketches.char_symbols(col("w")).as("syms"))
    val mergedDf = merges.foldLeft(df) { case (d, (f, s)) =>
      d.select(col("w"), Sketches.bpe_merge(col("syms"), f, s).as("syms"))
    }
    val got = mergedDf.select(col("w"), Bpe.decodeChars(col("syms")).as("d"))
      .as[(String, String)].collect().toSeq
    got.foreach { case (w, d) =>
      assert(d == w, s"char-mode round-trip broke on '$w': got '$d'")
    }
  }

  test("adjacent_pairs skips pairs touching null elements (containsNull inputs)") {
    // SQL arrays can carry containsNull=true (split()'s declared type);
    // the kernel's output struct fields are non-nullable, so pairs with
    // a null member must be dropped, not emitted as schema-violating rows
    import org.apache.spark.sql.functions._
    val rows = Seq(Seq[String]("a", null, "b", "c")).toDF("syms")
      .select(graft.functions.Sketches.adjacent_pairs(col("syms")).as("p"))
      .collect()
    assert(rows.length == 1)
    val pairs = rows.head.getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getString(0), r.getString(1))) == Seq(("b", "c")))
  }
}
