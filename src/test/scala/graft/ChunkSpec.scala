package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Pins `TextAnalysis.chunkTokens` (overlapping token windows): chunk
  * boundaries, the partial final chunk, the no-redundant-tail rule
  * (never a chunk fully contained in its predecessor), and full
  * coverage (stitching chunks minus overlaps reconstructs the stream).
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String, w: Int, s: Int): Seq[(Long, Long, String)] =
    TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "text", w, s, Seq("doc_id"))
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("short doc: one chunk, the whole doc") {
    assert(chunks(words(10), 64, 48) == Seq((0L, 10L, words(10))))
    assert(chunks(words(64), 64, 48) == Seq((0L, 64L, words(64))))
  }

  test("one token past the window opens exactly one partial overlap chunk") {
    val got = chunks(words(65), 64, 48)
    assert(got.map(_._2) == Seq(64L, 17L))
    // chunk 1 = tokens 49..65: 16 overlap tokens + the 1 new one
    assert(got(1)._3 == (49 to 65).map(i => s"w$i").mkString(" "))
  }

  test("exact stride multiple: final chunk is full, no empty tail chunk") {
    val got = chunks(words(112), 64, 48) // 48 + 64 exactly
    assert(got.map(_._2) == Seq(64L, 64L))
    assert(got(1)._3.startsWith("w49 ") && got(1)._3.endsWith(" w112"))
  }

  test("adjacent chunks overlap by window-stride tokens and cover every token") {
    val w = 64; val s = 48
    val got = chunks(words(200), w, s)
    assert(got.size == 4) // ceil((200-64)/48)+1
    got.sliding(2).foreach { case Seq(a, b) =>
      val at = a._3.split(" ").toSeq; val bt = b._3.split(" ").toSeq
      assert(at.takeRight(w - s) == bt.take(w - s), "overlap mismatch")
    }
    // stitch: first chunk + each successor minus its overlap prefix
    val stitched = got.head._3.split(" ").toSeq ++
      got.tail.flatMap(_._3.split(" ").toSeq.drop(w - s))
    assert(stitched == (1 to 200).map(i => s"w$i"))
  }

  test("no chunk is fully contained in its predecessor") {
    for (n <- Seq(1, 63, 64, 65, 96, 97, 112, 113, 160, 200, 500)) {
      val got = chunks(words(n), 64, 48)
      got.sliding(2).foreach {
        case Seq(a, b) => assert(!a._3.endsWith(b._3), s"n=$n redundant tail")
        case _ => ()
      }
      // coverage: last chunk always ends at the last token
      assert(got.last._3.endsWith(s"w$n"), s"n=$n lost the tail")
    }
  }
}
