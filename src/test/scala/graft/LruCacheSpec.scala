package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LruCache

/** The selectivity memos' eviction discipline (VERDICT r18 next #4):
  * the old maps wiped EVERYTHING at 512 entries, so a service with
  * >512 live (source, predicate/match) keys thrashed to a zero hit
  * rate. True LRU degrades gracefully instead: overflow evicts exactly
  * the eldest entry, recently-USED keys survive, and every eviction
  * path releases the entry's resources through `onEvict` (the
  * match-counts cache unpersists its frame there).
  */
class LruCacheSpec extends AnyFunSuite {

  test("overflow evicts exactly ONE entry — the least recently used") {
    val c = new LruCache[Int, String](512)
    (0 until 512).foreach(i => c.put(i, s"v$i"))
    assert(c.size == 512)
    c.put(512, "v512") // the 513th key
    assert(c.size == 512, "overflow must evict exactly one entry")
    assert(c.get(0).isEmpty, "the eldest (key 0) is the one evicted")
    assert(c.get(1).contains("v1") && c.get(512).contains("v512"))
  }

  test("access refreshes recency: a hot key survives overflow") {
    val c = new LruCache[Int, Int](3)
    c.put(1, 1); c.put(2, 2); c.put(3, 3)
    assert(c.get(1).contains(1)) // touch 1 — key 2 is now eldest
    c.put(4, 4)
    assert(c.get(2).isEmpty, "the untouched key ages out")
    assert(c.get(1).contains(1) && c.get(3).contains(3) &&
      c.get(4).contains(4), "hot keys survive")
  }

  test("onEvict fires on overflow, removeIf, AND key replacement — never for live entries") {
    val evicted = scala.collection.mutable.ArrayBuffer[String]()
    val c = new LruCache[Int, String](2, onEvict = evicted += _)
    c.put(1, "a"); c.put(2, "b")
    c.put(3, "c") // overflow → "a" released
    assert(evicted.toSeq == Seq("a"))
    c.put(3, "c2") // replacement → the displaced "c" released
    assert(evicted.toSeq == Seq("a", "c"))
    c.removeIf(_ == 2) // supersession → "b" released
    assert(evicted.toSeq == Seq("a", "c", "b"))
    assert(c.get(3).contains("c2") && c.size == 1,
      "live entries are untouched by every eviction path")
  }
}
