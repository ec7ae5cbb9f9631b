package graft.similarity

import graft.SparkSpec

/** Unit coverage for the d21 windowed exact-substring pass on a corpus
  * with KNOWN plants — the span-merge arithmetic (gaps-and-islands over
  * stride-1 windows) is checked against hand-computed counts, the part
  * a DuckDB row-parity oracle can agree with but not explain.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val w = 4

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("windows: stride-1 count and short-doc dropout") {
    val d = docs(
      1L -> "a b c d e f",      // 6 tokens -> 3 windows of 4
      2L -> "a b c")            // 3 tokens < w -> no windows
    val win = SubstringDedup.windows(d, w)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    assert(win.count(_._1 == 1L) == 3)
    assert(win.collect { case (1L, p) => p }.sorted.toSeq == Seq(1L, 2L, 3L))
    assert(!win.exists(_._1 == 2L))
  }

  test("one shared run of L tokens merges to one span of L") {
    // docs 1 and 2 share the 6-token run "p q r s t u" at different
    // offsets; with w=4 that is 6-4+1 = 3 adjacent duplicated windows
    // merging to ONE span of max_span_tokens = 3 + (4-1) = 6
    val d = docs(
      1L -> "x1 x2 p q r s t u y1 y2",
      2L -> "z1 p q r s t u z2 z3 z4 z5")
    val v = SubstringDedup.verdict(d, w, keepBelow = 0.5)
      .select("doc_id", "n_windows", "n_dup_windows", "n_spans", "max_span_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 1: 10 tokens -> 7 windows; doc 2: 11 tokens -> 8 windows
    assert(v(0) == ((1L, 7L, 3L, 1L, 6L)))
    assert(v(1) == ((2L, 8L, 3L, 1L, 6L)))
  }

  test("two disjoint shared runs stay two spans; longest wins max") {
    // doc 1 shares run A (5 tokens -> 2 windows, span 5) and run B
    // (4 tokens -> 1 window, span 4) with doc 2, separated by unique
    // filler on both sides so the runs cannot merge
    val d = docs(
      1L -> "a1 p q r s t a2 a3 a4 u v w x a5",
      2L -> "b1 b2 p q r s t b3 u v w x b4 b5 b6")
    val v = SubstringDedup.verdict(d, w, keepBelow = 0.5)
      .select("doc_id", "n_spans", "max_span_tokens")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(v(0) == ((1L, 2L, 5L)))
    assert(v(1) == ((2L, 2L, 5L)))
  }

  test("an in-document repeat alone is not duplication") {
    // doc 1 repeats its own 4-gram twice but shares nothing with doc 2:
    // countDistinct(doc_id) == 1 for every hash -> zero dup windows
    val d = docs(
      1L -> "p q r s x p q r s",
      2L -> "m n o k l m n")
    val v = SubstringDedup.verdict(d, w, keepBelow = 0.5)
      .select("doc_id", "n_dup_windows", "n_spans", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(v.forall(r => r._2 == 0L && r._3 == 0L && r._4))
  }

  test("keep flips when the duplicate fraction reaches keepBelow") {
    // doc 1 is ENTIRELY the shared run (4 windows, all dup -> frac 1.0);
    // doc 2 carries unique tails keeping its fraction under 0.5
    val d = docs(
      1L -> "p q r s t u v",
      2L -> "c1 c2 c3 c4 p q r s t u v c5 c6 c7 c8 c9")
    val v = SubstringDedup.verdict(d, w, keepBelow = 0.5)
      .select("doc_id", "dup_frac", "keep").as[(Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(v(0)._2 == 1.0 && !v(0)._3)
    assert(v(1)._2 < 0.5 && v(1)._3)
  }
}
