package graft.similarity

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("paragraphs chunk by token count and drop sub-shingle tails") {
    val d = mkDocs((1L, (1 to 45).map(i => s"w$i").mkString(" ")))
    val ps = ParagraphDedup.paragraphs(d, paraSize = 20)
      .as[(Long, Long, Seq[String])].collect().sortBy(_._2)
    // 45 tokens -> chunks of 20/20/5; all >= 3 tokens so all survive
    assert(ps.map(p => (p._2, p._3.size)).toSeq == Seq((0L, 20), (1L, 20), (2L, 5)))
    assert(ps(0)._3.head == "w1" && ps(1)._3.head == "w21" && ps(2)._3.head == "w41")
    // 42 tokens -> tail of 2 has no 3-shingle and is dropped
    val short = ParagraphDedup.paragraphs(
      mkDocs((1L, (1 to 42).map(i => s"w$i").mkString(" "))), 20)
    assert(short.count() == 2)
  }

  test("a chunk shared across docs is flagged in both; unique docs keep") {
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val d = mkDocs(
      (1L, shared + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (1 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"c$i").mkString(" ")))
    val v = ParagraphDedup.verdict(d, paraSize = 20, keepBelow = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(v.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
    // dup_frac 0.5 is NOT below 0.5: docs 1 and 2 are dropped
    assert(v.map(_._5).toSeq == Seq(false, false, true))
  }

  test("within-doc repetition alone is not a cross-doc duplicate") {
    val rep = (1 to 20).map(i => s"r$i").mkString(" ")
    val d = mkDocs((1L, rep + " " + rep), (2L, (1 to 20).map(i => s"z$i").mkString(" ")))
    val v = ParagraphDedup.verdict(d, 20).as[(Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(v.forall(_._3 == 0L))
  }

  test("removeBoilerplate: unique corpus reassembles byte-identically") {
    // no chunk recurs across docs -> nothing removed, and the ordered
    // reassembly (incl. the signature-less short tail) must reproduce
    // the original text exactly
    val d = mkDocs(
      (1L, (1 to 45).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 62).map(i => s"b$i").mkString(" ")))
    val out = ParagraphDedup.removeBoilerplate(d, paraSize = 20)
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._3).forall(_ == 0L))
    val orig = d.as[(Long, String)].collect().toMap
    out.foreach(r => assert(r._4 == orig(r._1), s"doc ${r._1} not identical"))
    assert(out.map(r => (r._1, r._5)).toSeq == Seq((1L, 45L), (2L, 62L)))
  }

  test("removeBoilerplate strips the shared chunk from every carrier") {
    val shared = (1 to 20).map(i => s"dup$i").mkString(" ")
    val aTail = (1 to 20).map(i => s"a$i").mkString(" ")
    val bTail = (1 to 20).map(i => s"b$i").mkString(" ")
    val d = mkDocs(
      (1L, shared + " " + aTail),
      (2L, shared + " " + bTail),
      (3L, (1 to 40).map(i => s"c$i").mkString(" ")))
    val out = ParagraphDedup.removeBoilerplate(d, paraSize = 20)
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
    assert(out(0)._4 == aTail && out(1)._4 == bTail)
    // an all-boilerplate doc comes back empty, not missing
    val all = mkDocs((1L, shared), (2L, shared), (3L, "solo " * 19 + "end"))
    val cleaned = ParagraphDedup.removeBoilerplate(all, paraSize = 20)
      .as[(Long, Long, Long, String, Long)].collect().sortBy(_._1)
    assert(cleaned.length == 3)
    assert(cleaned(0)._4 == "" && cleaned(0)._5 == 0L)
    assert(cleaned(1)._4 == "")
    assert(cleaned(2)._3 == 0L)
  }
}
