package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist scan ([[TextAnalysis.blocklistStats]] /
  * [[graft.functions.AhoCorasickStats]]): equality with a naive
  * per-pattern reference (the oracle's replace arithmetic) on nested /
  * overlapping / self-overlapping pattern sets and fuzz corpora — the
  * cases dictionary suffix links and the non-overlap counter must get
  * right. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** The oracle's count: greedy non-overlapping occurrences of `p`. */
  private def refCount(text: String, p: String): Long =
    (text.length - text.replace(p, "").length).toLong / p.length

  private def check(texts: Seq[String], patterns: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.blocklistStats(df, "doc_id", "text", patterns)
      .orderBy("doc_id")
      .select("n_matches", "n_patterns")
      .as[(Long, Int)].collect().toSeq
    val want = texts.map { t =>
      val norm = t.toLowerCase.trim.replaceAll("[ \t\n\r\f]+", " ")
      val counts = patterns.map(refCount(norm, _))
      (counts.sum, counts.count(_ > 0))
    }
    assert(got == want, s"patterns=$patterns")
  }

  test("nested and prefix-sharing patterns all report (dictionary " +
    "suffix links)") {
    check(Seq("abcd abc bc b", "xabcx"), Seq("abc", "bc", "b", "abcd"))
  }

  test("self-overlapping runs count greedy non-overlapping, matching " +
    "replace arithmetic") {
    check(Seq("aaaa", "aaa", "aabaa", "aa"), Seq("aa"))
    check(Seq("ababab", "abab"), Seq("abab"))
  }

  test("normalization: case and whitespace collapse before matching") {
    check(Seq("FuRiOuSly  \t furiously"), Seq("furiously"))
  }

  test("fuzz vs the per-pattern reference") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 5) {
      val alpha = "abc"
      val texts = (0 until 40).map(_ =>
        (0 until 3 + rnd.nextInt(40))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val pats = (0 until 6).map(_ =>
        (0 until 1 + rnd.nextInt(3))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct
      check(texts, pats)
    }
  }

  test("blocked flag and full-row output") {
    val df = Seq((1L, "the quick fox"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.blocklistStats(df, "doc_id", "text",
        Seq("quick", "fox"))
      .orderBy("doc_id")
      .select("doc_id", "n_matches", "n_patterns", "blocked")
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, 2, true), (2L, 0L, 0, false)))
  }
}
