package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Linear classifier inference: the logit must equal an independently
  * computed (plain-Scala md5 hashing, in-memory sum) reference, sparse
  * weight relations must act as zero-padded dense ones, and the result
  * must be repartition-invariant. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reimplementation of the hash32(token) % nF feature id
    * (MessageDigest, not Spark expressions). */
  private def feat(tok: String, nF: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % nF
  }

  private def toks(text: String): Seq[String] =
    text.toLowerCase.trim.replaceAll("[ \\t\\n\\r\\f\\x0B]+", " ").split(" ").toSeq

  test("logit equals the independently computed weighted sum") {
    val nF = 8
    val corpus = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "Delta   EPSILON zeta"),
      (3L, "alpha")).toDF("id", "text")
    val wmap = (0L until nF).map(f => f -> (f * 10 - 30)).toMap
    val w = wmap.toSeq.toDF("f", "wt")
    val got = TextAnalysis.classifierScore(corpus, "id", "text", w, "f", "wt", nF)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    for ((id, text) <- Seq((1L, "alpha beta beta gamma"),
        (2L, "Delta   EPSILON zeta"), (3L, "alpha"))) {
      val ts = toks(text)
      val expect = ts.map(t => wmap(feat(t, nF))).sum
      assert(got(id) == ((ts.size.toLong, expect, expect > 0)),
        s"doc $id: got ${got(id)}, expected ($expect)")
    }
  }

  test("a sparse weight relation equals the zero-padded dense one") {
    val nF = 16
    val corpus = Seq((1L, "one two three four five six")).toDF("id", "text")
    val dense = (0L until nF).map(f => (f, if (f % 3 == 0) f + 1 else 0L))
      .toDF("f", "wt")
    val sparse = (0L until nF).filter(_ % 3 == 0).map(f => (f, f + 1))
      .toDF("f", "wt")
    val a = TextAnalysis.classifierScore(corpus, "id", "text", dense,
      "f", "wt", nF).collect().toSeq
    val b = TextAnalysis.classifierScore(corpus, "id", "text", sparse,
      "f", "wt", nF).collect().toSeq
    assert(a == b)
  }

  test("corpus scoring is repartition-invariant and total") {
    val d = graft.Tables.read(spark, sf(), "documents")
    val w = spark.range(64).select(col("id").as("f"),
      (pmod(TextOps.hash32(concat(lit("w:"), col("id").cast("string"))),
        lit(101L)) - lit(50L)).as("wt"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.classifierScore(df, "doc_id", "text", w, "f", "wt", 64)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val one = run(d.repartition(1))
    assert(one == run(d.repartition(9)))
    assert(one.size == d.count(), "every document must be scored")
  }
}
