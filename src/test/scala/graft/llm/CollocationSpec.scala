package graft.llm

import graft.SparkSpec

/** PMI collocation mining: values must equal an independent in-memory
  * computation (BigInt products, one double division, one ln), the
  * support gate must hold, and results must be repartition-invariant. */
class CollocationSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala PMI over a token corpus. */
  private def reference(texts: Seq[String], minCount: Long)
      : Map[String, (Long, Long, Long, Long)] = {
    val docs = texts.map(_.toLowerCase.trim
      .replaceAll("[ \\t\\n\\r\\f\\x0B]+", " ").split(" ").toSeq)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = docs.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minCount)
    val nt = BigInt(uni.values.sum)
    val np = BigInt(docs.map(w => math.max(w.size - 1, 0).toLong).sum)
    pairs.map { case ((a, b), cxy) =>
      val num = (BigInt(cxy) * nt * nt).toDouble
      val den = (np * BigInt(uni(a)) * BigInt(uni(b))).toDouble
      val pmi = math.round(math.log(num / den) * 1e9)
      s"$a $b" -> (cxy, uni(a), uni(b), pmi)
    }.toMap
  }

  test("PMI values, support gate and ranking match the independent " +
    "reference") {
    // 'tight pair' always co-occurs; 'loose' words appear independently
    val texts = Seq.fill(6)("alpha beta gamma delta") ++
      Seq.fill(5)("gamma alpha delta beta") ++
      Seq.fill(4)("epsilon zeta epsilon zeta")
    val got = TextAnalysis.collocations(
        texts.toDF("text"), "text", minCount = 5, k = 50)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ref = reference(texts, 5)
    assert(got.toMap == ref.filter(_._2._1 >= 5),
      s"got ${got.toMap}\nref $ref")
    // ranking: descending pmi_scaled with gram tiebreak
    val order = got.map { case (g, (_, _, _, p)) => (-p, g) }
    assert(order.sameElements(order.sorted), "output must be ranked")
    // the support gate really dropped sub-threshold pairs
    assert(reference(texts, 1).exists(_._2._1 < 5))
  }

  test("repartition-invariant and k-bounded") {
    val d = graft.Tables.read(spark, sf(), "documents")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.collocations(df, "text", minCount = 3, k = 10)
        .collect().map(r => (r.getString(0), r.getLong(4))).toSeq
    val a = run(d.repartition(1))
    val b = run(d.repartition(9))
    assert(a == b && a.size <= 10 && a.nonEmpty)
  }
}
