package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  private def docs = Tables.read(spark, sf(), "documents")

  test("bernoulli sample is deterministic and repartition-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.bernoulliSample(df, "doc_id", 0.3)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    assert(a.nonEmpty && a.size < docs.count())
    assert(ids(docs) == a, "same input must give the same sample")
    assert(ids(docs.repartition(13)) == a,
      "partitioning must not change the sample (unlike df.sample)")
  }

  test("bernoulli sample is monotone in fraction and sensitive to seed") {
    def ids(frac: Double, seed: String) =
      Sampling.bernoulliSample(docs, "doc_id", frac, seed)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(0.05, "graft")
    val big = ids(0.20, "graft")
    assert(small.subsetOf(big), "5% sample must be a subset of 20% sample")
    assert(ids(0.20, "other") != big, "different seeds must differ")
    // rate sanity: 20% ± 6pp on 500 docs
    val rate = big.size.toDouble / docs.count()
    assert(rate > 0.14 && rate < 0.26, s"rate $rate far from 0.2")
  }

  test("cluster-balanced sample caps every cell, monotone in cap") {
    import spark.implicits._
    // 3 cells of sizes 12 / 7 / 2
    val assigned = ((1L to 12L).map(i => (i, 0)) ++
      (13L to 19L).map(i => (i, 1)) ++ Seq((20L, 2), (21L, 2)))
      .toDF("id", "cell")
    def pick(cap: Int) = Sampling
      .clusterBalancedSample(assigned, "id", "cell", cap)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val p5 = pick(5)
    val sizes = p5.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes == Map(0 -> 5, 1 -> 5, 2 -> 2))
    assert(p5.subsetOf(pick(8)), "growing cap must only add rows")
    assert(pick(5) == p5, "deterministic")
    // repartition invariance
    val rp = Sampling.clusterBalancedSample(
      assigned.repartition(13), "id", "cell", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rp == p5)
  }

  test("stratified sample takes exactly min(k, |group|) per group") {
    val perGroup = Sampling.stratifiedSample(docs, "lang", "doc_id", 5)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.keySet == sizes.keySet)
    perGroup.foreach { case (g, n) => assert(n == math.min(5L, sizes(g))) }
  }

  test("mixture labels sources and respects per-source fractions") {
    val en = docs.filter(col("lang") === "en")
    val rest = docs.filter(col("lang") =!= "en")
    val mixed = Sampling.mixture(Seq(
      ("en", en, 1.0), ("rest", rest, 0.0)), "doc_id")
    val bySource = mixed.groupBy("mixture_source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // fraction 1.0 keeps everything, 0.0 keeps nothing
    assert(bySource.getOrElse("en", 0L) == en.count())
    assert(bySource.getOrElse("rest", 0L) == 0L)
  }

  test("uniformK: exact size, repartition-invariant, monotone in k") {
    val a = Sampling.uniformK(docs, "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.size == 20)
    val b = Sampling.uniformK(docs.repartition(7), "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on physical layout")
    val bigger = Sampling.uniformK(docs, "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(bigger), "growing k must only add rows")
  }

  test("tokenBudgetSample lands near the budget, monotone, full at cap") {
    val total = docs.agg(sum(col("n_chars"))).head().getLong(0)
    val kept = Sampling.tokenBudgetSample(docs, "doc_id", "n_chars", 30000)
    val keptTokens = kept.agg(sum(col("n_chars"))).head().getLong(0)
    // Bernoulli concentration: within 35% of the budget at this corpus size
    assert(math.abs(keptTokens - 30000) < 30000 * 0.35,
      s"kept $keptTokens of a 30000 budget (total $total)")
    val small = Sampling.tokenBudgetSample(docs, "doc_id", "n_chars", 15000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(ids), "growing the budget must only add docs")
    // budget >= total keeps everything
    val all = Sampling.tokenBudgetSample(docs, "doc_id", "n_chars", total * 2)
    assert(all.count() == docs.count())
  }

  test("packSequences: gapless within buckets, repartition-invariant") {
    def packed(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "doc_id", "n_chars", seqLen = 512,
        nBuckets = 4)
        .select("doc_id", "bucket", "seq_idx", "start_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val a = packed(docs)
    assert(a == packed(docs.repartition(7)),
      "packing must not depend on physical layout")
    // positions are gapless: within a bucket, global offsets
    // (seq_idx·512 + start_offset) are exactly the exclusive running sum
    val byDoc = docs.select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.groupBy(_._2).values.foreach { bucketRows =>
      val inOrder = bucketRows.sortBy(r => r._3 * 512 + r._4)
      var cum = 0L
      inOrder.foreach { case (id, _, seqIdx, off) =>
        assert(seqIdx * 512 + off == cum,
          s"doc $id expected global offset $cum, got ${seqIdx * 512 + off}")
        cum += byDoc(id)
      }
    }
  }

  test("trainTestSplit: exhaustive, leak-free, monotone, composable") {
    import org.apache.spark.sql.functions._
    val d = docs
    val n = d.count()
    val split = Sampling.trainTestSplit(d, "doc_id", 0.8, 0.1, "split-v1")
    // every row exactly one split; fractions land near the cuts
    val byS = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS.values.sum == n)
    assert(math.abs(byS("train") - 0.8 * n) < 0.08 * n, s"train: $byS")
    assert(math.abs(byS("test") - 0.1 * n) < 0.05 * n, s"test: $byS")
    // repartition cannot move a row between splits
    val re = Sampling.trainTestSplit(
      d.repartition(17), "doc_id", 0.8, 0.1, "split-v1")
    assert(split.select("doc_id", "split").exceptAll(
      re.select("doc_id", "split")).isEmpty)
    // monotone: growing train only PROMOTES rows val→train, never evicts
    val wider = Sampling.trainTestSplit(d, "doc_id", 0.9, 0.05, "split-v1")
    val trainNarrow = split.filter(col("split") === "train").select("doc_id")
    val trainWide = wider.filter(col("split") === "train").select("doc_id")
    assert(trainNarrow.exceptAll(trainWide).isEmpty,
      "a 0.8-train doc left the 0.9-train split")
    // composable: independent-seed Bernoulli of train == train of Bernoulli
    val a = Sampling.bernoulliSample(
      split.filter(col("split") === "train"), "doc_id", 0.5, "other-seed")
    val b = Sampling.trainTestSplit(
      Sampling.bernoulliSample(d, "doc_id", 0.5, "other-seed"),
      "doc_id", 0.8, 0.1, "split-v1").filter(col("split") === "train")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).isEmpty &&
      b.select("doc_id").exceptAll(a.select("doc_id")).isEmpty)
  }

  test("bernoulliSql escapes quotes in seeds (mixture derives them from names)") {
    val sql = Sampling.bernoulliSql("doc_id", 0.5, "it's a 'seed'")
    assert(sql.contains("'it''s a ''seed'':'"), sql)
  }

  test("weightedSample: zero weight never selected, monotone in rate, " +
    "selection biased toward heavy rows") {
    import spark.implicits._
    val d = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) 0L else (i % 100) + 1L))
      .toDF("doc_id", "w")
    val lo = Sampling.weightedSample(d, "doc_id", "w", 0.002, "s")
    val hi = Sampling.weightedSample(d, "doc_id", "w", 0.004, "s")
    assert(lo.filter(col("w") === 0).count() == 0)
    assert(lo.select("doc_id").exceptAll(hi.select("doc_id")).isEmpty,
      "rate growth must only add rows")
    // determinism + repartition invariance
    val again = Sampling.weightedSample(
      d.repartition(7), "doc_id", "w", 0.002, "s")
    assert(lo.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
      again.select("doc_id").exceptAll(lo.select("doc_id")).isEmpty)
    // heavier rows must be overrepresented: mean weight of the sample
    // strictly exceeds the population mean
    val popMean = d.filter(col("w") > 0).agg(avg("w")).head().getDouble(0)
    val samMean = lo.agg(avg("w")).head().getDouble(0)
    assert(samMean > popMean, s"sample mean $samMean vs population $popMean")
  }

  test("temperatureSample: rarest group fully kept, kept counts track " +
    "sqrt(c_l), repartition-invariant") {
    import spark.implicits._
    // 4 groups with counts 1600 / 400 / 100 / 100: acceptance
    // sqrt(100/c) = 0.25 / 0.5 / 1 / 1
    val d = ((1 to 1600).map(i => (i.toLong, "a")) ++
      (2001 to 2400).map(i => (i.toLong, "b")) ++
      (3001 to 3100).map(i => (i.toLong, "c")) ++
      (4001 to 4100).map(i => (i.toLong, "d"))).toDF("doc_id", "g")
    val kept = Sampling.temperatureSample(d, "doc_id", "g")
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the two min-count groups keep EVERYTHING (acceptance exactly 1)
    assert(byG("c") == 100L && byG("d") == 100L)
    // hash-uniform binomial around 400 and 200 — generous 5-sigma bands
    assert(byG("a") > 310 && byG("a") < 490, s"group a kept ${byG("a")}")
    assert(byG("b") > 130 && byG("b") < 270, s"group b kept ${byG("b")}")
    // schema passes through unchanged; output is a subset of the input
    assert(kept.columns.toSeq == d.columns.toSeq)
    assert(kept.exceptAll(d).isEmpty)
    // repartition invariance
    val again = Sampling.temperatureSample(d.repartition(13), "doc_id", "g")
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }
}
