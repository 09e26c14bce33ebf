package graft.llm

import graft.SparkSpec

/** RP-tree properties ([[Similarity.trainRpTree]]/[[Similarity.rpTreeKnn]]):
  * median splits balance the leaves (the guarantee LSH buckets lack),
  * training is partitioning-invariant, and in-leaf scoring is exactly
  * the brute-force ranking restricted to the leaf. */
class RpTreeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus (fixed seed)
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    (0L until 256L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
  }
  private def corpus = vecs.toDF("vec_id", "embedding")

  test("depth-3 median splits yield 8 leaves within ±2 of perfect " +
    "balance") {
    val splits = Similarity.trainRpTree(corpus, "vec_id", "embedding",
      depth = 3, dim = 64)
    val sizes = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", splits)
      .groupBy("leaf").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet.subsetOf((0L until 8L).toSet))
    assert(sizes.size == 8, s"expected 8 populated leaves: $sizes")
    assert(sizes.values.max - sizes.values.min <= 2, sizes.toString)
  }

  test("autoDepth scales with the corpus and mirrors the oracle gates") {
    assert(Similarity.autoDepth(100) == 3)       // depth floor
    assert(Similarity.autoDepth(2048) == 3)      // 256·2^3 ≥ 2048: level 3 off
    assert(Similarity.autoDepth(2049) == 4)      // one past the gate
    assert(Similarity.autoDepth(200000) == 10)
    assert(Similarity.autoDepth(100000000) == 10) // cap
  }

  test("split training is identical under repartitioning") {
    val a = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64)
    val b = Similarity.trainRpTree(corpus.repartition(7), "vec_id",
      "embedding", 3, 64)
    assert(a == b)
  }

  test("sampled training (k < node size) stays deterministic under " +
    "repartitioning and keeps leaves near-balanced") {
    val a = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64,
      sampleK = 64)
    val b = Similarity.trainRpTree(corpus.repartition(11), "vec_id",
      "embedding", 3, 64, sampleK = 64)
    assert(a == b)
    // sample medians carry DKW rank error (ε ≈ 0.15 per split at
    // k = 64) — leaves stay within a generous band of N/8 = 32
    val sizes = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", a)
      .groupBy("leaf").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(s => s >= 8 && s <= 128), sizes.toString)
    assert(sizes.values.sum == 256L)
  }

  test("a 4-tree forest recalls at least as much as the single tree, " +
    "with no duplicate (qid, nid) pairs") {
    val queries = corpus.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceKnn(corpus, queries, "vec_id",
      "embedding", k = 3)
    def recallOf(ap: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.knnRecall(ap, brute)
        .agg(org.apache.spark.sql.functions.sum("n_hits"),
          org.apache.spark.sql.functions.sum("n_exact")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val single = Similarity.rpTreeKnn(corpus, queries, "vec_id",
      "embedding", k = 3,
      splits = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64))
    val forest = Similarity.rpForestKnn(corpus, queries, "vec_id",
      "embedding", k = 3,
      forest = Similarity.trainRpForest(corpus, "vec_id", "embedding",
        nTrees = 4, depth = 3))
    assert(forest.groupBy("qid", "nid").count()
      .filter($"count" > 1).isEmpty, "duplicate pairs across trees")
    val (rs, rf) = (recallOf(single), recallOf(forest))
    assert(rf >= rs, s"forest recall $rf < single-tree recall $rs")
    assert(rf > 0.0)
  }

  test("banded splits: lo ≤ median ≤ hi per node, medians unchanged by " +
    "the band, spillPermille = 0 degenerates to the median-only " +
    "forest, and the default band can only LIFT recall") {
    val queries = corpus.filter($"vec_id" % 25 === 0)
    val f0 = Similarity.trainRpForest(corpus, "vec_id", "embedding",
      nTrees = 2, depth = 3, spillPermille = 0)
    val fS = Similarity.trainRpForest(corpus, "vec_id", "embedding",
      nTrees = 2, depth = 3)
    // the band is read off the SAME sample as the median — adding it
    // must not move any split point
    assert(f0.map(_.map(_.map { case (n, (m, _, _)) => n -> m })) ==
      fS.map(_.map(_.map { case (n, (m, _, _)) => n -> m })))
    fS.flatten.flatMap(_.values).foreach { case (m, lo, hi) =>
      assert(lo <= m && m <= hi, s"band ($lo, $hi] must bracket $m")
    }
    // sp = 0 ⇒ lo = hi = median ⇒ the spill predicate lo < p ≤ hi is
    // empty and every query routes single-path
    f0.flatten.flatMap(_.values).foreach { case (m, lo, hi) =>
      assert(lo == m && hi == m)
    }
    val brute = Similarity.bruteForceKnn(corpus, queries, "vec_id",
      "embedding", k = 3)
    def recallOf(ap: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.knnRecall(ap, brute)
        .agg(org.apache.spark.sql.functions.sum("n_hits"),
          org.apache.spark.sql.functions.sum("n_exact")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val a0 = Similarity.rpForestKnn(corpus, queries, "vec_id",
      "embedding", k = 3, forest = f0)
    val aS = Similarity.rpForestKnn(corpus, queries, "vec_id",
      "embedding", k = 3, forest = fS)
    // spill only ADDS candidates, and any candidate outscoring a true
    // top-k member is itself a true top-k member — so hits (and
    // recall) are monotone in the candidate set
    assert(recallOf(aS) >= recallOf(a0),
      "boundary spill must not lose recall")
    // spilled paths have distinct leaf prefixes — still no duplicates
    assert(aS.groupBy("qid", "nid").count()
      .filter($"count" > 1).isEmpty, "duplicate pairs under spill")
  }

  test("banded training scans the base relation O(depth) times via " +
    "per-level localCheckpoint, not O(depth²) lineage recompute") {
    val dir = java.nio.file.Files.createTempDirectory("rptrain").toFile
    try {
      val path = new java.io.File(dir, "emb").getAbsolutePath
      corpus.write.mode("overwrite").parquet(path)
      val df = spark.read.parquet(path)
      // local-scheme Hadoop FS counters: parquet reads go through them,
      // checkpoint/cache reads never do — so the delta across training
      // counts FILE passes only
      def fileBytes: Long = {
        var s = 0L
        val it = org.apache.hadoop.fs.FileSystem
          .getGlobalStorageStatistics.iterator()
        while (it.hasNext) {
          val st = it.next()
          if (st.getScheme == "file")
            s += Option(st.getLong("bytesRead"))
              .map(_.longValue).getOrElse(0L)
        }
        s
      }
      val sz = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      df.queryExecution.toRdd.count() // footer/schema reads outside the bracket
      val before = fileBytes
      val splits = Similarity.trainRpTreeBanded(df, "vec_id", "embedding",
        depth = 6, dim = 64)
      assert(splits.size == 6)
      val delta = fileBytes - before
      // one initial-checkpoint pass (+ footers); the un-checkpointed
      // formulation re-reads the file once per level ⇒ ≥ 6× here
      assert(delta <= 3 * sz,
        s"training read $delta file bytes for a $sz-byte corpus — " +
          "per-level lineage recompute is back")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("rpTreeKnn == brute-force ranking restricted to the query's leaf") {
    val splits = Similarity.trainRpTree(corpus, "vec_id", "embedding",
      depth = 3, dim = 64)
    val leaf = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", splits)
      .as[(Long, Long)].collect().toMap
    val queries = corpus.filter($"vec_id" % 50 === 0)
    val got = Similarity.rpTreeKnn(corpus, queries, "vec_id", "embedding",
        k = 3, splits = splits, dim = 64)
      .select("qid", "nid", "rank")
      .as[(Long, Long, Int)].collect().toSet

    val byId = vecs.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = (0L until 256L by 50L).flatMap { qid =>
      val qv = byId(qid)
      val qn = math.sqrt(dot(qv, qv))
      vecs.filter(v => v._1 != qid && leaf(v._1) == leaf(qid))
        .map { case (nid, v) =>
          (nid, dot(qv, v) / (qn * math.sqrt(dot(v, v)))) }
        .sortBy { case (nid, sim) => (-sim, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    assert(got == want)
  }

  test("levels >= RpSpillLevels route single-path (the capped arm " +
    "equals rpDescend at depth > RpSpillLevels)") {
    // ADVICE r16: the cap changes query routing only at tree levels >=
    // RpSpillLevels, a regime no depth-3 test can reach. Synthetic
    // banded models make the assertion exact at depth 4:
    //  - collapsed bands (lo = hi = median — never spills) at the
    //    capped levels 0..2 and a FULL-WIDTH band at level 3: if the
    //    cap is honored the level-3 band is IGNORED and the forest
    //    result must equal the median-only rpTreeKnn bit-for-bit;
    //  - the SAME full-width band moved to level 2 (inside the cap)
    //    must widen at least one query's candidate set — proving the
    //    fixture would detect a band that actually routes.
    val big: Seq[(Long, Array[Float])] = {
      val rnd = new scala.util.Random(7)
      (0L until 512L).map(i =>
        (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    }
    val bigDf = big.toDF("vec_id", "embedding")
    val queries = bigDf.filter($"vec_id" % 37 === 0)
    assert(Similarity.RpSpillLevels == 3, "fixture assumes the cap at 3")
    val banded = Similarity.trainRpTreeBanded(bigDf, "vec_id",
      "embedding", depth = 4, dim = 64)
    val medians = banded.map(_.map { case (n, (m, _, _)) => n -> m })
    def collapsed(l: Int) = banded(l).map { case (n, (m, _, _)) =>
      n -> (m, m, m) }
    def fullWidth(l: Int) = banded(l).map { case (n, (m, _, _)) =>
      n -> (m, Long.MinValue, Long.MaxValue) }
    def runForest(model: IndexedSeq[Map[Long, (Long, Long, Long)]]) =
      Similarity.rpForestKnn(bigDf, queries, "vec_id", "embedding",
          k = 512, forest = IndexedSeq(model), dim = 64)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
    val cappedBand = IndexedSeq(collapsed(0), collapsed(1), collapsed(2),
      fullWidth(3))
    val medianOnly = Similarity.rpTreeKnn(bigDf, queries, "vec_id",
        "embedding", k = 512, splits = medians, dim = 64)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(runForest(cappedBand) == medianOnly,
      "a band at a capped level must be ignored (single-path routing)")
    val insideCap = IndexedSeq(collapsed(0), collapsed(1), fullWidth(2),
      collapsed(3))
    val widened = runForest(insideCap)
    assert(medianOnly.subsetOf(widened) && widened.size > medianOnly.size,
      "a full-width band INSIDE the cap must widen some candidate set")
  }

  test("large query batches are free to plan as a shuffled leaf join " +
    "(no forced query-side broadcast)") {
    // VERDICT r16 #4: the candidate stage carries NO broadcast hint, so
    // when the query side does NOT fit (modeled by disabling broadcast
    // sizing outright) the leaf join must plan as a shuffled equi-join —
    // the corpus-vs-corpus path — and return the identical result. The
    // tree-descent model joins stay hint-broadcast (driver-state-sized
    // median tables, the licensed class).
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val splits = Similarity.trainRpTree(corpus, "vec_id", "embedding",
      depth = 3, dim = 64)
    val queries = corpus.filter($"vec_id" % 50 === 0)
    def run() = Similarity.rpTreeKnn(corpus, queries, "vec_id",
      "embedding", k = 3, splits = splits, dim = 64)
    val base = run().collect().map(_.toString).sorted
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      saved.foreach { case (k, _) => conf.set(k, "-1") }
      val qe = run().queryExecution
      val rows = qe.toRdd.count() // execute THIS QueryExecution (AQE final plan)
      assert(rows == base.length)
      def all(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case a: AdaptiveSparkPlanExec => all(a.executedPlan)
          case q: QueryStageExec => q +: all(q.plan)
          case n => Seq(n)
        }
      val shuffled = all(qe.executedPlan).exists {
        case j: SortMergeJoinExec =>
          j.leftKeys.exists(_.references.exists(_.name == "leaf"))
        case j: ShuffledHashJoinExec =>
          j.leftKeys.exists(_.references.exists(_.name == "leaf"))
        case _ => false
      }
      assert(shuffled,
        "expected the leaf candidate join to plan as a shuffled join " +
          "with broadcast sizing disabled")
      val got = run().collect().map(_.toString).sorted
      assert(got.sameElements(base))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
