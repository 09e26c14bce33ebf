package graft

import org.apache.spark.sql.SparkSession

/** Merge-DEPTH scaling contrast for the two BPE encode shapes
  * (VERDICT r16 missing #1): [[graft.llm.Bpe.applyMerges]] runs one
  * generated string `replace` PER MERGE — plan size and per-row cost
  * linear in nMerges, fine at the 8-merge gate, unusable at a real
  * tokenizer's 32k — while [[graft.llm.Bpe.encodeDeep]] applies the
  * whole table through one referenced-object expression over the
  * distinct-word contraction, so depth costs hash lookups, not plan.
  *
  * This probe trains a deep merge table ONCE on the corpus's word
  * counts (the production trainer), then times BOTH encodes at a
  * depth ladder, printing one JSON line per (shape, depth): seconds
  * (median of 3 after warmup), plan build time, rows. The expected
  * picture — chain time/build grows ~linearly with depth, deep encode
  * flat — is the evidence that the depth-independent shape is the
  * 100 TB path. Run on a Zipf-vocabulary probe corpus so the
  * contraction's |vocab| ≪ |instances| reduction is realistic.
  *
  * Usage: runMain graft.BpeDepthProbe [sfDir] [maxDepth]
  */
object BpeDepthProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("tmp_bench10x")
    val maxDepth = if (args.length > 1) args(1).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = Tables.read(spark, dir, "documents")
    val t0 = System.nanoTime()
    val counts = graft.llm.Bpe.wordCounts(d, "text")
    val tCounts = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val merges = graft.llm.Bpe.trainOnCounts(counts, maxDepth)
    val tTrain = (System.nanoTime() - t1) / 1e9
    println(s"""{"probe":"bpe_depth","dir":"$dir","vocab":${counts.size},""" +
      s""""merges_trained":${merges.size},"word_count_s":$tCounts,""" +
      s""""train_s":$tTrain}""")

    def time(mk: () => org.apache.spark.sql.DataFrame): (Double, Double, Long) = {
      // build time = plan construction + analysis (the chain's hidden
      // linear cost); run time = median of 3 materializations
      val b0 = System.nanoTime()
      val df = mk()
      df.queryExecution.executedPlan // force analysis + optimization
      val buildS = (System.nanoTime() - b0) / 1e9
      var rows = 0L
      val runs = (1 to 3).map { _ =>
        val r0 = System.nanoTime()
        rows = df.queryExecution.toRdd.count()
        (System.nanoTime() - r0) / 1e9
      }
      (buildS, runs.sorted.apply(1), rows)
    }

    for (depth <- Seq(8, 64, 256, 1024).filter(_ <= merges.size)) {
      val m = merges.take(depth)
      val (db, ds, dr) = time(() =>
        graft.llm.Bpe.encodeDeep(d, "doc_id", "text", m))
      println(s"""{"probe":"bpe_depth","shape":"deep","depth":$depth,""" +
        s""""build_s":$db,"run_s":$ds,"rows":$dr}""")
      // the chain at 1024 merges can overwhelm janino/analysis budgets —
      // that failure mode is itself the finding, so report it as such
      try {
        val (cb, cs, cr) = time(() =>
          graft.llm.Bpe.applyMerges(d, "doc_id", "text", m))
        println(s"""{"probe":"bpe_depth","shape":"chain","depth":$depth,""" +
          s""""build_s":$cb,"run_s":$cs,"rows":$cr}""")
      } catch {
        case e: Throwable =>
          println(s"""{"probe":"bpe_depth","shape":"chain","depth":$depth,""" +
            s""""error":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
