package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: run every query once at the smallest SF so
    // whole-stage-codegen compilation (janino cache, keyed by generated
    // source) and JIT happen before the timed run — first-execution
    // compilation of the complex dedup plans was measured at 5-14s, pure
    // one-time JVM cost, not data processing.
    // sf0.01 default: close enough to the bench SF that AQE picks the
    // same physical plans, so codegen compiled during warmup is the
    // codegen the timed run executes (sf0.001 plans can differ and leave
    // the timed first execution cold).
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.01")
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.values.foreach { fn =>
        // same materialization as the timed loop so the warmed codegen is
        // the codegen the timed run executes
        try fn(spark, warmDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // MEDIAN OF 3 runs per query: single-shot ~1s timings on a shared box
    // swing ±50% with JIT/scheduling noise (r2→r3 saw 2-4× swings on
    // queries whose code never changed) — a median can't be dragged by one
    // bad run, so regressions become signal. Failures are reported
    // per-query as {"err": msg} and excluded from `total` so a broken
    // query can never masquerade as a timing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        def once(): Either[String, Double] = {
          val t0 = System.nanoTime()
          try {
            // toRdd.count(), NOT df.count(): df.count() rewrites the plan to
            // Aggregate(count(1)) and column pruning then deletes the very
            // projection work being benchmarked (regexp/hash/sha columns) —
            // pure-projection queries would time a metadata-only scan.
            // toRdd executes the compiled plan and materializes every row.
            fn(spark, sfDir).queryExecution.toRdd.count()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        }
        val runs = (1 to reps).map(_ => once())
        val times = runs.collect { case Right(t) => t }.sorted
        name -> (if (times.isEmpty) runs.head
                 else Right(times(times.size / 2)))
      }
    val qs = results.map {
      case (k, Right(v)) => s"${jstr(k)}:$v"
      case (k, Left(m))  => s"${jstr(k)}:{${jstr("err")}:${jstr(m)}}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nerr = results.count(_._2.isLeft)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nerr,"sf":"$sfDir","reps":$reps}"""
    // The metric JSON ALSO goes to a file: the driver captures only the
    // tail of stdout, and r3's line was truncated mid-object by sbt noise
    // ("parsed": null in BENCH_r03.json). A file can't be truncated by a
    // log window.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_METRIC.json")
    try {
      val w = new java.io.PrintWriter(outFile, "UTF-8")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => () }
    println(line)
    spark.stop()
    // Compact totals-only object as the very LAST stdout line (after
    // spark.stop() so no shutdown logging can follow it): the driver's
    // tail window truncated the full per-query line in r3 AND r4
    // ("parsed": null). This one is ~120 bytes and always fits.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","errors":$nerr,"sf":"$sfDir","reps":$reps,"n_queries":${results.size}}"""
    println(compact)
    System.out.flush()
  }
}
