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
    // Failures are reported per-query as {"err": msg} and excluded from
    // `total` so a broken query can never masquerade as a timing.
    val results: Seq[(String, Either[String, Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          // toRdd.count(), NOT df.count(): df.count() rewrites the plan to
          // Aggregate(count(1)) and column pruning then deletes the very
          // projection work being benchmarked (regexp/hash/sha columns) —
          // pure-projection queries would time a metadata-only scan.
          // toRdd executes the compiled plan and materializes every row.
          fn(spark, sfDir).queryExecution.toRdd.count()
          name -> Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            name -> Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      }
    val qs = results.map {
      case (k, Right(v)) => s"${jstr(k)}:$v"
      case (k, Left(m))  => s"${jstr(k)}:{${jstr("err")}:${jstr(m)}}"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val nerr = results.count(_._2.isLeft)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nerr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
