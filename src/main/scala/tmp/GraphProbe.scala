package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch measurement probe (deleted before round close): per-query
  * median-of-3 wall plus job/stage/shuffle counters from a listener —
  * the quantitative before/after evidence for the graph-iteration
  * keyed-view change. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("graph_pagerank", "graph_hits", "graph_trustrank")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      spark.sparkContext.setJobDescription(s"probe: $n")
      def once(): (Double, Int, Int, Long, Long) = {
        jobs.set(0); stages.set(0); shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.GraftSql.awaitListenerBus(spark)
        (dt, jobs.get, stages.get, shufRead.get, shufWrite.get)
      }
      once() // warm
      val runs = (1 to 3).map(_ => once())
      val med = runs.map(_._1).sorted.apply(1)
      val r = runs.last
      println(f"[probe] $n%-24s median ${med}%7.3f s  jobs ${r._2}%3d  " +
        f"stages ${r._3}%3d  shufRead ${r._4 / 1048576.0}%8.2f MiB  " +
        f"shufWrite ${r._5 / 1048576.0}%8.2f MiB")
    }
    spark.stop()
  }
}
