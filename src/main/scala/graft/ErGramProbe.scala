package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-resolution candidate-generation head-to-head on the realistic
  * erName2 corpus (the VocabProbe / BpeDepthProbe pricing pattern for
  * mechanisms whose cost is quadratic BY CONSTRUCTION): per decade,
  * count each scheme's CANDIDATE relation — the quantity the fan-out
  * argument is about — and time that stage single-shot.
  *
  * Why this lives outside the standing BENCH_10X family: the q-gram
  * count filter's candidate join is alphabet-bounded — at 50k names
  * every positional trigram of the 15 uniform surname characters has
  * df ≈ N/256..N/1024, so the (gram, banded position) join grinds
  * ~0.1·N² rows regardless of thresholds (plus the given-name head
  * block at ~0.4 % top share) — a median-3 standing row would grind for
  * the better part of an hour pricing a mechanism whose exponent is
  * already known. The segment-pair signature divides the head by
  * surname entropy and stays ~linear; the gate (`x_er_names_gram` /
  * `x_er_names_seg`, both DuckDB-hash-checked at sf0.01) pins both
  * schemes' CORRECTNESS; this probe pins the fan-out.
  *
  * Usage: runMain graft.ErGramProbe [dir1 dir2 ...]
  * (defaults: /root/testdata/sf0.1 tmp_bench10x — 5k and 50k names)
  */
object ErGramProbe {

  private def names(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val f = graft.llm.Fuzzy
    val d = Tables.read(spark, dir, "documents").select(col("doc_id"))
    (d.select(col("doc_id").as("id"), f.erName2(col("doc_id")).as("name")),
      d.select(col("doc_id").as("id"),
        f.erDirty(f.erName2(col("doc_id")), col("doc_id")).as("name")))
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "tmp_bench10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val f = graft.llm.Fuzzy
    println(f"${"dir"}%-28s ${"n"}%9s ${"seg_s"}%8s ${"seg_cands"}%10s ${"gram_s"}%8s ${"gram_cands"}%11s")
    dirs.foreach { dir =>
      val (l, r) = names(spark, dir)
      val n = l.count()
      def timed(df: DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = df.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (ts, cs) = timed(f.segmentPairCandidates(l, r, "id", "name", k = 2))
      val (tg, cg) = timed(f.qgramCandidates(l, r, "id", "name", q = 3, k = 2))
      println(f"$dir%-28s $n%9d $ts%8.2f $cs%10d $tg%8.2f $cg%11d")
    }
    spark.stop()
  }
}
