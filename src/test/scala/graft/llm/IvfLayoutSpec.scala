package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The 100 TB layout claim behind the pruned reads, evidenced: the
  * inverted-file index artifact written as parquet `partitionBy(cell)`
  * is read back PARTITION-PRUNED under the probed-cell `IN` predicate —
  * the file-source scan's partition filters select only the probed
  * directories, so candidate reads touch probed-cell bytes, never the
  * corpus. (Locally the cached index gets the same effect from
  * cell-clustered in-memory batch stats; this spec pins the on-disk
  * story the scaladocs cite.) */
class IvfLayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    (0L until 256L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
  }

  test("a cell-partitioned parquet index artifact is read " +
    "partition-pruned under the probed-cell IN predicate") {
    val corpus = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfKMeans(corpus, "vec_id", "embedding",
      nList = 16)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf_layout").toString
    try {
      Similarity.assignCells(corpus, "vec_id", "embedding", cents)
        .write.partitionBy("cell").mode("overwrite").parquet(dir)

      val index = spark.read.parquet(dir)
      val nCells = index.select("cell").distinct().count()
      assert(nCells > 8, s"fixture degenerate: $nCells populated cells")

      val probed = Seq(0, 3, 7)
      val read = index.filter(col("cell").isin(probed.map(Int.box): _*))
      read.queryExecution.toRdd.count()
      val scans = read.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a file-source scan")
      val selected = scans.head.selectedPartitions.partitionCount
      assert(selected <= probed.size,
        s"partition pruning failed: $selected of $nCells partitions read")
      // and the pruned read returns exactly the probed cells' rows
      val want = index.collect()
        .filter(r => probed.contains(r.getAs[Int]("cell"))).length
      assert(read.count() == want)
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
