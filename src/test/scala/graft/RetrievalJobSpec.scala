package graft

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.spark.sql.functions._

/** S9 interchange: the Arrow IPC stream round-trip must carry exactly the
  * rows `collectRows` returns (ref parity: hive.py:313-352 returns results
  * as Arrow tables). Decoded here with the arrow-vector reader — i.e. the
  * consumer side is NOT Spark. */
class RetrievalJobSpec extends SparkSpec {

  test("collectAsArrow round-trips the same rows as collectRows") {
    val job = RetrievalJob(
      Tables.read(spark, sf(), "events")
        .select(col("event_id"), col("value"), col("event_type"))
        .filter(col("event_id") < 500))

    val expected = job.collectRows()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(expected.nonEmpty)

    val bytes = job.collectAsArrow()
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.asScala.map(_.getName) ==
        Seq("event_id", "value", "event_type"))
      val got = Iterator.continually(reader.loadNextBatch())
        .takeWhile(identity)
        .flatMap { _ =>
          val ids = root.getVector("event_id").asInstanceOf[BigIntVector]
          val vs = root.getVector("value").asInstanceOf[Float8Vector]
          val ts = root.getVector("event_type").asInstanceOf[VarCharVector]
          (0 until root.getRowCount).map(i =>
            (ids.get(i), vs.get(i), new String(ts.get(i), "UTF-8")))
        }
        .toSet
      assert(got == expected)
    } finally { reader.close(); alloc.close() }
  }

  test("collectAsArrow agrees with withTransform composition") {
    val job = RetrievalJob(
      Tables.read(spark, sf(), "events").select(col("event_id")))
      .withTransform(_.withColumn("doubled", col("event_id") * 2))
    val bytes = job.collectAsArrow()
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      var n = 0L
      var ok = true
      while (reader.loadNextBatch()) {
        val ids = root.getVector("event_id").asInstanceOf[BigIntVector]
        val dbl = root.getVector("doubled").asInstanceOf[BigIntVector]
        (0 until root.getRowCount).foreach { i =>
          ok &&= dbl.get(i) == ids.get(i) * 2
        }
        n += root.getRowCount
      }
      assert(ok)
      assert(n == job.count())
    } finally { reader.close(); alloc.close() }
  }
}
