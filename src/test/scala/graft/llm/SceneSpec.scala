package graft.llm

import graft.SparkSpec

/** Scene-change detection: the byte-hash transition scan must recover
  * the planted run-length structure exactly, a static clip is one
  * scene, and results are repartition-invariant. */
class SceneSpec extends SparkSpec {
  import spark.implicits._

  test("recovers the planted scene structure exactly") {
    val ids = (0L until 24L).toDF("doc_id")
    val got = Multimodal.sceneChanges(
        Multimodal.synthesizeSceneVideos(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (id <- 0L until 24L) {
      val ns = 2 + id % 4
      val nf = (0L until ns).map(s => 1 + (id + s) % 3).sum
      assert(got(id) == ((nf, ns)), s"doc $id: got ${got(id)}, want ($nf, $ns)")
    }
  }

  test("a static clip (every frame identical) is one scene") {
    // id = 0: synthesizeMjpegVideos emits 2 frames with gray(0*7+i*31)
    // — frames DIFFER; instead build identity runs via the scene
    // fixture's id 4 (2 + 4%4 = 2 scenes) versus a single-scene id:
    // id % 4 == 2 gives 4 scenes; no id gives 1 — so assert the
    // degenerate case directly on a hand-built AVI of repeated frames.
    val jpeg = Multimodal.ImageCodec.encodeJpeg(8, 8, 0x555555)
    val avi = Multimodal.AviMjpeg.encode(Seq(jpeg, jpeg, jpeg))
    val df = Seq((7L, avi)).toDF("doc_id", "payload")
    val got = Multimodal.sceneChanges(df).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L &&
      got(0).getLong(2) == 1L)
  }

  test("repartition-invariant") {
    val ids = (0L until 40L).toDF("doc_id")
    def run(n: Int) = Multimodal.sceneChanges(
        Multimodal.synthesizeSceneVideos(ids.repartition(n), "doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(11))
  }
}
