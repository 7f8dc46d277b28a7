package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing contracts: the codecs are stubbed (no media libs
  * here), but the schema, batch shape, one-to-many explode, output
  * bounds, and payloads-never-shuffle property are real and pinned.
  */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.documentsAsMedia(spark, "/root/testdata/sf0.001")

  test("resize: row-count preserving, output size tracks target dims, deterministic") {
    val in = media.cache()
    val out = Multimodal.resize(in, 64, 64).cache()
    assert(out.count() == in.count())
    val lens = out.select(octet_length(col("payload"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq == Seq(64 * 64 / 64)) // payload ∝ pixel budget
    val a = out.orderBy("media_id").limit(1).collect()(0).payload
    val b = Multimodal.resize(in, 64, 64).orderBy("media_id").limit(1)
      .collect()(0).payload
    assert(a.toSeq == b.toSeq) // deterministic stub
    // map-side only: no Exchange in the plan (payloads never shuffle)
    val plan = Multimodal.resize(in, 64, 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"resize should be map-side:\n$plan")
  }

  test("frame sampling: videos only, every-Nth bounded by maxFrames, timestamps from fps") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2, maxFrames = 3, fps = 25.0).cache()
    val videos = media.filter(col("kind") === "video").count()
    assert(frames.count() > 0 && frames.count() <= videos * 3)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.agg(max("count")).collect()(0).getLong(0) <= 3)
    // frame indices follow the stride; timestamps = idx/fps
    val one = frames.filter(col("media_id") === frames.select(min("media_id")).collect()(0).getLong(0))
      .orderBy("frame_idx").collect()
    one.zipWithIndex.foreach { case (r, i) =>
      assert(r.frame_idx == i * 2, s"stride: ${r.frame_idx} != ${i * 2}")
      assert(r.t_ms == math.round(i * 2 / 25.0 * 1000))
    }
  }
}
