package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{MediaMeta, MediaRow}
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests (decode kernels are deterministic stubs —
  * the Spark-side schema/batch contracts are what is under test).
  */
class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((0L, "alpha"), (1L, "bravo"), (2L, "charlie video doc"))
    .toDF("doc_id", "text")

  test("asMediaTable: opaque binary + typed metadata struct") {
    val m = MultimodalOps.asMediaTable(docs, "doc_id", "text").collect()
    val byId = m.map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(new String(byId(0L).getAs[Array[Byte]]("content"), "UTF-8") == "alpha")
    val meta = byId(2L).getStruct(byId(2L).fieldIndex("meta"))
    assert(meta.getAs[String]("mediaType") == "video") // doc_id % 3 == 2
    assert(meta.getAs[Long]("byteLen") == "charlie video doc".length.toLong)
  }

  test("decodeFeatures: one deterministic feature row per blob") {
    implicit val s = spark
    val media = Seq(
      MediaRow(1L, "abc".getBytes("UTF-8"), MediaMeta("image", 3, 64, 64, 0, 0)),
      MediaRow(2L, "abc".getBytes("UTF-8"), MediaMeta("image", 3, 64, 64, 0, 0))
    ).toDS()
    val f = MultimodalOps.decodeFeatures(media).collect().sortBy(_.mediaId)
    assert(f.length == 2 && f(0).featNorm == f(1).featNorm) // same bytes → same feature
    assert(f.forall(_.dims == 512))
  }

  test("resize clamps dimensions preserving aspect ratio, never upscales") {
    val m = MultimodalOps.asMediaTable(docs, "doc_id", "text")
    val out = MultimodalOps.resize(m, 16, 16)
      .select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out.foreach { case (_, w, h) => assert(w <= 16 && h <= 16 && w > 0 && h > 0) }
  }

  test("sampleFrames: video rows only, capped frame count, step spacing") {
    val m = MultimodalOps.asMediaTable(docs, "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(m, everyMs = 500L, maxFrames = 4)
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("frame_ts_ms")))
    assert(frames.forall(_._1 == 2L)) // only the video row
    val ts = frames.map(_._2).sorted
    assert(ts.length <= 4 && ts.zip(ts.drop(1)).forall { case (a, b) => b - a == 500L })
  }
}
