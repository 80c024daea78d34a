package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.fakePayloads(Tables(spark, "/root/testdata/sf0.001", "documents"))

  test("payload schema: binary column + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName === "binary")
    assert(sch("kind").dataType.typeName === "string")
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decode stub features match a driver-side recompute") {
    val f = Multimodal.extractFeatures(media)
      .filter(col("doc_id") === 0L).collect().head
    val text = Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") === 0L).select("text").as[String].collect().head
    val bytes = text.getBytes("UTF-8")
    assert(f.byte_len === bytes.length)
    assert(f.byte_sum === bytes.map(_ & 0xFF).map(_.toLong).sum)
    assert(f.n_frames === math.max(1, bytes.length / 256))
    assert(f.hist.sum === bytes.length)
  }

  test("feature extraction is distributed (partition count preserved)") {
    val parts = Multimodal.extractFeatures(media.repartition(4))
      .rdd.getNumPartitions
    assert(parts === 4)
  }

  test("resizeMeta: aspect-preserving downscale, never upscale") {
    val out = Multimodal.resizeMeta(media, 128, 128)
      .select("width", "height", "out_width", "out_height").collect()
    out.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 128 && oh <= 128)
      assert(ow <= w && oh <= h)
    }
  }

  test("frame sampling emits every stride-th frame for video rows") {
    val feats = Multimodal.extractFeatures(media)
    val sampled = Multimodal.sampleFrames(feats, stride = 2)
    val one = sampled.filter(col("doc_id") === 2L) // doc 2 -> kind video
    val frames = one.select("frame_idx").as[Int].collect().sorted
    assert(frames.nonEmpty)
    assert(frames.forall(_ % 2 === 0))
  }
}
