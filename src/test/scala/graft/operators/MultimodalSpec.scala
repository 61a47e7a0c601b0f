package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.toMedia(
    spark.read.parquet(s"$sf/documents.parquet").limit(50),
    "doc_id", "text", "text/plain").cache()

  test("media schema: binary payload + typed metadata struct") {
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName === "binary")
    val m = media.select("meta.n_bytes", "meta.mime").collect()
    assert(m.forall(r => r.getLong(0) > 0 && r.getString(1) == "text/plain"))
  }

  test("decode pass fills dimensions and emits fixed-dim features per row") {
    val out = Multimodal.decodeAndFeaturize(media, dim = 8)
    assert(out.count() === 50)
    val r = out.select("meta.width", "meta.height", "features").collect()
    assert(r.forall(_.getInt(0) >= 64))
    assert(r.forall(_.getSeq[Float](2).length === 8))
  }

  test("decode is deterministic") {
    val a = Multimodal.decodeAndFeaturize(media).select("media_id", "meta.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Multimodal.decodeAndFeaturize(media).select("media_id", "meta.width")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a === b)
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(media.limit(3), frameBytes = 32, stride = 2)
    val nos = frames.select("frame_no").collect().map(_.getInt(0))
    assert(nos.nonEmpty)
    assert(nos.forall(_ % 2 == 0))
  }
}
