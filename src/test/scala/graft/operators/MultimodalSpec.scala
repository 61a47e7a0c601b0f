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

  test("header codec: PNG/JPEG/GIF dims parsed from hand-built magic bytes; text falls back") {
    import spark.implicits._
    // PNG: signature + IHDR-first chunk, 640×480 big-endian at offsets 16/20
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',  // IHDR length + type
      0x00, 0x00, 0x02, 0x80,                      // width  = 640
      0x00, 0x00, 0x01, 0xE0,                      // height = 480
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte)
    // JPEG: SOI, APP0 (skipped by the segment walk), SOF0 with 33×44
    val jpeg = Array[Int](
      0xFF, 0xD8,                                  // SOI
      0xFF, 0xE0, 0x00, 0x04, 0x4A, 0x46,          // APP0, len 4
      0xFF, 0xC0, 0x00, 0x0B, 0x08,                // SOF0, len 11, precision
      0x00, 0x21,                                  // height = 33
      0x00, 0x2C,                                  // width  = 44
      0x01, 0x01, 0x11, 0x00,                      // 1 component
      0xFF, 0xD9).map(_.toByte)                    // EOI
    // GIF89a: logical screen 12×34 little-endian at offset 6
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x0C, 0x00, 0x22, 0x00, 0x00, 0x00, 0x00).map(_.toByte))
    assert(Multimodal.HeaderCodec.imageDims(png) === Some(("image/png", 640, 480)))
    assert(Multimodal.HeaderCodec.imageDims(jpeg) === Some(("image/jpeg", 44, 33)))
    assert(Multimodal.HeaderCodec.imageDims(gif) === Some(("image/gif", 12, 34)))
    assert(Multimodal.HeaderCodec.imageDims("plain text".getBytes) === None)
    assert(Multimodal.HeaderCodec.imageDims(png.take(20)) === None, "truncated header")
    // end to end: the decode pass uses the REAL dims + detected mime for
    // image payloads and the deterministic fake + declared mime otherwise
    val df = Seq((1L, png), (2L, jpeg), (3L, gif),
        (4L, "plain text".getBytes)).toDF("id", "blob")
    val out = Multimodal.decodeAndFeaturize(
        Multimodal.toMedia(df, "id", "blob", "application/octet-stream"))
      .select(col("media_id"), col("meta.mime"), col("meta.width"), col("meta.height"))
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "image/png", 640, 480)))
    assert(out(2L) === ((2L, "image/jpeg", 44, 33)))
    assert(out(3L) === ((3L, "image/gif", 12, 34)))
    val (fw, fh) = Multimodal.FakeCodec.decode("plain text".getBytes)
    assert(out(4L) === ((4L, "application/octet-stream", fw, fh)))
  }

  test("frame sampling keeps every stride-th fixed-size chunk") {
    val frames = Multimodal.sampleFrames(media.limit(3), frameBytes = 32, stride = 2)
    val nos = frames.select("frame_no").collect().map(_.getInt(0))
    assert(nos.nonEmpty)
    assert(nos.forall(_ % 2 == 0))
  }
}
