package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` payloads
  * plus a typed metadata struct, with decode/feature steps as per-partition
  * batch functions.
  *
  * Spark-side plumbing (schema, partitioning, batch shape) is real and
  * tested; the actual codec call is stubbed behind [[FakeCodec]] because no
  * image/audio libraries ship in this environment — swap `decode` for a JNI
  * or library call without touching the dataflow.
  *
  * Scale design: payloads stay columnar in parquet (binary column, never
  * driver-collected); decode is `mapPartitions` so one task amortizes codec
  * init over a whole parquet row-group, the same execution shape as
  * `mapInPandas` batches in the PySpark deployment of this pattern.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val mediaMeta: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
  ))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMeta),
  ))

  /** Deterministic fake codec: "decodes" a payload into (width, height) and a
    * fixed-length feature vector derived from payload bytes. Replace with a
    * real decoder in production — the signature is the contract. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (64 + math.floorMod(h, 512), 64 + math.floorMod(h * 7, 512))
    }
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      // integer byte sums per slot, one float division at the end: exact and
      // order-independent, so an external engine reproduces it bit-for-bit
      // (float accumulation would be accumulation-order-dependent)
      val sums = new Array[Long](dim)
      var i = 0
      while (i < payload.length) { sums(i % dim) += (payload(i) & 0xFF); i += 1 }
      sums.map(s => (s / 255.0).toFloat)
    }
  }

  /** Wrap a table with a string/blob column into the media schema. */
  def toMedia(df: DataFrame, idCol: String, payloadCol: String,
              mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        octet_length(col("payload")).cast("long").as("n_bytes")))

  /** Decode pass: fills width/height + emits a feature vector, one codec
    * instance per partition — a typed `Dataset.mapPartitions` (the Scala
    * analog of `mapInPandas` batches: Encoders serialize straight between
    * Tungsten rows and JVM primitives, no Row-object round trip). */
  def decodeAndFeaturize(media: DataFrame, dim: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media
      .select(col("media_id"), col("payload"), col("meta.mime"), col("meta.n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, payload, mime, nBytes) =>
          val (w, h) = FakeCodec.decode(payload)
          (id, payload, mime, w, h, nBytes, FakeCodec.features(payload, dim))
        }
      }
      .toDF("media_id", "payload", "mime", "w", "h", "n_bytes", "features")
      .select(col("media_id"), col("payload"),
        struct(col("mime"), col("w").as("width"), col("h").as("height"),
          col("n_bytes")).as("meta"),
        col("features"))
  }

  /** Frame-sampling shape for video-like payloads: split a payload into
    * fixed-size chunks ("frames") and keep every `stride`-th — pure column
    * ops, no UDF. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"), posexplode(split(base64(col("payload")),
      s"(?<=\\G.{${frameBytes}})")).as(Seq("frame_no", "frame_b64")))
      .where(pmod(col("frame_no"), lit(stride)) === 0)
}
