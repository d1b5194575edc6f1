package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, and partition-parallel decode/feature
  * pipelines.
  *
  * The Spark-side machinery here is real and tested — schema contract,
  * batch-iterator decode over `mapPartitions` (the JVM analogue of a Pandas
  * `mapInPandas` batch UDF: one decoder instance per partition, streaming
  * row batches through it), partition sizing — while the codec itself is a
  * clearly-marked STUB (`fakeDecode`): this container has no image/audio
  * libraries, so the stub derives deterministic pseudo-features from the
  * bytes. Swapping in a real decoder changes only `decodeFn`.
  */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false),
    )), nullable = false),
  ))

  /** Wrap raw binary rows into the media schema (metadata inferred from the
    * payload; format sniffed from magic bytes — real logic, tiny scope). */
  def asMediaTable(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val b = col(binCol)
    val magic = substring(b, 1, 4).cast("string")
    df.select(
      col(idCol).cast("long").as("media_id"),
      b.as("payload"),
      struct(
        when(magic.startsWith("PNG"), "png")
          .when(magic.startsWith("RIFF"), "riff")
          .otherwise("raw").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        octet_length(b).cast("long").as("n_bytes"),
      ).as("meta"))
  }

  /** STUB decoder — deterministic pseudo-features from payload bytes.
    * A real implementation would decode the image/audio frame here; the
    * container has no codec libraries, so this stands in with stable fake
    * output (hash-derived), keeping the pipeline end-to-end testable. */
  def fakeDecode(payload: Array[Byte], featureDim: Int): Array[Float] = {
    if (payload == null) return Array.empty
    var h = 1125899906842597L // FNV-ish rolling state over the payload
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    Array.tabulate(featureDim) { j =>
      val x = h ^ (j.toLong * 0x9e3779b97f4a7c15L)
      ((x % 1000L).toFloat) / 1000.0f
    }
  }

  /** Partition-parallel decode: one decoder per partition, rows streamed
    * through it — the batch shape a heavyweight codec needs (model/codec
    * init amortized per partition, not per row). */
  def decodeFeatures(media: DataFrame, featureDim: Int = 16,
                     decodeFn: (Array[Byte], Int) => Array[Float] = fakeDecode): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = media.schema.fieldIndex("payload")
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handle, model, ...)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeFn(payload, featureDim))
      }
    }
  }

  /** Frame sampling stub: pick n deterministic byte-offset "frames" from the
    * payload (a video decoder would seek; the slicing/explode plumbing is the
    * real part). Returns one row per sampled frame. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val total = col("meta.n_bytes")
    media.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset", (col("frame_idx") * total / lit(n)).cast("long"))
      .withColumn("frame", expr(s"substring(payload, cast(frame_offset as int) + 1, 16)"))
  }
}
