package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run per-partition over Arrow-sized batches.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * raw bytes. Everything around it — schema, batch iteration, partitioning,
  * null handling — is the real Spark plumbing a codec would plug into, and
  * is what the tests exercise.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("source", StringType, nullable = true))), nullable = true)))

  /** Wrap a text corpus as a media table: payload = utf8 bytes. Stands in
    * for `spark.read.format("binaryFile")` at test scale. */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      col(textCol).cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** Pure-column metadata extraction — byte length, head bytes, content
    * hash. Codegen'd; no decode needed, so it runs at scan speed. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.mime").as("mime"),
      col("meta.source").as("source"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 8)).as("head_hex"),
      md5(col("payload")).as("content_md5"))

  /** Frame sampling — the video/audio access pattern: one row per sampled
    * frame, a `frameLen`-byte slice every `stride` bytes. Pure columnar
    * (sequence + posexplode + substr), no decode: at 100 TB this is how a
    * trainer reads every k-th frame of a corpus without shipping whole
    * payloads — the Generate keeps only the slices, and column pruning
    * drops the full payload right after the substr. Tail frames shorter
    * than `frameLen` are kept truncated (codec-style). */
  def frameSample(media: DataFrame, frameLen: Int = 16, stride: Int = 64): DataFrame =
    media
      .select(
        col("media_id"),
        col("payload"),
        posexplode(sequence(lit(1L), octet_length(col("payload")).cast("long"), lit(stride.toLong)))
          .as(Seq("frame_idx", "off")))
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        hex(col("payload").substr(col("off").cast("int"), lit(frameLen))).as("frame_hex"),
        octet_length(col("payload").substr(col("off").cast("int"), lit(frameLen)))
          .cast("long").as("frame_bytes"))

  private val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** The decode/feature-extract boundary, shaped like a real codec UDF:
    * per-partition iteration, one output row per media row, fixed-width
    * feature vector. The "decoder" here is a deterministic stand-in —
    * byte-histogram moments over `dim` stripes — marking exactly where a
    * JPEG/PNG/audio codec would decode `bytes` instead.
    */
  def decodeStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        // ??? <- real codec goes here; deterministic fake: stripe means.
        val features = Array.tabulate(dim) { d =>
          val stripe = bytes.indices.collect { case i if i % dim == d => bytes(i) & 0xff }
          if (stripe.isEmpty) 0.0 else stripe.sum.toDouble / stripe.length
        }
        Row(id, bytes.length.toLong, features)
      }
    }
    spark.createDataFrame(out, FeatureSchema)
  }
}
