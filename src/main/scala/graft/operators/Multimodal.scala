package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * run per-partition over the payload bytes.
  *
  * The codec is REAL: `decodePpm` parses the binary PPM (P6) image format —
  * magic, whitespace/comment-tolerant ASCII header, raw RGB triplets — and
  * extracts exact integer-arithmetic channel statistics, so an external SQL
  * engine can replay the features bit-for-bit (q25). `encodePpm` is the
  * matching write-side: it wraps payload bytes into a valid P6 image with
  * pure columnar byte ops (no UDF). Heavier codecs (JPEG/FLAC/H.264 — not
  * shipped in this environment) would slot into the same per-partition
  * decode boundary with the same schema/null contract.
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

  /** Wrap each payload's bytes as a valid PPM (P6) image of fixed `w`×`h`
    * geometry: `"P6\n<w> <h>\n255\n"` + the first 3·w·h payload bytes,
    * zero-padded when the payload is shorter. Pure columnar byte ops —
    * the header is a literal, the pixel plane is substring + rpad on
    * BINARY — so encoding runs inside whole-stage codegen and an external
    * engine can reconstruct the identical image from the source bytes. */
  def encodePpm(media: DataFrame, w: Int = 4, h: Int = 4): DataFrame = {
    require(w > 0 && h > 0, "image geometry must be positive")
    val header = lit(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
    val plane = 3 * w * h
    media.withColumn("payload",
      concat(header,
        rpad(substring(col("payload"), 1, plane), plane, Array[Byte](0))))
  }

  private val PpmFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("maxval", LongType, nullable = true),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** Real decode at the per-partition codec boundary: parse the PPM (P6)
    * binary format and emit per-channel statistics.
    *
    * The parser honors the format's actual grammar — `P6` magic, header
    * integers separated by runs of whitespace, `#` comments swallowed to
    * end-of-line anywhere between tokens, exactly ONE whitespace byte
    * after maxval, then 3·w·h raw RGB bytes (maxval ≤ 255 ⇒ 1 byte/sample).
    * Features are the R/G/B channel means computed as exact integer sums
    * over w·h samples divided once at the end — replayable bit-for-bit by
    * the q25 oracle. Malformed payloads (bad magic, truncated pixel plane,
    * maxval out of range) yield a row with null geometry/features rather
    * than poisoning the partition — the real-codec error contract.
    */
  def decodePpm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        parsePpm(bytes) match {
          case Some((w, h, maxval, off)) =>
            val n = w * h
            val sums = new Array[Long](3)
            var i = 0
            while (i < 3 * n) {
              sums(i % 3) += bytes(off + i) & 0xff
              i += 1
            }
            Row(id, bytes.length.toLong, w.toLong, h.toLong, maxval.toLong,
              sums.map(s => s.toDouble / n.toDouble))
          case None =>
            Row(id, bytes.length.toLong, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(out, PpmFeatureSchema)
  }

  /** PPM (P6) header parse: returns (width, height, maxval, pixelOffset)
    * when `bytes` is a well-formed single-byte-sample image with a full
    * pixel plane, None otherwise. */
  private[operators] def parsePpm(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var i = 0
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
    // runs of whitespace; '#' opens a comment swallowed to end-of-line
    def skipSeparators(): Unit = {
      var moving = true
      while (moving && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else moving = false
      }
    }
    def parseInt(): Int = {
      var v = -1
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(i) - '0')
        i += 1
        if (v > 1000000) return -1 // refuse absurd geometry before overflow
      }
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    skipSeparators(); val w = parseInt()
    skipSeparators(); val h = parseInt()
    skipSeparators(); val maxval = parseInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // exactly one whitespace byte terminates the header before raw data
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    if (bytes.length - i < 3L * w * h) return None // truncated pixel plane
    Some((w, h, maxval, i))
  }
}
