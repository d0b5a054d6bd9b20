package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (north-star, SURVEY §2.11): treat image /
 * audio / video payloads as opaque `BinaryType` columns carrying a typed
 * metadata struct, with decode / feature-extraction staged as
 * partition-wise batch transforms.
 *
 * The container has no image/audio codecs, so the *decode kernel* is a
 * clearly marked deterministic STUB — but everything Spark-side is real
 * and tested: the schema, the binary column handling, the
 * `mapPartitions` batch shape (the Scala analog of `mapInPandas`: one
 * iterator per partition, vectorizable batch loop inside), and the
 * partitioning story (payloads hash-partitioned by id so a 100 TB media
 * corpus fans out evenly; metadata prunes without touching bytes).
 */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /**
   * Attach a media payload + metadata struct to a DataFrame. In the
   * harness the "payload" is the UTF-8 bytes of a text column (a stand-in
   * for image bytes); in production this is the output of a binaryFile
   * read or a bytes column from upstream.
   */
  def withMediaColumn(df: DataFrame, sourceCol: String,
                      format: String = "raw"): DataFrame = {
    val payload = encode(col(sourceCol), "UTF-8")
    df.withColumn("media", payload)
      .withColumn("media_meta", struct(
        lit(format).as("format"),
        octet_length(payload).cast(LongType).as("n_bytes"),
        md5(payload).as("checksum")))
  }

  /**
   * Production ingest: read opaque media files through Spark's
   * `binaryFile` source (one row per file: path, modificationTime,
   * length, content) and normalize to the SAME (media, media_meta) shape
   * as [[withMediaColumn]] — the whole downstream pipeline
   * ([[extractFeatures]], [[resizeMeta]], [[sampleFrames]]) is then
   * source-agnostic between the harness text stand-in and real files.
   *
   * `media_id` is the xxhash64 of the file path: a stable 64-bit key to
   * hash-partition payloads by (and what `extractFeatures` joins on).
   * At 100 TB the source parallelizes by file; `pathGlobFilter` prunes by
   * extension before any byte is read.
   */
  def readBinaryFiles(spark: SparkSession, dir: String,
                      format: String = "binary",
                      pathGlob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val src = pathGlob.map(g => reader.option("pathGlobFilter", g))
      .getOrElse(reader).load(dir)
    src.select(
      xxhash64(col("path")).as("media_id"),
      col("path"),
      col("content").as("media"),
      struct(
        lit(format).as("format"),
        col("length").cast(LongType).as("n_bytes"),
        md5(col("content")).as("checksum")).as("media_meta"))
  }

  /** Output row of the feature-extraction stage. */
  final case class MediaFeatures(
      id: Long, format: String, n_bytes: Long, width: Int, height: Int,
      features: Array[Float])

  /**
   * STUB decode kernel — stands in for an image decoder (libjpeg etc.,
   * absent in this container). Deterministic: derives fake dimensions
   * (pure functions of payload length, so the DuckDB oracle can reproduce
   * them) and a fake 8-dim feature vector from the payload bytes, so
   * tests are stable. Swap this body for the real codec in production.
   */
  private[extensions] def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 16 + ((n.toLong * 31L) % 64L).toInt
    val height = 16 + (n % 64)
    val feats = new Array[Float](8)
    var i = 0
    while (i < n) { feats(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    var j = 0
    while (j < 8) { feats(j) = if (n == 0) 0f else feats(j) / math.max(1, n / 8); j += 1 }
    (width, height, feats)
  }

  /**
   * Partition-wise decode + feature extraction: the `mapInPandas` shape
   * in Scala — one iterator per partition, batch loop inside, columnar
   * in/out via the Dataset encoder. Runs where the bytes live; no
   * shuffle; no driver involvement.
   */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex("media")
    val metaIdx = df.schema.fieldIndex("media_meta")
    df.mapPartitions { rows: Iterator[Row] =>
      rows.map { row =>
        val payload = row.getAs[Array[Byte]](mediaIdx)
        val meta = row.getStruct(metaIdx)
        val (w, h, feats) = decodeStub(payload)
        MediaFeatures(row.getLong(idIdx), meta.getString(0), meta.getLong(1), w, h, feats)
      }
    }
  }

  /**
   * Resize plumbing: aspect-preserving target dimensions for a bounding
   * box (the real pixel resample is the codec stub's job — absent in this
   * container — but the dimension arithmetic, schema, and pipeline
   * position are the production shape). Pure integer math, so the oracle
   * reproduces it exactly.
   */
  def resizeMeta(df: DataFrame, idCol: String, box: Int = 64): DataFrame = {
    // integer floor division (`div`) matches every engine's semantics;
    // a degenerate 0x0 frame resizes to 1x1 instead of dividing by zero
    // (ANSI mode would kill the job)
    val longSide = "greatest(greatest(CAST(width AS BIGINT), CAST(height AS BIGINT)), 1)"
    val rw = greatest(expr(s"CAST(width AS BIGINT) * $box div $longSide"), lit(1L))
    val rh = greatest(expr(s"CAST(height AS BIGINT) * $box div $longSide"), lit(1L))
    df.select(col(idCol),
      col("width").cast(LongType).as("width"),
      col("height").cast(LongType).as("height"),
      rw.as("resized_w"), rh.as("resized_h"))
  }

  /** Frame-sampling plumbing for video-like payloads: deterministic
    * stride over the byte stream standing in for frame extraction;
    * output explodes to one row per sampled "frame". */
  def sampleFrames(df: DataFrame, idCol: String, everyNBytes: Int = 64): DataFrame =
    df.select(col(idCol), col("media_meta.n_bytes").as("n_bytes"))
      .select(col(idCol), col("n_bytes"),
        posexplode(sequence(lit(0L),
          greatest(expr(s"(n_bytes - 1) div $everyNBytes"), lit(0L)))))
      .select(col(idCol), col("n_bytes"), col("pos").cast(LongType).as("frame_no"),
        (col("col") * everyNBytes).as("byte_offset"))
}
