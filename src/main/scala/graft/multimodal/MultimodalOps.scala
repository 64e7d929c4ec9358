package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Hashes

/** Multimodal (image/audio/video) column handling: opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling plumbing.
  *
  * Extension surface beyond the reference (BASELINE.json north star).
  *
  * The actual media codecs are NOT in this environment, so the decode
  * kernels are deliberate deterministic STUBS (clearly marked) — what
  * is real and tested is the Spark-side plumbing: binary schema,
  * batched per-partition processing (the Scala analog of
  * `mapInPandas` — one iterator pass, no per-row overhead, no driver
  * collect), partition sizing, and the explode-based frame sampler.
  * At 100 TB the payload column dominates I/O: keep media in its own
  * parquet column so column pruning skips it unless decoded, and size
  * `maxRecordsPerFile` / `files.maxPartitionBytes` to the payload, not
  * the row count.
  */
object MultimodalOps {

  /** Canonical media row: payload + source metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a string column as an opaque binary payload column (stand-in
    * for `spark.read.format("binaryFile")` content at test scale). */
  def attachBinary(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(payloadCol).cast(BinaryType).as("content"),
      lit(mediaType).as("media_type"),
      octet_length(col(payloadCol)).cast(LongType).as("n_bytes"))

  /** STUB image decode, native-expression tier: deterministic fake
    * dimensions derived from the payload hash (a real deployment swaps
    * in a codec inside [[decodeBatched]]). Shuffle-free projection.
    */
  def fakeDecodeMeta(df: DataFrame): DataFrame = {
    val h = Hashes.portable(md5(col("content")))
    df.withColumn("width", (lit(64) + pmod(h, lit(1217))).cast(IntegerType))
      .withColumn("height", (lit(64) + pmod(h, lit(977))).cast(IntegerType))
      .withColumn("channels", lit(3))
  }

  final case class MediaFeatures(media_id: Long, n_bytes: Long,
                                 mean_byte: Double, first_byte: Int)

  /** Batched per-partition feature extraction — the Scala analog of the
    * `mapInPandas` pattern: one pass over each partition's iterator,
    * constant memory, executor-side only. The kernel here is a
    * deterministic STUB (byte statistics); a real deployment replaces
    * the loop body with a codec/model call, batching stays identical.
    */
  def decodeBatched(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "content").as(Encoders.tuple(
      Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // --- STUB kernel: replace with real decode at deploy time ---
          val n = bytes.length
          val mean = if (n == 0) 0.0 else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / n
          MediaFeatures(id, n.toLong, mean, if (n == 0) -1 else bytes(0) & 0xff)
        }
      }
  }

  /** Frame sampling for (fake) video payloads: every `step`-th frame
    * index of `n_frames` derived from payload size — the explode keeps
    * sampling distributed and prunes the payload column immediately.
    */
  def sampleFrames(df: DataFrame, bytesPerFrame: Int = 100, step: Int = 10): DataFrame =
    df.select(col("media_id"),
        explode(sequence(lit(0),
          (col("n_bytes") / bytesPerFrame).cast(IntegerType),
          lit(step))).as("frame_idx"))

  /** STUB resize: recompute fake dims to a bounded box, preserving the
    * plumbing (projection over decoded metadata). The scale is staged
    * into its own column BEFORE either dimension is replaced — chaining
    * `withColumn("width", f(scale)).withColumn("height", f(scale))`
    * with an unstaged `scale` expression would re-evaluate it against
    * the already-resized width and break the aspect ratio (caught by
    * the q_mm_resize oracle). */
  def fakeResize(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("__scale", least(lit(1.0),
        lit(maxSide) / greatest(col("width"), col("height")).cast(DoubleType)))
      .withColumn("width", floor(col("width") * col("__scale")).cast(IntegerType))
      .withColumn("height", floor(col("height") * col("__scale")).cast(IntegerType))
      .drop("__scale")
}
