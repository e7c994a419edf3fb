package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; the engine provides real Spark-side schema, partitioning and
  * batch plumbing while the codec step itself is a clearly-marked stub
  * (no image/audio libraries ship in this environment).
  *
  * Design for 100 TB: payload bytes never shuffle — every operator here
  * either (a) derives bounded-size features in a narrow map (no exchange),
  * or (b) aggregates AFTER projecting the payload away. Joins against
  * asset metadata broadcast the metadata side.
  */
object Multimodal {

  /** Canonical multimodal asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),            // image | audio | video
    StructField("mime_type", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("sample_rate", IntegerType))))))

  /** Wrap raw binary files (spark.read.format("binaryFile")) into the
    * canonical asset shape — the ingest path for real corpora. */
  def fromBinaryFiles(df: DataFrame, modality: String): DataFrame =
    df.select(
      xxhash64(col("path")).as("asset_id"),
      lit(modality).as("modality"),
      lit("application/octet-stream").as("mime_type"),
      col("content").as("payload"),
      struct(
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(IntegerType).as("sample_rate")).as("meta"))

  /** Payload size + content hash — the cheap exact-dedup/integrity pass
    * that runs before any decode. Codegen'd; payload never leaves the
    * scanning task. */
  def payloadStats(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("content_key", md5(col("payload")))

  /** Exact binary dedup: min-id keeper per distinct payload hash; only the
    * (hash, id) pair shuffles. */
  def exactDedup(df: DataFrame): DataFrame = {
    val keyed = payloadStats(df)
    val keepers = keyed.groupBy("content_key")
      .agg(min("asset_id").as("asset_id"))
      .select("asset_id")
    df.join(keepers, Seq("asset_id"), "left_semi")
  }

  /** STUB — codec decode. A real deployment maps payload → decoded tensor
    * via a native library (libjpeg/ffmpeg) inside `mapPartitions` (one
    * codec init per partition, not per row). Here: a deterministic fake
    * "decode" that derives a byte-histogram feature vector (256 bins,
    * L1-normalized) directly from the payload — real data flow, fake
    * codec. Replace `byteHistogram` with the native call at deployment. */
  def decodeFeatures(df: DataFrame, bins: Int = 64): DataFrame =
    df.withColumn("features", byteHistogram(col("payload"), bins))

  /** Deterministic payload → feature vector (the stubbed "decode"): a REAL
    * `bins`-bucket byte histogram, L1-normalized by payload length, computed
    * by the codegen'd [[graft.functions.expressions.ByteHistogram]]
    * expression — bit-identical to what [[decodePartitions]]' per-partition
    * decoder produces (equivalence asserted in MultimodalSpec), so either
    * decode path can serve the other as an oracle. */
  def byteHistogram(payload: Column, bins: Int): Column =
    graft.functions.expressions.ByteHistogram(payload, bins)

  /** The mapPartitions decode path — the deployment shape for a NATIVE
    * codec (libjpeg/ffmpeg): the decoder context is initialized once per
    * PARTITION and amortized across its rows, never per row. The decode
    * itself is stubbed (no codec libraries in this environment) with a
    * real byte-histogram feature computation over the payload, so the
    * partitioning, schema evolution and batch shape are production-true
    * and only `decodeOne`'s body changes at deployment. */
  def decodePartitions(df: DataFrame, bins: Int = 64): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(DoubleType, containsNull = false))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition "codec init" (stub): one reusable histogram buffer
      val buf = new Array[Long](bins)
      def decodeOne(payload: Array[Byte]): Array[Double] = {
        java.util.Arrays.fill(buf, 0L)
        var i = 0
        while (i < payload.length) { buf((payload(i) & 0xff) % bins) += 1; i += 1 }
        val n = math.max(1, payload.length).toDouble
        val out = new Array[Double](bins)
        i = 0
        while (i < bins) { out(i) = buf(i) / n; i += 1 }
        out
      }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = if (payload == null) new Array[Double](bins) else decodeOne(payload)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Frame/segment sampling plumbing: emit `k` logical sample offsets per
    * asset (time- or byte-based) as one row each — the fan-out a video
    * frame-sampler produces, without the codec. Downstream operators see
    * (asset_id, sample_idx, offset) exactly as they would with real
    * frames. */
  def sampleOffsets(df: DataFrame, k: Int): DataFrame =
    df.select(
        col("asset_id"), col("modality"),
        length(col("payload")).cast("long").as("n_bytes"),
        posexplode(sequence(lit(0), lit(k - 1))))
      .withColumnRenamed("pos", "sample_idx")
      .select(
        col("asset_id"), col("modality"), col("sample_idx"),
        // floor-divide explicitly: `/` is true division in both Spark and
        // DuckDB but their double→int casts round differently
        floor(col("col") * col("n_bytes") / k).cast("long").as("byte_offset"))

  /** Partition-by-modality writer layout: assets land in
    * `modality=<m>/...` so downstream readers prune by modality at the
    * file listing level. */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("modality").parquet(path)
}
