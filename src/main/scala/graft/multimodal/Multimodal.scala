package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; the engine provides real Spark-side schema, partitioning and
  * batch plumbing, plus a real pure-JVM codec tier ([[ImageCodec]]: PPM/
  * PGM + uncompressed BMP parsed directly, JPEG/PNG/GIF via the JDK's
  * ImageIO) — audio/video codecs (ffmpeg) slot into the same
  * per-partition seam via a native library at deployment.
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

  /** Cheap column-path features over RAW payload bytes — no decode, fully
    * codegen'd, the pre-decode signal (container fingerprinting, corrupt-
    * blob triage, cheap near-dup) that runs before any codec is paid for.
    * For payloads a codec can't parse this is also exactly what
    * [[decodePartitions]] falls back to (equivalence asserted in
    * MultimodalSpec), so either path can serve the other as an oracle. */
  def decodeFeatures(df: DataFrame, bins: Int = 64): DataFrame =
    df.withColumn("features", byteHistogram(col("payload"), bins))

  /** Deterministic bytes → feature vector: a `bins`-bucket byte histogram,
    * L1-normalized by length, computed by the codegen'd
    * [[graft.functions.expressions.ByteHistogram]] expression. */
  def byteHistogram(payload: Column, bins: Int): Column =
    graft.functions.expressions.ByteHistogram(payload, bins)

  /** Nullable decode-result struct appended by [[decodePartitions]]:
    * null when the payload parsed as no supported format. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** The mapPartitions decode path — decoder state is initialized once per
    * PARTITION and amortized across its rows, never per row. The codec is
    * REAL for the raster formats ([[ImageCodec]]: PPM "P6"/PGM "P5" and
    * uncompressed 24/32-bpp BMP parsed directly; JPEG, PNG and GIF through
    * the JDK's ImageIO): header → (width, height, channels) in the
    * appended `decoded` struct, and `features` is the byte histogram of
    * the DECODED PIXEL bytes (padding and header stripped). Payloads no
    * codec recognizes keep `decoded = null` and fall back to the
    * raw-payload histogram — bit-identical to [[decodeFeatures]], so the
    * cheap column path remains the oracle for the fallback tier. Audio/
    * video codecs (ffmpeg) plug into the same per-partition seam at
    * deployment; nothing else changes shape. */
  def decodePartitions(df: DataFrame, bins: Int = 64): DataFrame = {
    val outSchema = df.schema
      .add("decoded", decodedSchema)
      .add("features", ArrayType(DoubleType, containsNull = false))
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      // per-partition decoder state: one reusable histogram buffer
      val buf = new Array[Long](bins)
      def histogram(bytes: Array[Byte]): Array[Double] = {
        java.util.Arrays.fill(buf, 0L)
        var i = 0
        while (i < bytes.length) { buf((bytes(i) & 0xff) % bins) += 1; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        val out = new Array[Double](bins)
        i = 0
        while (i < bins) { out(i) = buf(i) / n; i += 1 }
        out
      }
      // defense in depth: a codec bug on one corrupt blob must degrade that
      // ROW to the raw-byte fallback, not kill the whole partition's task
      def safeDecode(p: Array[Byte]): Option[ImageCodec.DecodedImage] =
        try ImageCodec.decode(p)
        catch { case scala.util.control.NonFatal(_) => None }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (decoded, feats) =
          if (payload == null) (null, new Array[Double](bins))
          else safeDecode(payload) match {
            case Some(img) =>
              (org.apache.spark.sql.Row(img.width, img.height, img.channels),
                histogram(img.pixels))
            case None => (null, histogram(payload))
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoded :+ feats.toSeq)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Nullable audio-decode struct appended by [[decodeAudioPartitions]]. */
  val audioSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  /** Synthesis side of the audio round-trip: append a deterministic PCM
    * WAV `payload` built per row from integer geometry columns
    * (`sample_rate`, `channels`, `bits_per_sample`, `n_frames`). Used by
    * the oracle-backed `mm_audio_meta` query so the decode path is
    * exercised over real bytes while DuckDB predicts the metadata
    * arithmetically. */
  def synthesizeWavPayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val sr = df.schema.fieldIndex("sample_rate")
    val ch = df.schema.fieldIndex("channels")
    val bits = df.schema.fieldIndex("bits_per_sample")
    val fr = df.schema.fieldIndex("n_frames")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = AudioCodec.encodeWav(r.getInt(sr), r.getInt(ch), r.getInt(bits), r.getInt(fr))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[synthesizeWavPayload]] with a deterministic ramp tone (see
    * [[AudioCodec.encodeWavRamp]]): adds a `tone_seed` geometry column so
    * the payload-feature pass has a non-trivial, oracle-predictable
    * amplitude distribution. */
  def synthesizeWavTonePayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val sr = df.schema.fieldIndex("sample_rate")
    val ch = df.schema.fieldIndex("channels")
    val bits = df.schema.fieldIndex("bits_per_sample")
    val fr = df.schema.fieldIndex("n_frames")
    val sd = df.schema.fieldIndex("tone_seed")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = AudioCodec.encodeWavRamp(
          r.getInt(sr), r.getInt(ch), r.getInt(bits), r.getInt(fr), r.getInt(sd))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Synthesis side of the image round-trip (see [[synthesizeWavPayload]]):
    * append a deterministic real-PNG `payload` built per row from integer
    * geometry columns (`width`, `height`, `pattern_seed`) —
    * [[ImageCodec.encodePng]]'s closed-form pixel pattern, so the decoded
    * byte histogram is oracle-predictable. */
  def synthesizePngPayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val w = df.schema.fieldIndex("width")
    val h = df.schema.fieldIndex("height")
    val sd = df.schema.fieldIndex("pattern_seed")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = ImageCodec.encodePng(r.getInt(w), r.getInt(h), r.getInt(sd))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Synthesis side of the perceptual-hash round-trip: append a real-PNG
    * `payload` per row from (`size_mult`, `seed`) —
    * [[ImageCodec.encodeBlockPng]]'s normalized block pattern, the same
    * image at per-row resolution, so scaled duplicates exist by
    * construction and the dup GROUPS are closed-form (the seed). */
  def synthesizeBlockPngPayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val m = df.schema.fieldIndex("size_mult")
    val sd = df.schema.fieldIndex("seed")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = ImageCodec.encodeBlockPng(r.getInt(m), r.getInt(sd))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Lossy sibling of [[synthesizeBlockPngPayload]]: the same
    * (`size_mult`, `seed`) block pattern as a REAL JPEG
    * ([[ImageCodec.encodeJpegBlock]], quality 0.9) — the fixture for the
    * tolerance-gated JPEG fidelity oracle. */
  def synthesizeBlockJpegPayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val m = df.schema.fieldIndex("size_mult")
    val sd = df.schema.fieldIndex("seed")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = ImageCodec.encodeJpegBlock(r.getInt(m), r.getInt(sd))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[decodePartitions]]'s moments variant: appends the `decoded` dims
    * struct plus `px_sum`/`px_n` — the exact integer sum and count of the
    * decoded pixel bytes — instead of a histogram. This is the seam for
    * LOSSY formats: their byte distribution is not closed-form, but their
    * pixel MEAN is bounded within quantization error of the source
    * pattern's arithmetic mean, so a tolerance-gated oracle can check
    * real decode fidelity. Undecodable payloads keep `decoded = null`
    * with zero moments (corrupt-never-throw, per-row fallback). Map-only;
    * payload bytes never leave the scan task. */
  def decodeStatsPartitions(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("decoded", decodedSchema)
      .add("px_sum", LongType)
      .add("px_n", LongType)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      def safeDecode(p: Array[Byte]): Option[ImageCodec.DecodedImage] =
        try ImageCodec.decode(p)
        catch { case scala.util.control.NonFatal(_) => None }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (decoded, s, n) =
          Option(payload).flatMap(safeDecode) match {
            case Some(img) =>
              var sum = 0L
              var i = 0
              while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
              (org.apache.spark.sql.Row(img.width, img.height, img.channels),
                sum, img.pixels.length.toLong)
            case None => (null, 0L, 0L)
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoded :+ s :+ n)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Perceptual-fingerprint seam: decode each payload
    * ([[ImageCodec.decode]] — real codecs, corrupt-never-throw) and
    * append `thumb`, the hex md5 of the scale-invariant 8×8 mean-pooled
    * luma grid ([[ImageCodec.thumbprint8]]); undecodable payloads get
    * null. Map-only: payload bytes never leave the scan task — only the
    * 32-char fingerprint shuffles into the downstream dup-group
    * aggregate, which is what lets perceptual dedup run over a 100 TB
    * image corpus at the cost of a string groupBy. */
  def thumbprintPartitions(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("thumb", org.apache.spark.sql.types.StringType)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def safeThumb(p: Array[Byte]): String =
        (try ImageCodec.decode(p)
         catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some(img) =>
            md.reset()
            md.digest(ImageCodec.thumbprint8(img))
              .map(b => f"${b & 0xff}%02x").mkString
          case None => null
        }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val thumb = if (payload == null) null else safeThumb(payload)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ thumb)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** PCM payload-extraction seam: append the raw PCM slice of each WAV
    * payload (`pcm` binary) plus sample-level statistics the byte
    * histogram cannot see — `n_samples` (per channel-interleaved sample)
    * and `n_clipped` (full-scale rail hits: unsigned 0/255 at 8-bit,
    * signed ±2^(w·8−1) wider). Not-a-WAV payloads yield all-null fields,
    * never a task failure ([[AudioCodec]] contract). Downstream, `pcm`
    * feeds the codegen [[graft.functions.expressions.ByteHistogram]]
    * amplitude pass — the payload bytes stay inside the scan task. */
  def audioPcm(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("pcm", org.apache.spark.sql.types.BinaryType)
      .add("n_samples", org.apache.spark.sql.types.LongType)
      .add("n_clipped", org.apache.spark.sql.types.LongType)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val extracted =
          try {
            for {
              meta <- AudioCodec.decodeWav(payload)
              (off, len) <- AudioCodec.dataChunk(payload)
            } yield {
              val w = math.max(1, meta.bitsPerSample / 8)
              val clipped = AudioCodec.clippedSamples(payload, off, len, meta.bitsPerSample)
              (java.util.Arrays.copyOfRange(payload, off, off + len),
                (len / w).toLong, clipped)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        val tail = extracted match {
          case Some((pcm, n, c)) => Seq(pcm, n, c)
          case None => Seq(null, null, null)
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ tail)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-asset silence statistics over 8-bit PCM bytes (`pcm` column):
    * samples in the amplitude window [120, 136] (±8 around the 128
    * midpoint, where 8-bit WAV is unsigned) count as silent; emits
    * total samples, silent count and the longest silent RUN — the
    * trim/VAD-style diagnostic for a speech corpus. One in-order pass
    * per row inside the shared per-partition seam; a null pcm yields
    * zeros (corrupt-never-throw), never a task failure. */
  def silenceStats(df: DataFrame): DataFrame = {
    val outSchema = df.schema
      .add("n_samples", LongType)
      .add("n_silent", LongType)
      .add("longest_run", LongType)
    val pcmIdx = df.schema.fieldIndex("pcm")
    df.mapPartitions { rows =>
      rows.map { r =>
        val pcm = r.getAs[Array[Byte]](pcmIdx)
        var n = 0L; var silent = 0L; var run = 0L; var best = 0L
        if (pcm != null) {
          var i = 0
          while (i < pcm.length) {
            val v = pcm(i) & 0xff
            n += 1
            if (v >= 120 && v <= 136) {
              silent += 1; run += 1
              if (run > best) best = run
            } else run = 0L
            i += 1
          }
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(n, silent, best))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Audio counterpart of [[decodePartitions]]: parse RIFF/WAVE headers
    * per partition ([[AudioCodec]]) into an appended nullable `audio`
    * struct; payloads that aren't valid WAV keep `audio = null`.
    * Compressed codecs plug into the same seam at deployment. */
  def decodeAudioPartitions(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("audio", audioSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      def safeDecode(p: Array[Byte]): Option[AudioCodec.WavMeta] =
        try AudioCodec.decodeWav(p)
        catch { case scala.util.control.NonFatal(_) => None }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val decoded = safeDecode(payload) match {
          case Some(m) => org.apache.spark.sql.Row(
            m.sampleRate, m.channels, m.bitsPerSample, m.nFrames, m.durationMs)
          case None => null
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoded)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Nullable video-decode struct appended by [[decodeVideoPartitions]].
    * The last four fields are the stream statistics aggregated from the
    * tracks' `stbl` sample tables (zeros for metadata-only containers). */
  val videoSchema: StructType = StructType(Seq(
    StructField("timescale", LongType),
    StructField("duration_ticks", LongType),
    StructField("n_tracks", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_samples", LongType),
    StructField("sample_bytes", LongType),
    StructField("max_sample_size", LongType),
    StructField("media_ticks", LongType)))

  /** Video counterpart of [[decodePartitions]]: parse ISO-BMFF (MP4)
    * container metadata per partition ([[VideoCodec]]) into an appended
    * nullable `video` struct; payloads that aren't well-formed MP4 keep
    * `video = null`. Frame-level codecs plug into the same seam. */
  def decodeVideoPartitions(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("video", videoSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      def safeDecode(p: Array[Byte]): Option[VideoCodec.Mp4Meta] =
        try VideoCodec.decodeMp4(p)
        catch { case scala.util.control.NonFatal(_) => None }
      rows.map { r =>
        val decoded = safeDecode(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some(m) => org.apache.spark.sql.Row(
            m.timescale, m.durationTicks, m.nTracks, m.width, m.height, m.durationMs,
            m.nSamples, m.sampleBytes, m.maxSampleSize, m.mediaTicks)
          case None => null
        }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ decoded)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Synthesis side of the video round-trip (see [[synthesizeWavPayload]]):
    * append a deterministic MP4 `payload` built per row from integer
    * geometry columns (`timescale`, `duration_ticks`, `n_tracks`,
    * `width`, `height`). */
  def synthesizeMp4Payload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val ts = df.schema.fieldIndex("timescale")
    val du = df.schema.fieldIndex("duration_ticks")
    val nt = df.schema.fieldIndex("n_tracks")
    val w = df.schema.fieldIndex("width")
    val h = df.schema.fieldIndex("height")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = VideoCodec.encodeMp4(
          r.getInt(ts), r.getInt(du), r.getInt(nt), r.getInt(w), r.getInt(h))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[synthesizeMp4Payload]] plus a real sample table: three extra
    * geometry columns (`n_samples`, `size_base`, `tick_delta`) drive the
    * first track's stsz/stts chain (see [[VideoCodec.encodeMp4]]'s
    * `samples` parameter). */
  def synthesizeMp4SamplesPayload(df: DataFrame): DataFrame = {
    val outSchema = df.schema.add("payload", org.apache.spark.sql.types.BinaryType)
    val ts = df.schema.fieldIndex("timescale")
    val du = df.schema.fieldIndex("duration_ticks")
    val nt = df.schema.fieldIndex("n_tracks")
    val w = df.schema.fieldIndex("width")
    val h = df.schema.fieldIndex("height")
    val ns = df.schema.fieldIndex("n_samples")
    val sb = df.schema.fieldIndex("size_base")
    val td = df.schema.fieldIndex("tick_delta")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = VideoCodec.encodeMp4(
          r.getInt(ts), r.getInt(du), r.getInt(nt), r.getInt(w), r.getInt(h),
          samples = Some((r.getInt(ns), r.getInt(sb), r.getInt(td))))
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ payload)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Per-sample rows of each asset's FIRST video track, from the REAL
    * container walk ([[VideoCodec.decodeMp4SampleTable]]): one output row
    * per sample with its size, cumulative byte offset, start tick and
    * duration, plus the movie timescale — the relation every
    * frame-addressed operator (keyframe pick, uniform-time sampling,
    * segment slicing) joins against. Map-only fan-out, no shuffle;
    * payloads that don't decode (corrupt, no sample table) contribute NO
    * rows — the curation-drop convention, asserted in spec. Expects
    * (asset_id, payload). */
  def videoSampleRows(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", df.schema("asset_id").dataType, nullable = false),
      StructField("timescale", LongType, nullable = false),
      StructField("sample_idx", IntegerType, nullable = false),
      StructField("sample_size", LongType, nullable = false),
      StructField("byte_offset", LongType, nullable = false),
      StructField("start_tick", LongType, nullable = false),
      StructField("dur_ticks", LongType, nullable = false)))
    val aIdx = df.schema.fieldIndex("asset_id")
    val pIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val p = r.getAs[Array[Byte]](pIdx)
        val decoded =
          try for {
            meta <- VideoCodec.decodeMp4(p)
            tbl <- VideoCodec.decodeMp4SampleTable(p)
          } yield (meta.timescale, tbl)
          catch { case scala.util.control.NonFatal(_) => None }
        decoded.toSeq.flatMap { case (tsc, tbl) =>
          tbl.iterator.zipWithIndex.map { case ((sz, off, start, dur), i) =>
            org.apache.spark.sql.Row(r.get(aIdx), tsc, i, sz, off, start, dur)
          }
        }
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
