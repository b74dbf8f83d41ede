package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * The DECODERS ARE DETERMINISTIC FAKES — this container has no image/audio
  * codecs, so `decodeStub` derives pseudo pixel/sample data from the bytes
  * (clearly marked below). Everything around them — the schema, the
  * per-partition batch processing shape, partitioning behavior, and the
  * typed metadata contract — is real Spark and is what matters at 100 TB:
  *
  *  - media rows are processed with `mapPartitions` over a typed Dataset:
  *    one iterator pass per partition, no driver collect, the Scala analogue
  *    of `mapInPandas` batch UDFs (swap the stub for a JNI/library call and
  *    the plan shape is unchanged);
  *  - binary payloads stay opaque to the optimizer; metadata lives in a
  *    separate struct column so filters on (kind, width, duration…) prune
  *    and push down WITHOUT touching the bytes — at rest, parquet stores
  *    the binary column in its own chunk, so metadata-only queries never
  *    read pixel bytes;
  *  - feature extraction emits fixed-width `Array[Float]` embeddings that
  *    feed [[Similarity]] directly.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  final case class MediaMeta(
      format: String,
      width: Int,
      height: Int,
      sampleRate: Int,
      nFrames: Int)

  /** One media row: id + kind discriminator + opaque bytes + typed meta. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      meta: MediaMeta)

  /** Decoded-image features (per image). */
  final case class ImageFeatures(
      media_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      mean_intensity: Double,
      embedding: Array[Float])

  /** Sampled video frame reference. */
  final case class FrameSample(
      media_id: Long,
      frame_index: Int,
      frame_bytes: Array[Byte])

  /** Build a deterministic media table from the documents testdata: each
    * doc's UTF-8 bytes stand in for an encoded payload. Kind/meta derive
    * from doc_id so the table exercises all three modalities. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = kind match {
          case "image" => MediaMeta("png", 64 + (id % 8).toInt * 16, 64, 0, 1)
          case "audio" => MediaMeta("wav", 0, 0, 16000, 0)
          case _       => MediaMeta("mp4", 128, 128, 0, 8 + (id % 8).toInt)
        }
        MediaRow(id, kind, bytes, meta)
    }
  }

  // ───────────────────────────────────────────────────────────────────────
  // STUB DECODER — deterministic fake. A real deployment replaces ONLY the
  // body of this function (e.g. with javax.imageio / ffmpeg JNI); callers
  // and plan shape stay identical.
  // ───────────────────────────────────────────────────────────────────────
  private[graft] def decodeStub(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    // pseudo "pixels": cycle the payload bytes to w*h unsigned intensities
    val n = math.max(1, w * h)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
      i += 1
    }
    out
  }

  /** Decode images and extract fixed-width features, one partition-batch at
    * a time (`mapPartitions` — the Scala analogue of a batched pandas UDF:
    * per-partition setup cost is paid once, rows stream through). */
  def decodeImages(media: Dataset[MediaRow], embeddingDim: Int = 16): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      // per-partition decoder init would happen HERE (library handle, JNI…)
      rows.map { r =>
        val px = decodeStub(r.bytes, r.meta.width, r.meta.height)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); i += 1 }
        // pseudo-embedding: mean intensity per horizontal band
        val emb = new Array[Float](embeddingDim)
        val band = math.max(1, px.length / embeddingDim)
        var b = 0
        while (b < embeddingDim) {
          var s = 0L; var j = b * band; val end = math.min(px.length, (b + 1) * band)
          while (j < end) { s += px(j); j += 1 }
          emb(b) = if (end > j - band) s.toFloat / band else 0f
          b += 1
        }
        ImageFeatures(r.media_id, r.bytes.length.toLong, r.meta.width,
          r.meta.height, sum.toDouble / px.length, emb)
      }
    }
  }

  /** Perceptual average-hash per image: sample 64 pixels at stride `width`
    * from the decoded stream, set bit i when sample i is brighter than the
    * image mean — the classic aHash, in pure integer math (the comparison
    * is `px · n > sum`, no division, so any engine reproduces it exactly).
    * 8 bytes per image regardless of resolution: the shuffle-able content
    * fingerprint for image-level near-dup detection. */
  /** The aHash kernel both spellings share — the typed `mapPartitions`
    * path and the codegen'd [[graft.functions.ImageAhash]] expression call
    * THIS function, so their bits cannot diverge. */
  private[graft] def ahashKernel(bytes: Array[Byte], w: Int, h: Int): Long = {
    val px = decodeStub(bytes, w, h)
    var sum = 0L
    var i = 0
    while (i < px.length) { sum += px(i); i += 1 }
    val stride = math.max(1, px.length / 64)
    var ahash = 0L
    var b = 0
    while (b < 64) {
      val p = px((b * stride) % px.length)
      if (p.toLong * px.length > sum) ahash |= (1L << b)
      b += 1
    }
    ahash
  }

  /** The median-hash kernel — see [[ahashKernel]] for why it is shared. */
  private[graft] def mhashKernel(bytes: Array[Byte], w: Int, h: Int): Long = {
    val px = decodeStub(bytes, w, h)
    val stride = math.max(1, px.length / 64)
    val samples = Array.tabulate(64)(b => px((b * stride) % px.length))
    val med = samples.sorted.apply(31)
    var hash = 0L
    var b = 0
    while (b < 64) { if (samples(b) > med) hash |= (1L << b); b += 1 }
    hash
  }

  def imageAhash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map(r => (r.media_id, ahashKernel(r.bytes, r.meta.width, r.meta.height)))
    }.toDF("media_id", "ahash")
  }

  /** Perceptual median-hash per image: the same stride-64 sample grid as
    * [[imageAhash]], thresholded against the samples' lower MEDIAN instead
    * of the image mean — robust where a few very bright pixels shift the
    * mean and flip half the aHash bits (the standard mean-vs-median hash
    * trade-off). Pure integer math: sort 64 ints, compare — any engine
    * reproduces every bit. */
  def imageMhash(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map(r => (r.media_id, mhashKernel(r.bytes, r.meta.width, r.meta.height)))
    }.toDF("media_id", "mhash")
  }

  /** Image near-duplicate pairs: average-hashes within `maxHamming` bits,
    * found with [[Dedup.hammingPairs]]' pigeonhole blocking — the same
    * provably-complete equi-join used for text SimHash, now over visual
    * content fingerprints. The dedup shuffle carries (id, 8-byte hash)
    * only; pixels never leave the decode stage. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs(imageAhash(media), "media_id", "ahash", maxHamming)

  /** "Resize": recompute metadata + re-derive payload for the target size.
    * Metadata math is real; pixel resampling is the stub. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else r.copy(
        bytes = decodeStub(r.bytes, targetW, targetH).map(_.toByte),
        meta = r.meta.copy(width = targetW, height = targetH))
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index, with the
    * frame payload sliced deterministically from the byte stream. One input
    * row → n output rows (flatMap — Spark's Generator shape). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frames = math.max(1, r.meta.nFrames)
      val chunk = math.max(1, r.bytes.length / frames)
      (0 until frames by stride).map { f =>
        val start = f * chunk
        val end = math.min(r.bytes.length, start + chunk)
        FrameSample(r.media_id, f,
          if (start < r.bytes.length) r.bytes.slice(start, end) else Array.emptyByteArray)
      }
    }
  }

  /** Video near-duplicate pairs: two videos match when they share at
    * least `minSharedFrames` identical sampled frames (by content
    * fingerprint). Frames are fingerprinted (md5 — 16 bytes travel, never
    * the frame payload), deduped per video, and candidate pairs come from
    * an equi-join on the fingerprint — the shape that stays an equi-join
    * at 100 TB instead of a frame-by-frame cross comparison. Completes
    * the modality set on shared infrastructure: text (SimHash), image
    * (aHash), audio (energy hash), video (frame-set overlap). */
  def videoNearDups(
      media: Dataset[MediaRow],
      stride: Int = 2,
      minSharedFrames: Int = 2): DataFrame = {
    val fp = sampleFrames(media, stride).toDF()
      .filter(length(col("frame_bytes")) > 0)
      .select(col("media_id"), md5(col("frame_bytes")).alias("ffp"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fp.alias("a").join(fp.alias("b"),
        col("a.ffp") === col("b.ffp") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").alias("id_a"), col("b.media_id").alias("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).alias("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** Per-frame audio energy. */
  final case class AudioFrame(
      media_id: Long, frame_index: Long, n_samples: Long, energy: Long)

  /** Windowed audio feature extraction: interpret the payload as unsigned
    * 8-bit PCM, split into `frameSize`-sample frames, and emit per-frame
    * energy (sum of squared centered samples — pure integer math, so the
    * whole feature pipeline is oracle-checkable). One input row → n frame
    * rows (flatMap/Generator shape, like [[sampleFrames]]); a real codec
    * would replace only the byte interpretation. */
  def audioEnergy(media: Dataset[MediaRow], frameSize: Int = 256): Dataset[AudioFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").flatMap { r =>
      val n = r.bytes.length
      val frames = (n + frameSize - 1) / frameSize
      (0 until frames).map { f =>
        val start = f * frameSize
        val end = math.min(n, start + frameSize)
        var e = 0L
        var i = start
        while (i < end) {
          val s = (r.bytes(i) & 0xff) - 128
          e += s.toLong * s
          i += 1
        }
        AudioFrame(r.media_id, f.toLong, (end - start).toLong, e)
      }
    }
  }

  /** Audio content fingerprint: 64-bit energy-delta hash — bit i is set
    * when frame (i+1)'s energy exceeds frame i's (frame indices cycled
    * over the clip). The energy-contour shape is what survives volume and
    * codec changes, which is why delta-sign fingerprints are the classic
    * audio-dedup primitive. Pure integer math over [[audioEnergy]]'s
    * frames — engine-reproducible, 8 bytes per clip. */
  def audioFingerprint(media: Dataset[MediaRow], frameSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { r =>
      val n = r.bytes.length
      // clips shorter than ~8 frames would fingerprint degenerately (a
      // single-frame clip hashes to 0 and pairs with every other short
      // clip at hamming 0): shrink the frame so every clip of ≥8 samples
      // contributes at least 8 energy deltas
      val eff = math.max(1, math.min(frameSize, n / 8))
      val frames = math.max(1, (n + eff - 1) / eff)
      val e = new Array[Long](frames)
      var f = 0
      while (f < frames) {
        val start = f * eff
        val end = math.min(n, start + eff)
        var acc = 0L
        var i = start
        while (i < end) {
          val s = (r.bytes(i) & 0xff) - 128
          acc += s.toLong * s
          i += 1
        }
        e(f) = acc
        f += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (e((b + 1) % frames) > e(b % frames)) h |= (1L << b)
        b += 1
      }
      (r.media_id, h)
    }.toDF("media_id", "afp")
  }

  /** Audio near-duplicate pairs: energy-delta fingerprints within
    * `maxHamming` bits via [[Dedup.hammingPairs]] — the third modality on
    * the shared pigeonhole-blocking path (text SimHash, image aHash,
    * audio energy hash). */
  def audioNearDups(
      media: Dataset[MediaRow],
      maxHamming: Int = 3,
      frameSize: Int = 256): DataFrame =
    Dedup.hammingPairs(audioFingerprint(media, frameSize), "media_id", "afp", maxHamming)

  /** Metadata-only summary: never touches the binary column — check the
    * plan's ReadSchema when this runs over a parquet media table. */
  def metaSummary(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy(col("kind"), col("meta.format").alias("format"))
      .agg(
        count(lit(1)).alias("n_media"),
        max(col("meta.width")).cast("long").alias("max_width"),
        max(col("meta.nFrames")).cast("long").alias("max_frames"))
      .orderBy("kind", "format")

  /** Byte-level stats per media row — oracle-friendly (pure integer math
    * over the payload, reproducible in any engine). */
  def byteStats(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.bytes.length) { sum += r.bytes(i) & 0xff; i += 1 }
      (r.media_id, r.kind, r.bytes.length.toLong, sum)
    }.toDF("media_id", "kind", "n_bytes", "byte_sum")
      .orderBy("media_id")
  }

  /** Cross-modal retrieval: for each image, the top-k text documents by
    * cosine between the image's decode-stub embedding and the text's
    * hashing-trick embedding in a SHARED `dim`-dimensional space — the
    * CLIP-retrieval plumbing with stub encoders on both towers (swap the
    * stub embedding functions for model embeddings; the plan is the
    * product).
    *
    * Scale shape = [[Similarity.bruteForceTopK]]: the image (query) tower
    * broadcasts, the text corpus is scanned once and never shuffled, and
    * the per-image rank prunes per-partition (WindowGroupLimit). Zero-norm
    * text vectors are filtered on BOTH sides of the oracle — cosine with a
    * zero vector is 0/0, and NaN ordering diverges between engines. */
  def crossModalTopK(
      docs: DataFrame,
      k: Int,
      dim: Int = 16,
      tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        graft.ops.Dedup.xxHash): DataFrame = {
    import graft.functions.VectorFunctions
    val imgs = decodeImages(mediaFromDocuments(docs), embeddingDim = dim)
      .toDF()
      .select(col("media_id"), col("embedding").alias("ivec"))
    val texts = TextAnalysis
      .hashEmbeddings(docs, "doc_id", "text", dim, tokenHash)
      .select(col("doc_id"), col("embedding").alias("tvec"))
      .filter(VectorFunctions.dot(col("tvec"), col("tvec")) > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    texts.crossJoin(broadcast(imgs))
      .select(col("media_id"), col("doc_id"),
        VectorFunctions.cosine(col("ivec"), col("tvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("media_id"), col("rank").cast("long").alias("rank"),
        col("doc_id"), col("score"))
  }
}
