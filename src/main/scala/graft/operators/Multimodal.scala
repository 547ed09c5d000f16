package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus the decode/feature-extract stage.
  *
  * The Spark-side contract is real and tested: schema, batch shape,
  * partition-parallel decode via `mapPartitions` over a typed Dataset (the
  * Scala analogue of `mapInPandas` batch UDFs). The *codec* itself is
  * STUBBED — this container has no image/audio libraries — behind
  * [[FakeCodec]], a deterministic stand-in that consumes the real bytes and
  * emits fixed-width features. Swapping in a real decoder changes only the
  * body of `FakeCodec.decode`.
  */
object Multimodal {

  /** Typed media row: payload + metadata, the canonical multimodal schema. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,  // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int,          // pixels / samples-per-frame; 0 when unknown
      height: Int,
      sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      feat: Array[Double]) // fixed-width feature vector from the decoder

  /** Deterministic decoder stand-in: real decode would go here (??? in a
    * production build). Features = byte-histogram moments over the payload —
    * deterministic, cheap, and exercises the full bytes of the column. */
  object FakeCodec {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Double] = {
      val f = new Array[Double](featureDim)
      var i = 0
      while (i < payload.length) {
        f(i % featureDim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      if (payload.length > 0) {
        var j = 0
        while (j < featureDim) { f(j) = f(j) / payload.length; j += 1 }
      }
      f
    }
  }

  /** Build a media table from the documents fixture (text bytes as payload)
    * — the plumbing test harness; production reads real binaries via
    * `spark.read.format("binaryFile")`. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        // deterministic fake modality assignment
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** Partition-parallel decode / feature extraction. Batched per partition
    * (the mapInPandas shape): the decoder is instantiated once per partition,
    * not per row — where a real codec would amortize native init. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would happen here
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          media_type = r.media_type,
          n_bytes = r.payload.length.toLong,
          checksum = java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).map("%02x".format(_)).mkString,
          feat = FakeCodec.decode(r.payload))
      }
    }
  }

  final case class MediaFrame(
      media_id: Long, media_type: String, frame_idx: Int, frame: Array[Byte])

  /** "Resize": deterministic stride down-sampling of the payload to at most
    * `targetBytes` — the stand-in for an image resize. The Spark shape is
    * the production one (typed map, payload-proportional work, metadata
    * updated); only the pixel math is fake. */
  def resizePayload(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.payload.length <= targetBytes) r
      else {
        val stride = math.ceil(r.payload.length.toDouble / targetBytes).toInt
        val out = Array.tabulate((r.payload.length + stride - 1) / stride)(
          i => r.payload(i * stride))
        r.copy(payload = out, width = math.max(1, r.width / stride),
          height = math.max(1, r.height / stride))
      }
    }
  }

  /** "Frame sampling": split the payload into fixed-size frames and keep
    * every `everyNth` one — the video-keyframe extraction shape (one input
    * row fans out to many frame rows; flatMap keeps it pipelined, no
    * driver involvement). */
  def sampleFrames(
      media: Dataset[MediaRow], frameSize: Int, everyNth: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % everyNth == 0 =>
          MediaFrame(r.media_id, r.media_type, idx, frame)
      }
    }
  }

  /** One patch of the 2-D tile grid over a media payload (ViT-style
    * patchification). Integer summary only — a production build would
    * carry the patch bytes/pixels instead. */
  final case class MediaPatch(
      media_id: Long, media_type: String, patch_row: Int, patch_col: Int,
      n_bytes: Long, byte_sum: Long)

  /** Patch-grid extraction — the image side of [[sampleFrames]]'s fan-out:
    * the payload is treated as a row-major `width`-column image and cut
    * into `tile` x `tile` patches (trailing partial patches keep their
    * true byte counts). One pass per payload in a typed flatMap — a row
    * fans out to its patches with no driver involvement and no shuffle;
    * downstream per-patch work (embedding, dedup) is then
    * embarrassingly parallel. Patch summaries are exact integers, so
    * results are bit-identical on any engine/partitioning. */
  def patchGrid(media: Dataset[MediaRow], tile: Int): Dataset[MediaPatch] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val width = math.max(1, r.width)
      // patch index -> (count, sum); LinkedHashMap keeps first-seen order
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[(Int, Int), (Long, Long)]
      var i = 0
      while (i < r.payload.length) {
        val key = ((i / width) / tile, (i % width) / tile)
        val (c, s0) = acc.getOrElse(key, (0L, 0L))
        acc.update(key, (c + 1, s0 + (r.payload(i) & 0xff)))
        i += 1
      }
      acc.iterator.map { case ((pr, pc), (c, s0)) =>
        MediaPatch(r.media_id, r.media_type, pr, pc, c, s0)
      }
    }
  }

  /** Perceptual hash for media near-dup detection: 8 integer byte-lane
    * sums (lane j = bytes at positions ≡ j mod 8), one bit per lane set
    * when the lane is above the payload average. INTEGER arithmetic
    * throughout — unlike the double-valued FakeCodec features, lane sums
    * are exact and order-independent, so the signature is bit-identical
    * on any engine/partitioning (the property a dedup key must have).
    *
    * Scale: one narrow typed map to an 8-bit signature; near-dup grouping
    * is then a plain hash aggregation on (phash) — no pairwise comparison
    * of payloads, ever. A production build swaps the lane sums for a real
    * pHash/aHash over decoded pixels; the pipeline shape is identical. */
  def perceptualHash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val lanes = new Array[Long](8)
      var i = 0
      while (i < r.payload.length) { lanes(i % 8) += (r.payload(i) & 0xff); i += 1 }
      val total = lanes.sum
      var sig = 0L
      var j = 0
      while (j < 8) { if (lanes(j) * 8L > total) sig |= (1L << j); j += 1 }
      (r.media_id, r.media_type, sig)
    }.toDF("media_id", "media_type", "phash")
  }

  /** 64-bit widening of [[perceptualHash]] (lane j = bytes at positions
    * ≡ j mod 64, bit set when the lane beats the payload average) — wide
    * enough for BANDED Hamming near-dup search: with 8 bands of 8 bits,
    * any pair within Hamming 7 shares a band (pigeonhole), so candidate
    * generation stays a band equi-join. Same integer-exact,
    * partitioning-invariant arithmetic as the 8-bit form. */
  def perceptualHash64(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.map { r =>
      val lanes = new Array[Long](64)
      var i = 0
      while (i < r.payload.length) { lanes(i % 64) += (r.payload(i) & 0xff); i += 1 }
      val total = lanes.sum
      var sig = 0L
      var j = 0
      while (j < 64) { if (lanes(j) * 64L > total) sig |= (1L << j); j += 1 }
      (r.media_id, r.media_type, sig)
    }.toDF("media_id", "media_type", "phash64")
  }

  /** Near-duplicate media pairs: the standard image-dedup recipe
    * (perceptual hash + Hamming radius), run at scale through the
    * generic pigeonhole band join — no pairwise payload comparison,
    * candidates only where a band agrees exactly, popcount verify
    * map-side. Output: (media_a, media_b, hamming). */
  def phashNearDupPairs(media: Dataset[MediaRow], bands: Int,
      maxHamming: Int): DataFrame =
    Dedup.bandedHammingPairs(perceptualHash64(media), "media_id",
      "phash64", bits = 64, bands = bands, maxHamming = maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Pure-SQL metadata path (oracle-checkable): byte length + md5 checksum
    * of the payload, no decode. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"))

  final case class FrameEnergy(
      media_id: Long, frame_idx: Int, n_bytes: Int, energy: Long, peak: Int)

  /** Audio-style windowed energy features: overlapping payload frames
    * (`window` bytes, hop `stride`), per-frame energy = sum of squared
    * unsigned bytes, peak = max byte — the RMS/onset-detection shape over
    * a PCM decode, computed here over raw payload bytes (FakeCodec-level
    * stand-in; a real decoder slots in front without changing the shape).
    * INTEGER arithmetic throughout — exact on any engine/partitioning.
    * One narrow flatMap; frames per row = ceil((n - window)/stride) + 1,
    * every byte covered, the final frame truncated. */
  def frameEnergy(
      media: Dataset[MediaRow], window: Int, stride: Int): Dataset[FrameEnergy] = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.payload.length
      val frames = math.max((n - window + stride - 1) / stride + 1, 1)
      (0 until frames).map { f =>
        val start = f * stride
        val end = math.min(start + window, n)
        var e = 0L; var p = 0; var i = start
        while (i < end) {
          val b = r.payload(i) & 0xff
          e += b.toLong * b
          if (b > p) p = b
          i += 1
        }
        FrameEnergy(r.media_id, f, end - start, e, p)
      }
    }
  }

  /** Loudness-normalization gain: the per-clip amplification factor that
    * brings mean frame energy to `targetEnergy` — the level-matching pass
    * an audio pipeline runs before mixing clips into training batches
    * (the ReplayGain/EBU-R128 shape over the FakeCodec energy stand-in).
    * Gains are parts-per-million BIGINTs from pure integer floor
    * division, so the report is exact on any engine/partitioning; clips
    * needing more than `maxGainPpm` (near-silence) are limited and
    * flagged rather than blown up.
    *
    * Scale shape: one media_id hash aggregation over the (narrow) frame
    * feature stream — no payload bytes reach the shuffle.
    */
  def loudnessGain(frames: Dataset[FrameEnergy], targetEnergy: Long,
      maxGainPpm: Long = 4000000L): DataFrame = {
    require(targetEnergy > 0 && maxGainPpm > 0,
      "targetEnergy and maxGainPpm must be positive")
    frames.toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("energy")).as("energy_sum"))
      .withColumn("mean_energy", expr("energy_sum div n_frames"))
      .withColumn("gain_ppm", expr(
        s"cast($targetEnergy as bigint) * cast(1000000 as bigint) " +
          "div greatest(mean_energy, cast(1 as bigint))"))
      .withColumn("applied_ppm", least(col("gain_ppm"), lit(maxGainPpm)))
      .withColumn("limited", col("gain_ppm") > lit(maxGainPpm))
  }

  /** VAD-style activity segmentation: maximal runs of consecutive frames
    * with energy >= `minEnergy` — the silence-trim / speech-split pass an
    * audio pipeline runs before transcription or training-clip extraction.
    *
    * Gaps-and-islands on the frame index (frame_idx minus its per-media
    * row_number is constant within a run): one window + one aggregation,
    * both partitioned by media_id — integer-exact on any partitioning, and
    * the only shuffle key is the media id. Output: (media_id, seg_idx,
    * start_frame, end_frame, n_frames), seg_idx 1-based in time order.
    */
  /** Shot-boundary detection (video cut detection, the energy-delta
    * heuristic): a CUT is any frame whose energy jumps by >= `minDelta`
    * from its predecessor; shots are the runs between cuts. The frame
    * sequence never materializes per-shot — shot_idx is a running count
    * of cuts (1 + cuts so far), so the whole pass is two windows and one
    * aggregation riding a single media_id shuffle, integer-exact on any
    * partitioning. Real decoders swap the energy column for a histogram
    * distance; the plan shape is identical.
    */
  def shotBoundaries(
      frames: Dataset[FrameEnergy], minDelta: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames.toDF()
      .withColumn("prev_e", lag(col("energy"), 1).over(w))
      .withColumn("cut", when(col("prev_e").isNotNull &&
        abs(col("energy") - col("prev_e")) >= minDelta, 1L).otherwise(0L))
      .withColumn("shot_idx", sum(col("cut")).over(w) + 1)
      .groupBy(col("media_id"), col("shot_idx"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("sum_energy"))
      .select(col("media_id"), col("shot_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("sum_energy"))
  }

  def activeSegments(
      frames: Dataset[FrameEnergy], minEnergy: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    frames.toDF()
      .filter(col("energy") >= minEnergy)
      .withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_frames"))
      .withColumn("seg_idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("media_id").orderBy("start_frame")))
      .select(col("media_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"))
  }

  /** Container-integrity audit — the cheap pre-decode screen a media
    * ingest runs BEFORE spending codec time: sniff the actual container
    * from its magic bytes (JPEG `FF D8 FF` / PNG `89 50 4E 47` -> image,
    * RIFF -> audio, ISO-BMFF `ftyp` at offset 4 -> video; all public
    * file signatures) and reconcile it with the DECLARED media_type.
    * Truncated and empty payloads are flagged before any signature
    * check — a 10-byte "JPEG" is a truncation, not a valid image.
    *
    * Statuses: `empty` (0 bytes), `truncated` (< 16 bytes — below any
    * real container header), `signed_ok` (sniffed == declared),
    * `signed_mismatch` (recognized container of the WRONG modality —
    * the mislabeled-asset detector), `unsigned` (no known signature).
    *
    * Pure binary-prefix arithmetic on the payload column — no decode,
    * no UDF; one narrow scan collapsing to a (media_type x status)
    * hash aggregate. Output: (media_type, status, n_media,
    * total_bytes). */
  def containerAudit(media: Dataset[MediaRow]): DataFrame = {
    val h = upper(hex(col("payload")))
    val sniffed = when(h.startsWith("FFD8FF"), "image")
      .when(h.startsWith("89504E47"), "image")
      .when(h.startsWith("52494646"), "audio")
      .when(substring(h, 9, 8) === "66747970", "video")
      .otherwise("unknown")
    media.toDF()
      .select(col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"),
        sniffed.as("sniffed"))
      .withColumn("status",
        when(col("n_bytes") === 0, "empty")
          .when(col("n_bytes") < 16, "truncated")
          .when(col("sniffed") === col("media_type"), "signed_ok")
          .when(col("sniffed") =!= "unknown", "signed_mismatch")
          .otherwise("unsigned"))
      .groupBy("media_type", "status")
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"))
  }
}
