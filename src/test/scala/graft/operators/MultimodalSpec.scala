package graft.operators

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table has the canonical schema and real payload bytes") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.load(spark, TestSpark.sf0001, "documents"))
    assert(media.columns.toSeq === Seq("media_id", "media_type", "payload",
      "width", "height", "sample_rate"))
    val r = media.filter($"media_id" === 0L).head()
    assert(r.media_type === "image")
    assert(r.payload.length > 0)
  }

  test("feature extraction is partition-parallel, deterministic, fixed-width") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.load(spark, TestSpark.sf0001, "documents"))
    val f1 = Multimodal.extractFeatures(media.repartition(4))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7))
      .collect().map(f => f.media_id -> f).toMap
    assert(f1.keySet === f2.keySet)
    f1.foreach { case (id, f) =>
      assert(f.feat.length === Multimodal.FakeCodec.featureDim)
      assert(f.feat.toSeq === f2(id).feat.toSeq) // partitioning-independent
      assert(f.n_bytes > 0)
      assert(f.checksum.matches("[0-9a-f]{32}"))
    }
  }

  test("container audit: magic sniffing, mismatch, truncation and " +
      "empty classes — hand-built payloads") {
    def row(id: Long, mt: String, payload: Array[Byte]) =
      Multimodal.MediaRow(id, mt, payload, 0, 0, 0)
    val pad = Array.fill[Byte](20)(0x41)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++ pad
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++ pad
    val riff = "RIFF".getBytes("UTF-8") ++ pad
    val mp4 = Array[Byte](0, 0, 0, 0x20) ++ "ftyp".getBytes("UTF-8") ++ pad
    val media = Seq(
      row(1, "image", jpeg),                   // signed_ok
      row(2, "audio", png),                    // signed_mismatch
      row(3, "audio", riff),                   // signed_ok
      row(4, "video", mp4),                    // signed_ok
      row(5, "image", "plain text here".getBytes("UTF-8") ++ pad), // unsigned
      row(6, "image", jpeg.take(10)),          // truncated
      row(7, "video", Array.empty[Byte])       // empty
    ).toDS()
    val got = Multimodal.containerAudit(media)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("image", "signed_ok"))._1 === 1L)
    assert(got(("audio", "signed_mismatch"))._1 === 1L)
    assert(got(("audio", "signed_ok"))._1 === 1L)
    assert(got(("video", "signed_ok"))._1 === 1L)
    assert(got(("image", "unsigned"))._1 === 1L)
    assert(got(("image", "truncated")) === ((1L, 10L)))
    assert(got(("video", "empty")) === ((1L, 0L)))
    assert(got.values.map(_._1).sum === 7L, "statuses partition the media")
  }

  test("resize caps payload size and scales dimensions; small payloads untouched") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.load(spark, TestSpark.sf0001, "documents"))
    val resized = Multimodal.resizePayload(media, targetBytes = 100).collect()
    assert(resized.forall(_.payload.length <= 100))
    val origs = media.collect().map(r => r.media_id -> r).toMap
    resized.filter(r => origs(r.media_id).payload.length <= 100).foreach { r =>
      assert(r.payload.sameElements(origs(r.media_id).payload))
    }
  }

  test("frame sampling keeps every nth fixed-size frame") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.load(spark, TestSpark.sf0001, "documents"))
      .filter($"media_id" === 1L)
    val n = media.head().payload.length
    val frames = Multimodal.sampleFrames(media, frameSize = 32, everyNth = 2)
      .collect().sortBy(_.frame_idx)
    val totalFrames = (n + 31) / 32
    assert(frames.length === (totalFrames + 1) / 2)
    assert(frames.forall(_.frame_idx % 2 === 0))
    assert(frames.head.frame.length === 32)
  }

  test("metadata path agrees with typed feature path on bytes + checksum") {
    val media = Multimodal.mediaFromDocuments(spark,
      Tables.load(spark, TestSpark.sf0001, "documents"))
    val meta = Multimodal.metadata(media.toDF())
      .select("media_id", "n_bytes", "checksum")
      .as[(Long, Long, String)].collect()
      .map { case (k, b, c) => k -> ((b, c)) }.toMap
    val feats = Multimodal.extractFeatures(media).collect()
    feats.foreach { f =>
      assert(meta(f.media_id) === ((f.n_bytes, f.checksum)))
    }
  }

  test("perceptual hash groups identical payloads, stable under repartition") {
    import spark.implicits._
    val rows = Seq(
      // identical payloads -> identical phash
      Multimodal.MediaRow(1L, "image", "aaaa bbbb cccc".getBytes("UTF-8"), 64, 64, 0),
      Multimodal.MediaRow(2L, "image", "aaaa bbbb cccc".getBytes("UTF-8"), 64, 64, 0),
      // heavy-tail byte distribution -> different signature
      Multimodal.MediaRow(3L, "image",
        Array.tabulate[Byte](64)(i => if (i % 8 == 0) 0x7f else 0x01), 64, 64, 0)
    )
    val ds = spark.createDataset(rows)
    val h = Multimodal.perceptualHash(ds)
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
    // signature is a pure function of the payload: repartitioning is a no-op
    val h2 = Multimodal.perceptualHash(spark.createDataset(rows).repartition(3))
      .select("media_id", "phash").as[(Long, Long)].collect().toMap
    assert(h === h2)
    // 8-bit signature domain
    assert(h.values.forall(s => s >= 0 && s < 256))
  }

  test("frame energy: hand-computed frames, truncated tail, overlap") {
    import spark.implicits._
    // 6 bytes [1,2,3,4,5,6], window 4, stride 2 -> frames at 0 and 2:
    // f0 = 1+4+9+16 = 30, f1 = 9+16+25+36 = 86 (covers to the end)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", Array[Byte](1, 2, 3, 4, 5, 6), 0, 0, 16000)))
    val got = Multimodal.frameEnergy(ds, window = 4, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(f => (f.frame_idx, f.n_bytes, f.energy, f.peak)).toSeq ===
      Seq((0, 4, 30L, 4), (1, 4, 86L, 6)))
    // unsigned byte semantics: -1 is 255, energy 255^2
    val neg = spark.createDataset(Seq(
      Multimodal.MediaRow(2L, "audio", Array[Byte](-1), 0, 0, 0)))
    val g2 = Multimodal.frameEnergy(neg, 4, 2).collect()
    assert(g2.map(f => (f.n_bytes, f.energy, f.peak)).toSeq ===
      Seq((1, 65025L, 255)))
    // empty payload still yields its single empty frame
    val empty = spark.createDataset(Seq(
      Multimodal.MediaRow(3L, "audio", Array.empty[Byte], 0, 0, 0)))
    assert(Multimodal.frameEnergy(empty, 4, 2).collect()
      .map(f => (f.frame_idx, f.n_bytes, f.energy, f.peak)).toSeq ===
      Seq((0, 0, 0L, 0)))
    assertThrows[IllegalArgumentException] {
      Multimodal.frameEnergy(ds, window = 2, stride = 4)
    }
  }

  test("active segments: islands of loud frames, per-media, partition-invariant") {
    import spark.implicits._
    // window=stride=4 -> frame f covers bytes [4f, 4f+4): loud frames
    // (100^2*4 = 40000) at 0, 1, 3; quiet frame (4) at 2 -> segments
    // [0..1] and [3..3] at threshold 1000
    def bytes(pattern: String): Array[Byte] =
      pattern.flatMap(c => Seq.fill(4)(if (c == 'L') 100.toByte else 1.toByte)).toArray
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", bytes("LLqL"), 0, 0, 16000),
      Multimodal.MediaRow(2L, "audio", bytes("qqqq"), 0, 0, 16000), // all quiet
      Multimodal.MediaRow(3L, "audio", bytes("LLLL"), 0, 0, 16000)  // one run
    ))
    val segs = Multimodal.activeSegments(
        Multimodal.frameEnergy(ds, window = 4, stride = 4), minEnergy = 1000L)
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(s => (s._1, s._2))
    assert(segs.toSeq === Seq(
      (1L, 1, 0, 1, 2L), (1L, 2, 3, 3, 1L), (3L, 1, 0, 3, 4L)))
    // repartitioning never changes the segmentation
    val again = Multimodal.activeSegments(
        Multimodal.frameEnergy(ds.repartition(7), window = 4, stride = 4),
        minEnergy = 1000L)
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(s => (s._1, s._2))
    assert(again.toSeq === segs.toSeq)
  }

  test("patch grid: lossless cover, correct tiling, partition-invariant") {
    import spark.implicits._
    // width 4, tile 2: a 4x4-byte payload -> 2x2 full patches; a 10-byte
    // payload -> rows 0-2 (last row partial) -> patches (0,0)=4+2, (0,1)=4
    val p16 = Array.tabulate(16)(i => i.toByte)
    val p10 = Array.tabulate(10)(i => (i + 1).toByte)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", p16, 4, 4, 0),
      Multimodal.MediaRow(2L, "image", p10, 4, 3, 0)))
    val got = Multimodal.patchGrid(ds, tile = 2)
      .as[(Long, String, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._3, r._4) -> ((r._5, r._6))).toMap
    // media 1: patch (0,0) = bytes 0,1,4,5; (0,1) = 2,3,6,7;
    //          (1,0) = 8,9,12,13; (1,1) = 10,11,14,15
    assert(got((1L, 0, 0)) === ((4L, 10L)))
    assert(got((1L, 0, 1)) === ((4L, 18L)))
    assert(got((1L, 1, 0)) === ((4L, 42L)))
    assert(got((1L, 1, 1)) === ((4L, 50L)))
    // media 2: rows are (1,2,3,4),(5,6,7,8),(9,10): patch (0,0) gets
    // 1,2,5,6; (0,1) gets 3,4,7,8; (1,0) gets 9,10; (1,1) empty (absent)
    assert(got((2L, 0, 0)) === ((4L, 14L)))
    assert(got((2L, 0, 1)) === ((4L, 22L)))
    assert(got((2L, 1, 0)) === ((2L, 19L)))
    assert(!got.contains((2L, 1, 1)))
    // lossless cover: per-media patch byte counts sum to the payload size
    val sums = Multimodal.patchGrid(ds, tile = 2).groupBy("media_id")
      .agg(org.apache.spark.sql.functions.sum("n_bytes").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sums === Map(1L -> 16L, 2L -> 10L))
    // partitioning never changes the grid
    val again = Multimodal.patchGrid(ds.repartition(5), tile = 2)
      .as[(Long, String, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._3, r._4) -> ((r._5, r._6))).toMap
    assert(again === got)
  }

  test("loudness gain: exact integer division, limiting flags near-silence") {
    import spark.implicits._
    val frames = spark.createDataset(Seq(
      // media 1: energies 100 and 300 -> mean 200; gain to 1000 = 5x
      Multimodal.FrameEnergy(1L, 0, 4, 100L, 10),
      Multimodal.FrameEnergy(1L, 1, 4, 300L, 17),
      // media 2: energies 3 and 4 -> mean 3 (floor); gain floor(1000*1e6/3)
      Multimodal.FrameEnergy(2L, 0, 4, 3L, 2),
      Multimodal.FrameEnergy(2L, 1, 4, 4L, 2),
      // media 3: all-zero energy -> mean 0, clamps to div-by-1
      Multimodal.FrameEnergy(3L, 0, 4, 0L, 0)))
    val got = Multimodal
      .loudnessGain(frames, targetEnergy = 1000L, maxGainPpm = 6000000L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // (media_id, n_frames, energy_sum, mean_energy, gain_ppm, applied, limited)
    assert(got(1L) === ((1L, 2L, 400L, 200L, 5000000L, 5000000L, false)))
    assert(got(2L) === ((2L, 2L, 7L, 3L, 1000L * 1000000L / 3L, 6000000L, true)))
    assert(got(3L) === ((3L, 1L, 0L, 0L, 1000L * 1000000L, 6000000L, true)))
    // partition-invariance: pure integer aggregation
    val again = Multimodal
      .loudnessGain(frames.repartition(7), 1000L, 6000000L)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(again === got)
    assertThrows[IllegalArgumentException] {
      Multimodal.loudnessGain(frames, targetEnergy = 0L)
    }
  }

  test("phash banded near-dup finds exactly the <=maxHamming pairs, " +
      "including the pigeonhole boundary") {
    // 64-byte payloads -> lane j IS byte j; bytes of 100 in a sea of 1s
    // put exactly those lane bits above the mean, so sig bits are chosen
    // positions: d(A,B)=2, d(A,G)=d(B,G)=d(C,G)=7 (the boundary the
    // pigeonhole must still find with 8 bands), d(A,C)=d(B,C)=8 (out)
    def payload(set: Set[Int]): Array[Byte] =
      Array.tabulate[Byte](64)(i => if (set(i)) 100 else 1)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", payload(Set(0, 1, 2, 3)), 0, 0, 0),
      Multimodal.MediaRow(2L, "image", payload(Set(0, 1, 2, 4)), 0, 0, 0),
      Multimodal.MediaRow(3L, "image", payload(Set(10, 20, 30, 40)), 0, 0, 0),
      Multimodal.MediaRow(4L, "image", payload(Set(8, 16, 24)), 0, 0, 0)
    ).toDS()
    val r = Multimodal.phashNearDupPairs(media, bands = 8, maxHamming = 7)
      .as[(Long, Long, Int)].collect().toSet
    assert(r === Set((1L, 2L, 2), (1L, 4L, 7), (2L, 4L, 7), (3L, 4L, 7)))
  }
}
