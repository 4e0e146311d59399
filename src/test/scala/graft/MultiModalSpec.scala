package graft

import graft.queries.MultiModal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the multimodal plumbing: schema, batch shape, determinism, and
  * the metadata-only stages (the decode step itself is a declared stub). */
class MultiModalSpec extends AnyFunSuite {
  import TestSpark._

  test("corpus has the declared binary + typed-metadata schema") {
    val df = MultiModal.corpus(spark, sf).toDF()
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("content") == "binary")
    assert(types("modality") == "string")
    assert(types("meta").startsWith("struct<width:int,height:int"))
    assert(df.count() == 500)
    // metadata filter must not require payload bytes (stays a column op)
    assert(MultiModal.corpus(spark, sf).toDF()
      .filter(col("meta.sample_rate") === 16000).count() > 0)
  }

  test("q_frame_dedup groups planted shared frames by decoded pixels, not bytes") {
    import spark.implicits._
    // two videos SHARING one frame (the planted duplicate), one distinct
    // frame each; a third video entirely distinct
    val shared = MultiModal.pngBytes(8, 6, "shared-frame".getBytes("UTF-8"))
    val a = MultiModal.pngBytes(8, 6, "only-a".getBytes("UTF-8"))
    val b = MultiModal.pngBytes(8, 6, "only-b".getBytes("UTF-8"))
    val c = MultiModal.pngBytes(8, 6, "only-c".getBytes("UTF-8"))
    def rec(id: Long, frames: Seq[Array[Byte]]) =
      MultiModal.MMRecord(id, "video", MultiModal.mpngOf(frames),
        MultiModal.MMeta(8, 6, 0, frames.length))
    val corpus = spark.createDataset(Seq(
      rec(2, Seq(shared, a)), rec(5, Seq(b, shared)), rec(8, Seq(c))))
    val rows = MultiModal.frameDedup(corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 5)
    val byCopies = rows.groupBy(_._4)
    // exactly the two planted copies group; all other frames are unique
    assert(byCopies(2L).map(t => (t._1, t._2)).toSet == Set((2L, 0), (5L, 1)),
      s"expected the shared frame at (2,0) and (5,1): $rows")
    assert(byCopies(1L).length == 3)
    // canonical = first (id, frame_idx) of the duplicate group
    assert(rows.filter(t => t._4 == 2L && t._5).map(t => (t._1, t._2)).toSeq
      == Seq((2L, 0)))
    // pixel identity: same decoded pixels => same hash even though the
    // two container entries could differ byte-wise after re-encode
    assert(MultiModal.frameHash(shared) ==
      MultiModal.frameHash(MultiModal.resizePng(shared, 8, 6)))
    // fixture corpus: runs end-to-end, all frames distinct
    val fixture = SparkEntry.queries("q_frame_dedup")(spark, sf)
    assert(fixture.filter(col("n_copies") > 1).count() == 0)
    assert(fixture.count() > 0)
  }

  test("q_image_phash pairs a perturbed copy, isolates distinct images") {
    import spark.implicits._
    val base = MultiModal.pngBytes(64, 48, "phash-base".getBytes("UTF-8"))
    // perturb ONE pixel channel slightly and re-encode: byte-distinct,
    // pixel-distinct, perceptually identical
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(base))
    img.setRGB(10, 10, img.getRGB(10, 10) ^ 0x04)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val perturbed = bos.toByteArray
    val other = MultiModal.pngBytes(64, 48, "phash-other".getBytes("UTF-8"))
    // sanity at the hash level: exact dedup would SPLIT this pair...
    assert(MultiModal.frameHash(base) != MultiModal.frameHash(perturbed))
    // ...pHash keeps it within the banding guarantee and far from noise
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(MultiModal.pHash(base), MultiModal.pHash(perturbed)) <= 3,
      "one-pixel perturbation must stay inside the Hamming<=3 contract")
    assert(ham(MultiModal.pHash(base), MultiModal.pHash(other)) > 10,
      "unrelated noise images must sit far apart")
    // a lossless re-encode hashes IDENTICALLY (decode-side identity)
    assert(MultiModal.pHash(base) ==
      MultiModal.pHash(MultiModal.resizePng(base, 64, 48)))
    // end-to-end through the distributed pipeline
    def rec(id: Long, png: Array[Byte]) =
      MultiModal.MMRecord(id, "image", png, MultiModal.MMeta(64, 48, 0, 1))
    val corpus = spark.createDataset(Seq(
      rec(3, base), rec(6, perturbed), rec(9, other)))
    val rows = MultiModal.imageNearDup(corpus).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(4))).toSeq
    assert(rows == Seq((3L, 6L, true), (6L, 3L, true), (9L, -1L, false)),
      s"planted pair must link both ways, noise must stay single: $rows")
    // fixture corpus: runs end-to-end, one row per image
    val fixture = SparkEntry.queries("q_image_phash")(spark, sf)
    val nImages = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0).count()
    assert(fixture.count() == nImages)
  }

  test("q_audio_phash pairs a gain-scaled copy the exact fingerprints split") {
    import spark.implicits._
    val seed = ("the quick brown fox jumps over the lazy dog " * 3)
      .getBytes("UTF-8")
    val base = MultiModal.wavBytes(16000, 1600, seed)
    // decode, scale amplitude to 90%, re-encode: a gain-ripped copy —
    // every decoded sample changes, the energy-delta signature holds
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(base))
    val fmtIn = in.getFormat
    val raw = in.readAllBytes()
    var i = 0
    while (i < raw.length / 2) {
      val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
      val sc = (s * 9 / 10).toShort
      raw(2 * i) = (sc & 0xff).toByte
      raw(2 * i + 1) = ((sc >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmtIn, 1600L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val scaled = bos.toByteArray
    val other = MultiModal.wavBytes(16000, 1600,
      "completely different material with its own rhythm and period"
        .getBytes("UTF-8"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(MultiModal.audioPHash(base),
      MultiModal.audioPHash(scaled)) <= 3,
      "gain scaling must stay inside the Hamming<=3 contract")
    assert(ham(MultiModal.audioPHash(base),
      MultiModal.audioPHash(other)) > 10,
      "unrelated clips must sit far apart")
    // the EXACT window fingerprints split the scaled copy everywhere —
    // precisely the gap the perceptual hash closes
    val fb = MultiModal.audioFingerprints(base).map(_._2)
    val fs = MultiModal.audioFingerprints(scaled).map(_._2)
    assert(fb.zip(fs).forall { case (a, b) => a != b })
    // end-to-end through the distributed pipeline
    def rec(id: Long, wav: Array[Byte]) =
      MultiModal.MMRecord(id, "audio", wav, MultiModal.MMeta(0, 0, 16000, 0))
    val rows = MultiModal.audioNearDup(spark.createDataset(Seq(
        rec(1, base), rec(4, scaled), rec(7, other)))).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(4))).toSeq
    assert(rows == Seq((1L, 4L, true), (4L, 1L, true), (7L, -1L, false)),
      s"planted pair must link both ways, noise must stay single: $rows")
    // fixture corpus: runs end-to-end, one row per clip
    val fixture = SparkEntry.queries("q_audio_phash")(spark, sf)
    val nAudio = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1).count()
    assert(fixture.count() == nAudio)
  }

  test("q_audio_dedup groups the planted shared segment by decoded signal") {
    import spark.implicits._
    // two clips of 4 windows (1600 samples @ 400/window): clip 2's
    // SECOND window carries exactly clip 1's FIRST window's samples —
    // a shared 25 ms segment at a different position; everything else
    // distinct
    val seedA = Array.tabulate(1600)(i => ((i * 37 + 11) % 128).toByte)
    val seedB = Array.tabulate(1600)(i => ((i * 53 + 29) % 128).toByte)
    System.arraycopy(seedA, 0, seedB, 400, 400)
    def rec(id: Long, seed: Array[Byte]) =
      MultiModal.MMRecord(id, "audio",
        MultiModal.wavBytes(16000, 1600, seed),
        MultiModal.MMeta(0, 0, 16000, 0))
    val corpus = spark.createDataset(Seq(rec(1, seedA), rec(2, seedB)))
    val rows = MultiModal.audioDedup(corpus)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.length == 8)
    val byCopies = rows.groupBy(_._4)
    assert(byCopies(2L).map(t => (t._1, t._2)).toSet == Set((1L, 0), (2L, 1)),
      s"expected the shared segment at (1,0) and (2,1): ${rows.toSeq}")
    assert(byCopies(1L).length == 6)
    // canonical = first (id, window_idx) of the duplicate group
    assert(rows.filter(t => t._4 == 2L && t._5).map(t => (t._1, t._2)).toSeq
      == Seq((1L, 0)))
    // signal identity survives container re-encode: same samples through
    // a fresh WAV wrapper still fingerprint identically
    val fpA = MultiModal.audioFingerprints(
      MultiModal.wavBytes(16000, 1600, seedA))
    val fpA2 = MultiModal.audioFingerprints(
      MultiModal.wavBytes(8000, 1600, seedA)) // different declared rate
    assert(fpA.map(_._2) == fpA2.map(_._2),
      "fingerprint must hash decoded samples, not container bytes")
    // fixture corpus: runs end-to-end. Clips are text-seeded, and the
    // fixture PLANTS near-dup texts sharing long prefixes — those yield
    // genuinely identical audio segments, so groups DO occur. Pin the
    // ground truth: every grouped window is an identical decoded sample
    // run, never a mere fingerprint collision.
    val fixture = SparkEntry.queries("q_audio_dedup")(spark, sf).collect()
    assert(fixture.nonEmpty)
    val clips = MultiModal.corpus(spark, sf)
      .filter(_.modality == "audio").collect()
      .map(r => r.id -> {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        in.readAllBytes()
      }).toMap
    def sampleRun(id: Long, wi: Int): Seq[Byte] =
      clips(id).slice(wi * 800, wi * 800 + 800).toSeq
    val groups = fixture.filter(_.getLong(3) > 1)
      .groupBy(_.getLong(2)) // fp
    assert(groups.nonEmpty, "fixture's planted near-dup texts should " +
      "share at least one 400-sample audio segment")
    groups.foreach { case (fp, members) =>
      val runs = members.map(r => sampleRun(r.getLong(0), r.getInt(1)))
      assert(runs.distinct.length == 1,
        s"fp $fp groups non-identical sample runs (collision): " +
          members.map(r => (r.getLong(0), r.getInt(1))).toSeq)
    }
  }

  test("feature extraction: fixed dim, normalized, deterministic, batched") {
    val f1 = MultiModal.extractFeatures(MultiModal.corpus(spark, sf)).collect()
    assert(f1.length == 500)
    assert(f1.forall(_.features.length == MultiModal.featureDim))
    // histogram of byte buckets normalized by payload length sums to ~1
    assert(f1.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
    val f2 = MultiModal.extractFeatures(MultiModal.corpus(spark, sf)).collect()
    assert(f1.map(_.id).sorted.toSeq == f2.map(_.id).sorted.toSeq)
    val m1 = f1.map(f => f.id -> f.features.toSeq).toMap
    val m2 = f2.map(f => f.id -> f.features.toSeq).toMap
    assert(m1 == m2, "decode stub not deterministic across runs")
  }

  test("image features come from REAL decoded PNG pixels (javax.imageio)") {
    import spark.implicits._
    // solid (10,20,30) 3x2 PNG: Rec-601 luma = 18 -> bin 1 gets ALL mass —
    // a value the byte-histogram stub could never produce for these bytes
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3)
      img.setRGB(x, y, (10 << 16) | (20 << 8) | 30)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rec = MultiModal.MMRecord(42L, "image", bos.toByteArray,
      MultiModal.MMeta(3, 2, 0, 1))
    val out = MultiModal.extractFeatures(Seq(rec).toDS()).collect()
    assert(out.length == 1)
    val f = out.head.features
    assert(f(1) == 1.0f && f.sum == 1.0f,
      s"expected all mass in luminance bin 1: ${f.toSeq}")
    // corpus image payloads are decodable PNGs and the seam's output
    // matches an independent driver-side decode of the same bytes
    val sample = MultiModal.corpus(spark, sf)
      .filter(_.modality == "image").take(3)
    val viaSeam = MultiModal
      .extractFeatures(spark.createDataset(sample.toSeq)).collect()
      .map(x => x.id -> x.features.toSeq).toMap
    sample.foreach { r =>
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.content))
      assert(decoded.getWidth == r.meta.width &&
        decoded.getHeight == r.meta.height,
        s"id=${r.id}: payload is not the PNG its metadata describes")
      assert(viaSeam(r.id) == MultiModal.imageFeatures(r.content).toSeq)
    }
  }

  test("audio features come from REAL decoded WAV samples (javax.sound.sampled)") {
    import spark.implicits._
    // constant-amplitude WAV: energy is uniform across the 16 segments,
    // so every bin must be exactly 1/16 — unreachable for a byte stub
    // (the RIFF header bytes would skew any byte-level histogram)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val nS = 1600
    val raw = new Array[Byte](nS * 2)
    for (i <- 0 until nS) { raw(2 * i) = 0; raw(2 * i + 1) = 0x10 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, nS.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rec = MultiModal.MMRecord(43L, "audio", bos.toByteArray,
      MultiModal.MMeta(0, 0, 16000, 0))
    val out = MultiModal.extractFeatures(Seq(rec).toDS()).collect()
    assert(out.length == 1)
    out.head.features.foreach(f =>
      assert(math.abs(f - 1.0f / 16) < 1e-6, s"expected uniform energy, got $f"))
    // corpus audio payloads are decodable WAVs; seam == driver-side decode
    val sample = MultiModal.corpus(spark, sf)
      .filter(_.modality == "audio").take(3)
    val viaSeam = MultiModal
      .extractFeatures(spark.createDataset(sample.toSeq)).collect()
      .map(x => x.id -> x.features.toSeq).toMap
    sample.foreach { r =>
      assert(viaSeam(r.id) == MultiModal.audioFeatures(r.content).toSeq)
    }
  }

  test("video features come from REAL sampled-and-decoded PNG frames") {
    import spark.implicits._
    // 2-frame container: frame0 solid luma-18 (bin 1), frame1 solid
    // luma-200 (bin 12). everyK=2 samples ONLY frame0 -> all mass in bin
    // 1; everyK=1 averages both frames -> 0.5/0.5. A byte-histogram stub
    // could produce neither (PNG container bytes would smear the bins).
    def solidPng(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 3; x <- 0 until 4) img.setRGB(x, y, rgb)
      val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b)
      b.toByteArray
    }
    val f0 = solidPng((10 << 16) | (20 << 8) | 30)    // luma 18 -> bin 1
    val f1 = solidPng((200 << 16) | (200 << 8) | 200) // luma 200 -> bin 12
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(2)
    Seq(f0, f1).foreach { p => out.writeInt(p.length); out.write(p) }
    val content = bos.toByteArray
    val sampled = MultiModal.videoFeatures(content, everyK = 2)
    assert(sampled(1) == 1.0f, s"everyK=2 must see only frame0: ${sampled.toSeq}")
    val all = MultiModal.videoFeatures(content, everyK = 1)
    assert(all(1) == 0.5f && all(12) == 0.5f, s"everyK=1 averages: ${all.toSeq}")
    // the seam decodes corpus video payloads == driver-side decode
    val rec = MultiModal.MMRecord(44L, "video", content,
      MultiModal.MMeta(4, 3, 0, 2))
    val viaSeam = MultiModal.extractFeatures(Seq(rec).toDS()).collect()
    assert(viaSeam.head.features.toSeq == sampled.toSeq)
    // corpus payloads are parseable containers with meta-matching frames
    val sample = MultiModal.corpus(spark, sf)
      .filter(_.modality == "video").take(2)
    sample.foreach { r =>
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(r.content))
      assert(in.readInt() == r.meta.n_frames,
        s"id=${r.id}: container frame count != metadata")
    }
  }

  test("resize REALLY re-encodes: decoded output dims, in-bounds passthrough") {
    import spark.implicits._
    def dims(png: Array[Byte]): (Int, Int) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      (img.getWidth, img.getHeight)
    }
    // corpus media is already <= 64x48: everything must pass through
    // BYTE-identical (no gratuitous re-encode), audio untouched
    val orig = MultiModal.corpus(spark, sf).collect().map(r => r.id -> r).toMap
    val same = MultiModal.resize(MultiModal.corpus(spark, sf), 100, 100)
      .collect()
    same.foreach { r =>
      assert(java.util.Arrays.equals(r.content, orig(r.id).content),
        s"id=${r.id}: in-bounds payload must pass through byte-identical")
      assert(r.meta == orig(r.id).meta)
    }
    // oversized synthetic records: REAL downscale, verified by decoding
    val bigImg = MultiModal.MMRecord(98L, "image",
      MultiModal.pngBytes(320, 240, "seed".getBytes), MultiModal.MMeta(320, 240, 0, 1))
    val bigVid = MultiModal.MMRecord(99L, "video",
      MultiModal.mpngBytes(320, 240, 3, "seed".getBytes), MultiModal.MMeta(320, 240, 0, 3))
    val shrunk = MultiModal.resize(Seq(bigImg, bigVid).toDS(), 100, 100)
      .collect().map(r => r.id -> r).toMap
    assert(shrunk(98L).meta.width == 100 && shrunk(98L).meta.height == 75)
    assert(dims(shrunk(98L).content) == (100, 75),
      "image payload must ACTUALLY be 100x75 when decoded")
    // nearest-neighbor correspondence: output pixel maps to source pixel
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bigImg.content))
    val dst = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(shrunk(98L).content))
    assert(dst.getRGB(0, 0) == src.getRGB(0, 0))
    assert(dst.getRGB(99, 74) == src.getRGB(99 * 320 / 100, 74 * 240 / 75))
    val vidFrames = MultiModal.mpngFrames(shrunk(99L).content)
    assert(vidFrames.length == 3, "frame count must survive resize")
    vidFrames.foreach(f => assert(dims(f) == (100, 75),
      "every video frame must decode at the target size"))
  }

  test("frame sampling pulls the REAL every-k-th frame payloads") {
    val sampled = MultiModal.sampleFrames(MultiModal.corpus(spark, sf), 2)
      .collect()
    assert(sampled.nonEmpty)
    val orig = MultiModal.corpus(spark, sf).collect()
      .filter(_.modality == "video")
      .map(r => r.id -> MultiModal.mpngFrames(r.content)).toMap
    val byId = sampled.groupBy(_.getLong(0))
    byId.foreach { case (id, rows) =>
      val want = orig(id).zipWithIndex.collect {
        case (f, i) if i % 2 == 0 => i -> f
      }.toMap
      assert(rows.map(_.getInt(1)).sorted.toSeq == want.keys.toSeq.sorted,
        s"id=$id: sampled indices wrong")
      rows.foreach { r =>
        assert(java.util.Arrays.equals(
          r.getAs[Array[Byte]](2), want(r.getInt(1))),
          s"id=$id frame=${r.getInt(1)}: payload != original frame bytes")
        // and each sampled frame is a decodable PNG
        assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
          r.getAs[Array[Byte]](2))) != null)
      }
    }
  }
}
