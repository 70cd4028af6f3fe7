package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REAL media codecs (JDK ImageIO + manual RIFF parsing) driven through
  * the mapPartitions decode/resize stages on GENERATED fixtures — real PNG
  * bytes written by ImageIO in-test, real WAV bytes assembled by hand — so
  * the decode numbers are ground truth, not stub arithmetic.
  */
class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Minimal PCM WAV: `n` 16-bit mono samples of a square wave at
    * `rate` Hz alternating +amp/-amp every `half` samples.
    */
  private def wavBytes(rate: Int, n: Int, amp: Short, half: Int): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until n)
      buf.putShort(if ((i / half) % 2 == 0) amp else (-amp).toShort)
    buf.array()
  }

  test("real image decode: true dimensions and mean color") {
    val (w, h, feats) = Multimodal.RealCodecs
      .decodeImage(pngBytes(40, 20, 0xff0000)).get
    assert(w == 40 && h == 20)
    assert(math.abs(feats(0) - 1.0f) < 0.01, s"meanR: ${feats.toSeq}")
    assert(feats(1) < 0.01 && feats(2) < 0.01, s"meanG/B: ${feats.toSeq}")
    // solid red -> luminance 76 -> all mass in histogram bin 1
    assert(math.abs(feats(4) - 1.0f) < 0.01, s"lum bin 1: ${feats.toSeq}")
    assert(math.abs(feats(7) - 40f / 60f) < 1e-6, "aspect")
  }

  test("real wav decode: rate, duration, rms, zero crossings") {
    // 8000 Hz, 8000 samples = 1.0 s square wave, |v| = 16384/32768 = 0.5
    val (rate, channels, f) = Multimodal.RealCodecs
      .decodeWav(wavBytes(8000, 8000, 16384, 4)).get
    assert(rate == 8000 && channels == 1)
    assert(f(0) == 8000f && f(1) == 1f && f(2) == 16f)
    assert(math.abs(f(3) - 1.0f) < 1e-6, s"duration: ${f.toSeq}")
    assert(math.abs(f(4) - 0.5f) < 1e-3, s"rms of a square wave: ${f.toSeq}")
    assert(math.abs(f(5) - 0.5f) < 1e-3, s"peak: ${f.toSeq}")
    // sign flips every 4 samples -> crossing rate ~1/4
    assert(math.abs(f(6) - 0.25f) < 0.01, s"zero-cross: ${f.toSeq}")
  }

  test("decodeStageReal: dispatch, corrupt-payload nulls, stub fallback") {
    import spark.implicits._
    val assets = Seq(
      (1L, "image", "image/png", pngBytes(16, 8, 0x00ff00)),
      (2L, "audio", "audio/wav", wavBytes(16000, 1600, 8192, 8)),
      (3L, "image", "image/png", "not an image".getBytes("UTF-8")),
      (4L, "video", "video/mp4", "opaque-bytes".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "mime", "payload")
    val out = Multimodal.decodeStageReal(assets).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(out(1L).getAs[Integer]("width") == 16 &&
      out(1L).getAs[Integer]("height") == 8)
    val audioF = out(2L).getAs[scala.collection.Seq[Float]]("features")
    assert(out(2L).getAs[Integer]("width") == null && audioF(0) == 16000f)
    // corrupt image: null metrics, row SURVIVES with n_bytes intact
    assert(out(3L).getAs[Integer]("width") == null &&
      out(3L).getAs[scala.collection.Seq[Float]]("features") == null &&
      out(3L).getAs[Int]("n_bytes") == 12)
    // video: stub fallback still yields deterministic dims/features
    assert(out(4L).getAs[Integer]("width") != null &&
      out(4L).getAs[scala.collection.Seq[Float]]("features").size == 8)
  }

  /** Gradient PNG with optional per-pixel jitter — near-identical when the
    * jitter is small, structurally different when the gradient flips.
    */
  private def gradientPng(w: Int, h: Int, jitter: Int, seed: Int,
      flip: Boolean = false): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (if (flip) (w - 1 - x) else x) * 255 / math.max(1, w - 1)
      val j = if (jitter == 0) 0
        else ((x * 31 + y * 17 + seed * 13) % (2 * jitter + 1)) - jitter
      val v = math.max(0, math.min(255, base + j))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("perceptual hash: re-encodes and light noise collide, flips do not") {
    val base = Multimodal.aHash(gradientPng(64, 64, 0, 0)).get
    val noisy = Multimodal.aHash(gradientPng(64, 64, 4, 7)).get
    val resized = Multimodal.aHash(
      Multimodal.RealCodecs.resizeImage(gradientPng(64, 64, 0, 0), 32).get).get
    val flipped = Multimodal.aHash(gradientPng(64, 64, 0, 0, flip = true)).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(base, noisy) <= 3, s"noise moved ${ham(base, noisy)} bits")
    assert(ham(base, resized) <= 3, s"resize moved ${ham(base, resized)} bits")
    assert(ham(base, flipped) > 16,
      s"mirror image must be far: ${ham(base, flipped)} bits")
  }

  test("image near-dup pairs: jittered copies pair, distinct images do not") {
    import spark.implicits._
    val assets = Seq(
      (1L, gradientPng(64, 64, 0, 0)),       // base
      (2L, gradientPng(64, 64, 4, 9)),       // near-dup of 1
      (3L, gradientPng(64, 64, 0, 0, flip = true)), // structurally different
      (4L, pngBytes(64, 64, 0xff0000)),      // unrelated solid
      (5L, "corrupt".getBytes("UTF-8")))     // undecodable: silently skipped
      .toDF("asset_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(assets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"flip must not pair: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  /** WAV whose samples come from `gen(i)` (16-bit mono). */
  private def wavFrom(rate: Int, n: Int, gen: Int => Short): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(n * 2)
    for (i <- 0 until n) buf.putShort(gen(i))
    buf.array()
  }

  test("audio segmentation: silence-tone-silence yields three segments") {
    import spark.implicits._
    // 8000 Hz, 2.4 s: [0, 0.8) silence, [0.8, 1.6) loud square, rest silence
    val rate = 8000
    val wav = wavFrom(rate, (2.4 * rate).toInt, i =>
      if (i >= (0.8 * rate).toInt && i < (1.6 * rate).toInt)
        (if ((i / 4) % 2 == 0) 16384 else -16384).toShort
      else 0)
    val segs = Multimodal.RealCodecs.audioSegments(wav, windowMs = 100)
    assert(segs.size == 3, s"got $segs")
    val Seq(s0, s1, s2) = segs
    assert(!s0._2 && s1._2 && !s2._2, s"active pattern: $segs")
    assert(math.abs(s1._3 - 0.8f) < 0.101 && math.abs(s1._4 - 0.8f) < 0.201,
      s"tone boundaries: $s1")
    assert(s1._5 > 0.4f && s0._5 < 0.01f, s"segment rms: $segs")
    // the stage form: per-segment rows for audio, nothing for non-audio
    val assets = Seq(
      (1L, "audio/wav", wav),
      (2L, "image/png", pngBytes(4, 4, 0))).toDF("asset_id", "mime", "payload")
    val rows = Multimodal.audioSegmentStage(assets).collect()
    assert(rows.length == 3 && rows.forall(_.getLong(0) == 1L))
    // segments tile the clip: durations sum to its length
    assert(math.abs(rows.map(_.getFloat(4)).sum - 2.4f) < 1e-3)
  }

  test("resizeStage: fit-to-maxDim, aspect preserved, non-images untouched") {
    import spark.implicits._
    val assets = Seq(
      (1L, "image", "image/png", pngBytes(100, 50, 0x123456)),
      (2L, "image", "image/png", pngBytes(8, 4, 0x654321)), // under maxDim
      (3L, "audio", "audio/wav", wavBytes(8000, 80, 1000, 4)))
      .toDF("asset_id", "modality", "mime", "payload")
    val resized = Multimodal.resizeStage(assets, maxDim = 10)
    val dims = Multimodal.decodeStageReal(resized).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        ((r.getAs[Integer]("width"), r.getAs[Integer]("height")))).toMap
    assert(dims(1L) == ((10, 5)), s"downscale: $dims")
    assert(dims(2L) == ((8, 4)), s"never upscales: $dims")
    // audio passes through byte-identical
    val audioBytes = resized.filter(col("asset_id") === 3L)
      .select("payload").head.getAs[Array[Byte]](0)
    assert(audioBytes.toSeq == wavBytes(8000, 80, 1000, 4).toSeq)
  }

  test("corrupt RIFF chunk lengths return None instead of hanging") {
    // a signed read of chunk length -8 (0xFFFFFFF8) makes the old walker's
    // advance zero — one crafted WAV would spin an executor task forever.
    // Unsigned-length walk must terminate with None on every crafted case.
    def crafted(len: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("junk".getBytes("US-ASCII")).putInt(len) // hostile length
      buf.array()
    }
    for (len <- Seq(-8, -9, -1, Int.MinValue)) {
      val done = java.util.concurrent.Executors.newSingleThreadExecutor()
      val f = done.submit(new java.util.concurrent.Callable[Option[_]] {
        def call(): Option[_] = Multimodal.RealCodecs.parsePcm(crafted(len))
      })
      val r = f.get(5, java.util.concurrent.TimeUnit.SECONDS)
      done.shutdownNow()
      assert(r.isEmpty, s"crafted len=$len must parse to None")
    }
    // truncated-but-positive length still parses the valid prefix contract
    assert(Multimodal.RealCodecs.parsePcm("RIFF".getBytes).isEmpty)
    assert(Multimodal.RealCodecs.parsePcm(null).isEmpty)
  }
}
