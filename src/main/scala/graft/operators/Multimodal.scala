package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `BINARY` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as `mapPartitions`
  * batch stages (the Scala analogue of `mapInPandas` — one iterator pass per
  * partition, batch-friendly, no per-row overhead).
  *
  * Codecs: [[RealCodecs]] decodes images (JDK `javax.imageio` —
  * PNG/JPEG/BMP/GIF/TIFF, headless, zero added dependencies) and PCM WAV
  * (manual RIFF parsing) for REAL; only formats with no in-JDK decoder
  * (video containers, modern audio codecs) fall back to [[StubDecoder]]'s
  * deterministic md5 arithmetic, which also keeps the end-to-end pipeline
  * oracle-checkable (`q_mm_decode` recomputes the stub's math in DuckDB —
  * an external engine cannot re-run ImageIO, so the REAL codecs are
  * spec-gated on generated fixtures instead).
  */
object Multimodal {

  /** Typed asset metadata carried next to the binary payload. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Decode-stage output schema (encoder-derived nullability: modality rides
    * through as a nullable string; feature elements are primitive floats).
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = true)))

  /** Deterministic stand-in for the real codec: dimensions and a small
    * feature vector derived from the md5 of the payload bytes — md5 chosen
    * (over an ad-hoc rolling hash) because an external SQL engine recomputes
    * it from the same bytes, so the `mapPartitions` decode stage is
    * oracle-checkable end-to-end (`q_mm_decode`). Swap for a real decoder
    * (JNI/FFM image lib) without touching the pipeline.
    */
  object StubDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) =
      decode(payload, java.security.MessageDigest.getInstance("MD5"))

    /** Digest-reusing form for the per-partition loop: `digest()` resets
      * the instance, so ONE MessageDigest serves a whole partition —
      * per-row JCA provider lookups are exactly the per-row codec state
      * the mapPartitions shape exists to avoid.
      */
    def decode(payload: Array[Byte],
        md: java.security.MessageDigest): (Int, Int, Array[Float]) = {
      if (payload == null || payload.isEmpty) return (0, 0, Array.empty)
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      // first 15 hex chars < 2^60: positive, so % and >> agree with SQL
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val width = 64 + (h % 512).toInt
      val height = 64 + ((h >> 16) % 512).toInt
      val features = Array.tabulate(8) { i =>
        ((h >> (i * 7)) % 1000) / 1000.0f
      }
      (width, height, features)
    }
  }

  /** Synthesize a deterministic asset table (binary payloads from content
    * hashes) — the test-fixture source for the plumbing.
    */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("modality"),
      lit("application/octet-stream").as("mime"),
      sha2(col("id").cast("string"), 256).cast("binary").as("payload"))
  }

  /** Input/output records for the decode stage (typed `Dataset` encoders
    * keep the stage inside Catalyst — schema known, columns prunable — where
    * an RDD drop-out would black-box the surrounding plan).
    */
  case class AssetIn(asset_id: Long, modality: String, mime: String,
      payload: Array[Byte])
  case class AssetDecoded(asset_id: Long, modality: String, mime: String,
      payload: Array[Byte], width: Integer, height: Integer, n_bytes: Int,
      features: Array[Float])

  /** Decode stage as `Dataset.mapPartitions`: one batch pass per partition
    * (codec state per-partition, not per-row) while staying a Catalyst
    * operator — the plan above and below keeps codegen, pushdown, and the
    * typed schema.
    */
  def decodeStage(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("mime"), col("payload"))
      .as[AssetIn]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { a =>
          val (w, h, feats) = StubDecoder.decode(a.payload, md)
          AssetDecoded(a.asset_id, a.modality, a.mime, a.payload, w, h,
            if (a.payload == null) 0 else a.payload.length, feats)
        }
      }
      .toDF()
  }

  /** REAL codecs on pure JDK — no external libraries: images through
    * `javax.imageio` (PNG/JPEG/BMP/GIF/TIFF readers ship with the JDK,
    * headless-safe), WAV through manual RIFF/PCM byte parsing. This
    * upgrades the "codec stubbed" boundary: self-describing formats decode
    * for REAL; only exotic codecs (video, modern audio) stay behind the
    * stub. All methods return None on undecodable bytes — a corrupt
    * payload yields null columns, never a task failure (one bad file must
    * not kill a 100 TB decode pass).
    */
  object RealCodecs extends Serializable {

    /** Decode an image: (width, height, 8 features = meanR, meanG, meanB,
      * 4-bin luminance histogram fractions, aspect w/(w+h)). Pixels are
      * subsampled on a ≤ 64×64 grid so feature cost is bounded regardless
      * of image size.
      */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      if (payload == null || payload.isEmpty) return None
      try {
        System.setProperty("java.awt.headless", "true")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) return None
        val (w, h) = (img.getWidth, img.getHeight)
        val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
        var (r, g, b, n) = (0.0, 0.0, 0.0, 0)
        val histo = new Array[Int](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val (pr, pg, pb) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
            r += pr; g += pg; b += pb; n += 1
            val lum = (0.299 * pr + 0.587 * pg + 0.114 * pb).toInt
            histo(math.min(3, lum / 64)) += 1
            x += sx
          }
          y += sy
        }
        val feats = Array(
          (r / n / 255).toFloat, (g / n / 255).toFloat, (b / n / 255).toFloat,
          histo(0).toFloat / n, histo(1).toFloat / n, histo(2).toFloat / n,
          histo(3).toFloat / n, w.toFloat / (w + h))
        Some((w, h, feats))
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Resize an image to fit `maxDim` (aspect preserved, never upscales);
      * returns PNG bytes.
      */
    def resizeImage(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
      if (payload == null || payload.isEmpty) return None
      try {
        System.setProperty("java.awt.headless", "true")
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) return None
        val scale = math.min(1.0,
          maxDim.toDouble / math.max(img.getWidth, img.getHeight))
        val (nw, nh) = (math.max(1, (img.getWidth * scale).round.toInt),
          math.max(1, (img.getHeight * scale).round.toInt))
        val out = new java.awt.image.BufferedImage(nw, nh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = out.createGraphics()
        try {
          gfx.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          gfx.drawImage(img, 0, 0, nw, nh, null)
        } finally gfx.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** PCM WAV (RIFF) parse WITHOUT javax.sound: walks the chunk list to
      * `fmt `/`data` and returns (rate, channels, bits, mono-mixed
      * [-1, 1] samples — channel 0 only, the VAD-sufficient projection).
      */
    def parsePcm(payload: Array[Byte])
        : Option[(Int, Int, Int, Array[Double])] = {
      def le16(o: Int) = ((payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8))
      def le32(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      try {
        if (payload == null || payload.length < 44 ||
          new String(payload, 0, 4, "US-ASCII") != "RIFF" ||
          new String(payload, 8, 4, "US-ASCII") != "WAVE") return None
        // Chunk lengths are UNSIGNED le32 and the payload is untrusted: a
        // crafted length of -8/-9 read signed would make the advance zero
        // and spin this loop forever on one corrupt WAV. Reading unsigned
        // into a Long keeps the advance strictly >= 8 and overflow-free.
        var off = 12L
        var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
        var data: Option[(Int, Int)] = None // (offset, len)
        while (off + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
          val o = off.toInt
          val id = new String(payload, o, 4, "US-ASCII")
          val len = le32(o + 4).toLong & 0xffffffffL
          if (id == "fmt " && len >= 16)
            fmt = Some((le16(o + 10), le32(o + 12), le16(o + 22)))
          else if (id == "data")
            data = Some((o + 8, math.min(len, (payload.length - off - 8)).toInt))
          off += 8L + len + (len & 1L)
        }
        for ((channels, rate, bits) <- fmt; (dOff, dLen) <- data
            if rate > 0 && channels > 0 && (bits == 8 || bits == 16)) yield {
          val bytesPer = bits / 8
          val nSamples = dLen / (bytesPer * channels)
          val samples = new Array[Double](nSamples)
          var i = 0
          while (i < nSamples) {
            val o = dOff + i * bytesPer * channels
            samples(i) = if (bits == 16) (le16(o).toShort).toDouble / 32768.0
              else ((payload(o) & 0xff) - 128).toDouble / 128.0
            i += 1
          }
          (rate, channels, bits, samples)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** WAV decode features: 8 = sample rate (Hz), channels, bits/sample,
      * duration (s), RMS, peak, zero-cross rate, n_samples.
      */
    def decodeWav(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
      parsePcm(payload).map { case (rate, channels, bits, s) =>
        var (sumSq, peak, crossings) = (0.0, 0.0, 0L)
        var i = 0
        while (i < s.length) {
          val v = s(i)
          sumSq += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && v * s(i - 1) < 0) crossings += 1
          i += 1
        }
        val rms = if (s.nonEmpty) math.sqrt(sumSq / s.length) else 0.0
        (rate, channels, Array(rate.toFloat, channels.toFloat, bits.toFloat,
          s.length.toFloat / rate, rms.toFloat, peak.toFloat,
          if (s.length > 1) crossings.toFloat / (s.length - 1) else 0f,
          s.length.toFloat))
      }

    /** Energy-based segmentation (VAD-lite, the speech-data chunking
      * stage): classify fixed `windowMs` windows active/silent by RMS
      * against `rmsThreshold`, merge consecutive same-class windows.
      * Returns (segment_idx, active, start_sec, duration_sec, rms).
      */
    def audioSegments(payload: Array[Byte], windowMs: Int = 100,
        rmsThreshold: Double = 0.02)
        : Seq[(Int, Boolean, Float, Float, Float)] =
      parsePcm(payload).map { case (rate, _, _, s) =>
        val win = math.max(1, rate * windowMs / 1000)
        val nWin = (s.length + win - 1) / win
        val winRms = (0 until nWin).map { w =>
          val (lo, hi) = (w * win, math.min(s.length, (w + 1) * win))
          var sumSq = 0.0
          var i = lo
          while (i < hi) { sumSq += s(i) * s(i); i += 1 }
          math.sqrt(sumSq / math.max(1, hi - lo))
        }
        val segs = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Boolean, Float, Float, Float)]
        var (segStart, segSumSq, segN) = (0, 0.0, 0)
        def flush(endWin: Int): Unit = if (endWin > segStart) {
          val active = winRms(segStart) >= rmsThreshold
          val startS = segStart * win.toFloat / rate
          val endS = math.min(s.length, endWin * win).toFloat / rate
          segs += ((segs.size, active, startS, endS - startS,
            math.sqrt(segSumSq / math.max(1, segN)).toFloat))
        }
        for (w <- 0 until nWin) {
          val active = winRms(w) >= rmsThreshold
          if (w > segStart && active != (winRms(segStart) >= rmsThreshold)) {
            flush(w); segStart = w; segSumSq = 0.0; segN = 0
          }
          val (lo, hi) = (w * win, math.min(s.length, (w + 1) * win))
          var i = lo
          while (i < hi) { segSumSq += s(i) * s(i); i += 1 }
          segN += hi - lo
        }
        flush(nWin)
        segs.toSeq
      }.getOrElse(Seq.empty)
  }

  /** Segmentation stage: one row per (asset, audio segment) — the
    * mapPartitions explode that feeds ASR-style per-utterance processing.
    * Non-audio and undecodable assets contribute no rows.
    */
  def audioSegmentStage(assets: DataFrame, windowMs: Int = 100,
      rmsThreshold: Double = 0.02): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, mime, p) =>
        if (mime == "audio/wav" || mime == "audio/x-wav")
          RealCodecs.audioSegments(p, windowMs, rmsThreshold).map {
            case (idx, active, start, dur, rms) =>
              (id, idx, active, start, dur, rms)
          }
        else Iterator.empty
      })
      .toDF("asset_id", "segment_idx", "active", "start_sec", "duration_sec",
        "rms")
  }

  /** Decode stage with the REAL codecs: images and PCM WAVs decode for
    * real (dispatch on mime), anything else falls through to the stub's
    * deterministic arithmetic so the pipeline still emits a row per asset.
    * Undecodable real-format bytes yield null width/height/features — a
    * poisoned payload must degrade the ROW, never the JOB. Same output
    * schema as [[decodeStage]] (audio reports null width/height; its
    * numbers live in the feature vector).
    */
  def decodeStageReal(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("mime"), col("payload"))
      .as[AssetIn]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { a =>
          val nb = if (a.payload == null) 0 else a.payload.length
          val mime = Option(a.mime).getOrElse("")
          if (mime.startsWith("image/"))
            RealCodecs.decodeImage(a.payload) match {
              case Some((w, h, f)) =>
                AssetDecoded(a.asset_id, a.modality, a.mime, a.payload,
                  w, h, nb, f)
              case None => AssetDecoded(a.asset_id, a.modality, a.mime,
                a.payload, null, null, nb, null)
            }
          else if (mime == "audio/wav" || mime == "audio/x-wav")
            RealCodecs.decodeWav(a.payload) match {
              case Some((_, _, f)) =>
                AssetDecoded(a.asset_id, a.modality, a.mime, a.payload,
                  null, null, nb, f)
              case None => AssetDecoded(a.asset_id, a.modality, a.mime,
                a.payload, null, null, nb, null)
            }
          else {
            val (w, h, f) = StubDecoder.decode(a.payload, md)
            AssetDecoded(a.asset_id, a.modality, a.mime, a.payload, w, h, nb, f)
          }
        }
      }
      .toDF()
  }

  /** 64-bit average perceptual hash (aHash): downscale to an 8×8 luminance
    * grid (area-averaged via bilinear draw), threshold each cell against
    * the grid mean. Visually-identical images — recompressed, lightly
    * noised, resized — land within a few Hamming bits of each other, which
    * is what image-level near-dup detection needs (an md5 sees every
    * re-encode as a brand-new file).
    */
  def aHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) return None
    try {
      System.setProperty("java.awt.headless", "true")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = small.createGraphics()
      try {
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, 8, 8, null)
      } finally gfx.dispose()
      val lum = Array.tabulate(64) { k =>
        val p = small.getRGB(k % 8, k / 8)
        0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)
      }
      val mean = lum.sum / 64
      var bits = 0L
      var k = 0
      while (k < 64) { if (lum(k) >= mean) bits |= (1L << k); k += 1 }
      Some(bits)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Image near-duplicate pairs by perceptual hash: aHash every image
    * (mapPartitions), then find pairs within `maxHamming` bits via the
    * SAME banded blocking the text SimHash path uses — the 64-bit hash
    * splits into 4 × 16-bit bands; by pigeonhole any pair within ≤ 3 bits
    * (more generally < 4) agrees on at least one whole band, so a
    * band-bucket equi-join (shuffle on (band, value), never all-pairs)
    * finds every candidate and a codegen popcount verifies exactly.
    * Returns (a_id, b_id, hamming) with a < b.
    *
    * Scale shape: decode cost is one linear pass; the join is the banded
    * LSH shuffle the dedup family already uses, with per-bucket pairing
    * bounded by band-collision counts — no quadratic stage. `maxHamming`
    * must stay < 4 for the 4-band pigeonhole guarantee (require()d).
    */
  def imageNearDupPairs(assets: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"4-band pigeonhole covers hamming < 4; got $maxHamming")
    val spark = assets.sparkSession
    import spark.implicits._
    val hashes = assets
      .select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => aHash(p).map(id -> _) })
      .toDF("asset_id", "phash")
      .localCheckpoint() // decoded once; read by all four band branches
    val banded = hashes.select(col("asset_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * 16).bitwiseAND(0xffffL)
              .as("value"))): _*)).as("bk"))
      .select(col("asset_id"), col("phash"),
        col("bk.band").as("band"), col("bk.value").as("value"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.value") === col("y.value")
          && col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("a_id"), col("y.asset_id").as("b_id"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
      .localCheckpoint()
    graft.functions.releaseCheckpoint(hashes)
    pairs
  }

  /** Resize stage (images only; non-images pass through untouched):
    * payload is replaced with the resized PNG and dimensions re-derived —
    * the thumbnailing pass of a vision-data pipeline.
    */
  def resizeStage(assets: DataFrame, maxDim: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("mime"), col("payload"))
      .as[AssetIn]
      .mapPartitions { it =>
        it.map { a =>
          if (Option(a.mime).getOrElse("").startsWith("image/"))
            RealCodecs.resizeImage(a.payload, maxDim) match {
              case Some(png) => AssetIn(a.asset_id, a.modality, "image/png", png)
              case None => a
            }
          else a
        }
      }
      .toDF()
  }

  /** Frame-sampling / chunking plan shape: explode a bounded index range per
    * asset (e.g. every k-th frame), keyed so downstream shuffles partition by
    * (asset, chunk).
    */
  def frameSample(decoded: DataFrame, everyK: Int = 10, maxFrames: Int = 5): DataFrame =
    decoded.filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), least(lit((maxFrames - 1) * everyK),
          col("n_bytes")), lit(everyK))))
      .select(col("asset_id"), col("frame_idx"), col("width"), col("height"))

  /** Embedding-ready projection: modality-partitioned feature rows. */
  def featureRows(decoded: DataFrame): DataFrame =
    decoded.filter(size(col("features")) > 0)
      .select(col("asset_id"), col("modality"), col("features"))
      .repartition(col("modality"))

  /** Assets derived from the documents table: payload = UTF-8 bytes of the
    * text, modality/mime rotate by doc_id — the driver-data twin of
    * [[syntheticAssets]], feeding the oracle-gated decode pipeline.
    */
  def documentAssets(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      col("text").cast("binary").as("payload"))

  /** The multimodal pipeline end-to-end on driver data: binary payloads ->
    * `mapPartitions` decode -> frame sampling for video assets -> per-asset
    * rollup. Every output value round-trips through the stub codec's
    * md5-derived arithmetic, which the DuckDB oracle recomputes from the
    * same text bytes — gating schema, batch shape, null handling, and the
    * frame-count formula cross-engine.
    */
  def decodePipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.round4
    val decoded = decodeStage(documentAssets(spark, dir))
    val frames = frameSample(decoded, everyK = 37, maxFrames = 8)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_frames"))
    decoded.join(frames, Seq("asset_id"), "left")
      .select(col("asset_id"), col("modality"), col("mime"),
        col("n_bytes").cast("long").as("n_bytes"),
        col("width"), col("height"),
        // size-guarded: ANSI mode (Spark 4 default) makes element_at on an
        // empty array THROW, and the stub codec emits empty features for
        // empty/NULL payloads — the guard yields NULL, matching the oracle's
        // empty-payload branch
        round4(when(size(col("features")) >= 1,
          element_at(col("features"), 1)).cast("double")).as("f0"),
        round4(when(size(col("features")) >= 8,
          element_at(col("features"), 8)).cast("double")).as("f7"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"))
      .orderBy("asset_id")
  }

  val decodePipelineSql: String =
    """WITH a AS (SELECT doc_id AS asset_id,
         ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
         ['image/png','audio/wav','video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS mime,
         coalesce(text, '') AS text FROM documents),
       -- the empty/NULL-payload branch mirrors StubDecoder's short-circuit:
       -- zero dimensions, no features, n_bytes 0
       d AS (SELECT asset_id, modality, mime,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN NULL
           ELSE ('0x' || substr(md5(text), 1, 15))::BIGINT END AS h FROM a)
       SELECT asset_id, modality, mime, n_bytes,
         CAST(CASE WHEN h IS NULL THEN 0 ELSE 64 + h % 512 END AS INT) AS width,
         CAST(CASE WHEN h IS NULL THEN 0 ELSE 64 + (h >> 16) % 512 END AS INT) AS height,
         round((CAST(h % 1000 AS DOUBLE) / 1000.0) + 1e-9, 4) + 0.0 AS f0,
         round((CAST((h >> 49) % 1000 AS DOUBLE) / 1000.0) + 1e-9, 4) + 0.0 AS f7,
         CASE WHEN modality = 'video'
           THEN least(7 * 37, n_bytes) // 37 + 1 ELSE 0 END AS n_frames
       FROM d ORDER BY asset_id"""
}
