package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata beside them; decode / feature-extraction
  * runs batched per partition.
  *
  * Two codecs ship behind the [[Codec]] seam:
  *  - [[ImageIOCodec]] — a REAL image codec on the JDK's `javax.imageio`
  *    (PNG/JPEG/GIF/BMP decode, `Graphics2D` resize + PNG re-encode; zero
  *    external dependencies), the production default for image modality;
  *  - [[StubCodec]] — deterministic fake dimensions derived from the
  *    payload bytes, kept for differential specs and for the oracle-gated
  *    q31 battery query whose corpus is text-as-binary (not decodable
  *    images).
  * Everything around the codec — the schema contract, the `mapPartitions`
  * batch shape (one codec instance per partition, streamed iterator, no
  * per-row setup), and the partitioned write — is codec-agnostic: swap in a
  * JNI/javacv video codec and nothing else changes. In PySpark the same
  * seam is `mapInPandas` with an arrow-batched UDF; `mapPartitions` over a
  * typed Dataset is the Scala equivalent.
  */
object Multimodal {

  /** A media row in flight: id + opaque payload + declared modality. */
  final case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features: per-payload metadata (dimensions + channel count
    * from the codec; byte length + checksum from the raw payload). */
  final case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Long,
                                 width: Int, height: Int, channels: Int, checksum: Long)

  /** Decoder seam — one instance per partition, reused across the batch.
    * Both methods are abstract ON PURPOSE: a production codec must
    * implement each explicitly (a defaulted stub would let a real decoder
    * silently inherit byte-garbling resize behavior). */
  trait Codec extends Serializable {
    /** (width, height, channels) of the decoded payload. Must throw on an
      * undecodable payload rather than return garbage — corrupt rows in a
      * real corpus should be quarantined by the caller, not silently
      * featurized. */
    def decode(payload: Array[Byte], modality: String): (Int, Int, Int)

    /** Resample a payload to a `targetW`×`targetH` representation
      * (decode → resize → re-encode). Must be deterministic. */
    def resize(payload: Array[Byte], modality: String,
               targetW: Int, targetH: Int): Array[Byte]

    /** Row-major `w`×`h` grayscale grid (0–255) of the decoded payload —
      * the raw material for perceptual hashing. Must be deterministic and
      * throw on undecodable payloads (same contract as [[decode]]). */
    def grayPixels(payload: Array[Byte], modality: String, w: Int, h: Int): Array[Int]
  }

  /** Real image codec on the JDK's `javax.imageio.ImageIO` — no external
    * dependencies. `decode` reads any ImageIO-supported container
    * (PNG/JPEG/GIF/BMP/WBMP) and reports true pixel dimensions plus the
    * raster band count (1 = grayscale, 2 = gray+alpha, 3 = RGB, 4 = RGBA).
    * `resize` decodes, rescales with NEAREST-NEIGHBOR interpolation
    * (pixel-deterministic WITHIN a JVM; the re-encoded PNG byte stream is
    * not guaranteed bit-identical across JDK vendors/versions, whose
    * encoder heuristics differ — compare decoded pixels, not payload
    * bytes, across heterogeneous clusters), and re-encodes as PNG
    * (lossless, so a resize round-trip decodes to exactly the target
    * dimensions). Band count survives the round-trip for the common
    * 1/3/4-band types; a 2-band gray+alpha source widens to 4-band RGBA
    * (`BufferedImage` has no gray+alpha render target — alpha wins over
    * grayness so no channel data is lost).
    *
    * Undecodable payloads throw `IllegalArgumentException` with the byte
    * length in the message — the strict contract for curated corpora.
    * Crawled corpora WILL contain corrupt blobs; run those through
    * [[tryExtractFeatures]], which quarantines per-row decode failures
    * into an error column instead of failing a 100 TB stage. */
  object ImageIOCodec extends Codec {
    // ImageIO's default read path spools through a temp-FILE cache — a
    // disk write per decode, catastrophic per-row in an executor. A
    // MemoryCacheImageInputStream keeps the whole decode in memory.
    private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val img = javax.imageio.ImageIO.read(in)
        require(img != null, s"undecodable image payload (${payload.length} bytes)")
        img
      } finally {
        // ImageIO.read(ImageInputStream) closes the stream itself after a
        // successful read but NOT on the null/exception paths — close
        // unconditionally and tolerate the already-closed case
        try in.close() catch { case _: java.io.IOException => () }
      }
    }

    def decode(payload: Array[Byte], modality: String): (Int, Int, Int) = {
      val img = readImage(payload)
      (img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }

    def resize(payload: Array[Byte], modality: String,
               targetW: Int, targetH: Int): Array[Byte] = {
      val src = readImage(payload)
      // preserve the alpha/grayscale character of the source; PNG encodes
      // all three types losslessly
      val outType =
        if (src.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else if (src.getRaster.getNumBands == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB
      val dst = new java.awt.image.BufferedImage(targetW, targetH, outType)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      val ok = javax.imageio.ImageIO.write(dst, "png", bos)
      require(ok, "JDK PNG writer unavailable") // always present on a JRE
      bos.toByteArray
    }

    def grayPixels(payload: Array[Byte], modality: String, w: Int, h: Int): Array[Int] = {
      val src = readImage(payload)
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      dst.getRaster.getSamples(0, 0, w, h, 0, null.asInstanceOf[Array[Int]])
    }
  }

  /** Write-side counterpart of [[ImageIOCodec]] for grayscale rasters: a
    * row-major `w`×`h` 0–255 pixel grid encoded as a PNG via the JDK
    * writer. PNG is lossless and TYPE_BYTE_GRAY round-trips its samples
    * exactly, so `ImageIOCodec.grayPixels(encodeGrayPng(w, h, px), _, w,
    * h)` returns `px` bit-for-bit — the property q182 gates. (The PNG
    * BYTE STREAM is not pinned across JDK vendors; the pixel round-trip
    * is.) */
  def encodeGrayPng(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dimensions ${w}x$h")
    require(pixels.length == w * h,
      s"expected ${w * h} pixels, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSamples(0, 0, w, h, 0, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", bos)
    require(ok, "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Per-image grayscale statistics over REAL decoded pixels — the image
    * face of [[audioFrameFeaturesPcm]]: decode each payload through the
    * codec, sample its `w`×`h` grayscale grid, and report exact integer
    * pixel aggregates (`gray_sum`, `n_bright` = pixels > 127) plus the
    * container's true `(width, height, channels)` and `mean_gray` as one
    * exact-integer division. mapPartitions batch shape: one codec per
    * partition, iterator-streamed, no shuffle — scales as a map stage. */
  final case class GrayStats(doc_id: Long, width: Int, height: Int,
                             channels: Int, gray_sum: Long, n_bright: Long,
                             mean_gray: Double)
  def grayStats(media: DataFrame, codec: Codec, w: Int, h: Int): Dataset[GrayStats] = {
    require(w >= 1 && h >= 1, s"bad grid ${w}x$h")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec
        it.map { r =>
          val (dw, dh, ch) = c.decode(r.payload, r.modality)
          val px = c.grayPixels(r.payload, r.modality, w, h)
          var s = 0L; var bright = 0L; var i = 0
          while (i < px.length) {
            s += px(i); if (px(i) > 127) bright += 1; i += 1
          }
          GrayStats(r.doc_id, dw, dh, ch, s, bright,
            s.toDouble / (w.toLong * h).toDouble)
        }
      }
  }

  /** Deterministic fake decode: "dimensions" derived from payload length and
    * the first character, "channels" from length mod 3 — all reproducible
    * in the oracle's SQL, which is the point (the battery corpus is
    * text-as-binary, not decodable images). Height uses the first Unicode
    * CODEPOINT (not the first UTF-8 byte) so it matches SQL `ascii()`
    * semantics on multibyte text. */
  object StubCodec extends Codec {
    def decode(payload: Array[Byte], modality: String): (Int, Int, Int) = {
      val w = (payload.length % 64) + 1
      val cp = if (payload.isEmpty) 0
               else new String(payload, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
      (w, (cp % 64) + 1, (payload.length % 3) + 1)
    }

    /** Deterministic nearest-neighbor byte sampling. */
    def resize(payload: Array[Byte], modality: String,
               targetW: Int, targetH: Int): Array[Byte] = {
      val n = targetW * targetH
      if (payload.isEmpty || n == 0) Array.emptyByteArray
      else Array.tabulate(n)(i => payload(((i.toLong * payload.length) / n).toInt))
    }

    /** Deterministic fake grayscale: the same byte sampling as [[resize]],
      * widened to 0–255 ints — similar payloads (shared prefixes/bodies)
      * yield similar grids, so the phash pipeline behaves realistically
      * even on the text-as-binary test corpus. */
    def grayPixels(payload: Array[Byte], modality: String, w: Int, h: Int): Array[Int] = {
      val n = w * h
      if (payload.isEmpty || n == 0) Array.fill(n)(0)
      else Array.tabulate(n)(i => payload(((i.toLong * payload.length) / n).toInt) & 0xff)
    }
  }

  /** Wrap a text table as media records (payload = utf-8 bytes), standing in
    * for real image/audio blobs in the test corpus. */
  def asMedia(documents: DataFrame, idCol: String, textCol: String): DataFrame =
    documents.select(
      col(idCol).cast("long").as("doc_id"),
      lit("image").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched feature extraction: one codec per partition, iterator-streamed
    * (never materializes a partition in memory). */
  def extractFeatures(media: DataFrame, codec: Codec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec // per-partition instance
        it.map { r =>
          val (w, h, ch) = c.decode(r.payload, r.modality)
          val checksum = r.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
          MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, ch, checksum)
        }
      }
  }

  /** [[MediaFeatures]] with a quarantine lane: decode results are null and
    * `decode_error` carries the failure when the codec throws. */
  final case class MediaFeaturesOrError(doc_id: Long, modality: String, n_bytes: Long,
                                        width: Option[Int], height: Option[Int],
                                        channels: Option[Int], checksum: Long,
                                        decode_error: Option[String])

  /** [[extractFeatures]] for crawled corpora: a payload the codec cannot
    * decode becomes a quarantine row (null dimensions + the error message)
    * instead of a task failure — one corrupt blob in a 100 TB corpus must
    * cost one row, not the stage. Split the result on
    * `decode_error.isNull` to route good rows onward and quarantined rows
    * to a dead-letter sink; `n_bytes`/`checksum` still identify the bad
    * payload without re-reading it. Only non-fatal decode errors are
    * caught — OOM and friends still fail the task, as they must. */
  def tryExtractFeatures(media: DataFrame, codec: Codec = StubCodec): Dataset[MediaFeaturesOrError] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec // per-partition instance
        it.map { r =>
          val checksum = r.payload.foldLeft(0L)((acc, b) => acc * 31 + (b & 0xff))
          try {
            val (w, h, ch) = c.decode(r.payload, r.modality)
            MediaFeaturesOrError(r.doc_id, r.modality, r.payload.length.toLong,
              Some(w), Some(h), Some(ch), checksum, None)
          } catch {
            case scala.util.control.NonFatal(e) =>
              MediaFeaturesOrError(r.doc_id, r.modality, r.payload.length.toLong,
                None, None, None, checksum,
                Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        }
      }
  }

  /** A resized media row. */
  final case class ResizedMedia(doc_id: Long, modality: String,
                                width: Int, height: Int, payload: Array[Byte])

  /** Batched resize: the standard pre-training normalization pass (fixed
    * input resolution for the vision encoder). Same mapPartitions batch
    * seam as [[extractFeatures]] — one codec instance per partition,
    * iterator-streamed, payload-in payload-out so the output column stays
    * an opaque `binary` for the sink. */
  def resizeAll(media: DataFrame, targetW: Int, targetH: Int,
                codec: Codec = StubCodec): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, s"target dims must be positive ($targetW x $targetH)")
    require(targetW.toLong * targetH <= Int.MaxValue,
      s"target pixel count overflows Int ($targetW x $targetH)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec
        it.map(r => ResizedMedia(r.doc_id, r.modality, targetW, targetH,
          c.resize(r.payload, r.modality, targetW, targetH)))
      }
  }

  /** One sampled frame of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** Frame sampling: split each payload into `n` evenly-spaced fixed-size
    * windows (the video→keyframes shape; a real codec would decode at
    * timestamps — the byte-window stub keeps the fan-out, schema and
    * determinism identical). Output is one row per frame, so downstream
    * per-frame featurization parallelizes beyond the per-document
    * granularity — the reason to explode before, not after, heavy decode.
    * Skew note: payload sizes vary wildly in real corpora; repartition by
    * (doc_id, frame_idx) after sampling if frame work is heavy. */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 32): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .flatMap { r =>
        val len = r.payload.length
        (0 until n).flatMap { i =>
          val off = if (n == 1) 0L else (i.toLong * math.max(len - frameBytes, 0)) / math.max(n - 1, 1)
          if (len == 0) None
          else Some(Frame(r.doc_id, i, off,
            r.payload.slice(off.toInt, math.min(off.toInt + frameBytes, len))))
        }
      }
  }

  /** One audio frame's features. */
  final case class AudioFrameFeatures(doc_id: Long, frame_idx: Int,
                                      n_samples: Int, rms: Double,
                                      zero_crossings: Long)

  /** Audio feature extraction over binary payloads: [[sampleFrames]]'
    * evenly-spaced windows, each decoded by the STUB PCM rule — one
    * unsigned 8-bit sample per byte, centered at 128 (a real pipeline
    * swaps in an audio codec at the same seam; the brief's
    * stub-the-decode contract) — then per-frame RMS energy and
    * zero-crossing count, the classic silence/voicing/noise triage
    * features.
    *
    * Determinism: sum-of-squares is exact integer arithmetic; RMS is one
    * exact division + one correctly-rounded sqrt — bit-identical
    * cross-engine with NO rounding (the q117 argument); crossings are
    * integers. Pure map work over the frame stream — zero shuffle. */
  def audioFrameFeatures(media: DataFrame, nFrames: Int,
                         frameBytes: Int = 64): Dataset[AudioFrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    sampleFrames(media, nFrames, frameBytes).map { f =>
      val xs = f.frame.map(b => (b & 0xff) - 128)
      val n = xs.length
      var sumSq = 0L
      var zc = 0L
      var i = 0
      while (i < n) {
        sumSq += xs(i).toLong * xs(i)
        if (i > 0 && ((xs(i - 1) < 0 && xs(i) >= 0) ||
          (xs(i - 1) >= 0 && xs(i) < 0))) zc += 1
        i += 1
      }
      AudioFrameFeatures(f.doc_id, f.frame_idx, n,
        math.sqrt(sumSq.toDouble / n), zc)
    }
  }

  /** Audio decode seam — the [[Codec]] counterpart for sampled sound.
    * Implementations must throw on undecodable payloads (the strict
    * curated-corpus contract); crawled corpora route through
    * [[tryAudioFrameFeaturesPcm]]'s quarantine lane. */
  trait AudioCodec extends Serializable {
    /** (sampleRate, channels, interleaved PCM samples). */
    def decodePcm(payload: Array[Byte]): (Int, Int, Array[Short])
  }

  /** Minimal REAL RIFF/WAVE PCM16 parser — dependency-free (no JavaSound),
    * deterministic, and strict: anything that is not a well-formed RIFF
    * container holding a PCM (format 1) 16-bit `fmt ` chunk and an intact
    * `data` chunk throws `IllegalArgumentException` with the payload
    * length — the [[ImageIOCodec]] contract applied to audio. Chunk
    * walking honors the RIFF word-alignment rule (odd-sized chunks pad one
    * byte) and tolerates extra chunks (LIST/fact/cue) in any order, so
    * real exporter output parses, not just textbook 44-byte files.
    * Samples decode little-endian, channels stay interleaved (frame
    * features fold across channels — energy and crossings of the mixed
    * stream, the triage-level semantics). */
  object WavCodec extends AudioCodec {
    def decodePcm(payload: Array[Byte]): (Int, Int, Array[Short]) = {
      def fail(msg: String): Nothing = throw new IllegalArgumentException(
        s"undecodable WAV payload (${payload.length} bytes): $msg")
      if (payload.length < 12) fail("shorter than a RIFF header")
      def tag(off: Int) = new String(payload, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (tag(0) != "RIFF") fail("missing RIFF magic")
      if (tag(8) != "WAVE") fail("missing WAVE form type")
      var pos = 12
      var haveFmt = false
      var audioFormat = 0; var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = -1
      while (pos + 8 <= payload.length && !(haveFmt && dataOff >= 0)) {
        val id = tag(pos)
        val size = bb.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > payload.length)
          fail(s"chunk '$id' overruns the payload")
        if (id == "fmt ") {
          if (size < 16) fail(s"fmt chunk too small ($size bytes)")
          audioFormat = bb.getShort(pos + 8) & 0xffff
          channels = bb.getShort(pos + 10) & 0xffff
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
          haveFmt = true
        } else if (id == "data") {
          dataOff = pos + 8; dataLen = size
        }
        pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (!haveFmt) fail("no fmt chunk")
      if (dataOff < 0) fail("no data chunk")
      if (audioFormat != 1) fail(s"not PCM (format $audioFormat)")
      if (bits != 16) fail(s"not 16-bit ($bits)")
      if (channels < 1) fail("zero channels")
      if (sampleRate < 1) fail(s"bad sample rate $sampleRate")
      if (dataLen % 2 != 0) fail(s"odd data length $dataLen for 16-bit PCM")
      val n = dataLen / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = bb.getShort(dataOff + 2 * i); i += 1 }
      (sampleRate, channels, out)
    }

    /** Write-side counterpart of [[decodePcm]]: a canonical little-endian
      * RIFF/WAVE PCM16 container around the given interleaved samples.
      * `junkChunk = true` inserts an odd-sized `LIST` chunk between
      * `fmt ` and `data` — exporters do this (metadata blocks), and the
      * odd size forces the pad byte the RIFF word-alignment rule demands,
      * so round-tripping through encode(junk)→decode exercises the chunk
      * walker, not just the textbook 44-byte layout. Deterministic: same
      * inputs, same bytes. */
    def encodePcm16(sampleRate: Int, channels: Int, samples: Array[Short],
                    junkChunk: Boolean = false): Array[Byte] = {
      require(sampleRate >= 1, s"bad sample rate $sampleRate")
      require(channels >= 1, s"zero channels")
      val junk: Array[Byte] = if (junkChunk) {
        // 5-byte INFO payload → odd chunk size → 1 pad byte
        val payload = "INFOx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val b = java.nio.ByteBuffer.allocate(8 + payload.length + 1)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("LIST".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        b.putInt(payload.length)
        b.put(payload)
        b.put(0.toByte) // word-alignment pad, NOT counted in the chunk size
        b.array()
      } else Array.emptyByteArray
      val dataLen = samples.length * 2
      val riffLen = 4 + (8 + 16) + junk.length + (8 + dataLen)
      val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(riffLen)
      bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2) // byte rate
      bb.putShort((channels * 2).toShort)  // block align
      bb.putShort(16)                      // bits per sample
      bb.put(junk)
      bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
  }

  /** [[audioFrameFeatures]] over REAL decoded PCM: decode each payload
    * once through the [[AudioCodec]], slice `nFrames` evenly-spaced
    * windows of `frameSamples` interleaved samples, and emit the same
    * RMS-energy / zero-crossing features — now in true 16-bit sample
    * space instead of the stub's byte space. Offsets use the
    * [[sampleFrames]] spacing rule (frame i starts at
    * `i·(len−frame)/(n−1)`, clamped ≥ 0), so frame selection semantics
    * match the stub path exactly. Empty data chunks yield no frames for
    * that row. Strict decode contract; use
    * [[tryAudioFrameFeaturesPcm]] for crawled corpora. */
  def audioFrameFeaturesPcm(media: DataFrame, codec: AudioCodec,
                            nFrames: Int,
                            frameSamples: Int = 1024): Dataset[AudioFrameFeatures] = {
    require(nFrames >= 1 && nFrames <= 1024, s"nFrames ($nFrames) must be in [1, 1024]")
    require(frameSamples >= 2, s"frameSamples ($frameSamples) must be >= 2")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec // per-partition instance
        it.flatMap { r =>
          val (_, _, samples) = c.decodePcm(r.payload)
          frameFeaturesOf(r.doc_id, samples, nFrames, frameSamples)
        }
      }
  }

  /** [[AudioFrameFeatures]] with a quarantine lane: one error row (null
    * features) per undecodable payload instead of a failed 100 TB stage —
    * the [[tryExtractFeatures]] contract for audio. */
  final case class AudioFramesOrError(doc_id: Long, frame_idx: Option[Int],
                                      n_samples: Option[Int], rms: Option[Double],
                                      zero_crossings: Option[Long],
                                      decode_error: Option[String])

  /** Quarantining [[audioFrameFeaturesPcm]]: decode failures become one
    * `decode_error` row per payload; good payloads emit their frame rows
    * with a null error. Split on `decode_error.isNull`. Only non-fatal
    * errors are caught. */
  def tryAudioFrameFeaturesPcm(media: DataFrame, codec: AudioCodec,
                               nFrames: Int,
                               frameSamples: Int = 1024): Dataset[AudioFramesOrError] = {
    require(nFrames >= 1 && nFrames <= 1024, s"nFrames ($nFrames) must be in [1, 1024]")
    require(frameSamples >= 2, s"frameSamples ($frameSamples) must be >= 2")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec
        it.flatMap { r =>
          try {
            val (_, _, samples) = c.decodePcm(r.payload)
            frameFeaturesOf(r.doc_id, samples, nFrames, frameSamples).map(f =>
              AudioFramesOrError(f.doc_id, Some(f.frame_idx), Some(f.n_samples),
                Some(f.rms), Some(f.zero_crossings), None))
          } catch {
            case scala.util.control.NonFatal(e) =>
              Seq(AudioFramesOrError(r.doc_id, None, None, None, None,
                Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")))
          }
        }
      }
  }

  /** Shared frame slicing + RMS/zero-crossing math over decoded samples:
    * exact integer sum-of-squares, one exact division, one
    * correctly-rounded sqrt (the [[audioFrameFeatures]] determinism
    * argument, sample-typed). */
  private def frameFeaturesOf(docId: Long, samples: Array[Short],
                              nFrames: Int,
                              frameSamples: Int): Seq[AudioFrameFeatures] = {
    val len = samples.length
    if (len == 0) Seq.empty
    else (0 until nFrames).map { i =>
      val off = if (nFrames == 1) 0L
        else (i.toLong * math.max(len - frameSamples, 0)) / math.max(nFrames - 1, 1)
      val end = math.min(off.toInt + frameSamples, len)
      var sumSq = 0L
      var zc = 0L
      var j = off.toInt
      while (j < end) {
        val x = samples(j).toLong
        sumSq += x * x
        if (j > off.toInt) {
          val p = samples(j - 1)
          if ((p < 0 && x >= 0) || (p >= 0 && x < 0)) zc += 1
        }
        j += 1
      }
      val n = end - off.toInt
      AudioFrameFeatures(docId, i, n, math.sqrt(sumSq.toDouble / n), zc)
    }
  }

  final case class MediaHash(doc_id: Long, phash: Long)

  /** Perceptual average-hash (aHash) per media row: decode to an 8×8
    * grayscale grid via the codec, threshold each pixel against the grid
    * mean → 64 bits. Robust to re-encoding, resizing and mild edits —
    * the image counterpart of SimHash for text, and the first stage of
    * image dedup over a crawled corpus. Same batched mapPartitions seam
    * as [[extractFeatures]] (one codec per partition, iterator-streamed);
    * undecodable payloads throw under the strict codec — route crawled
    * corpora through a quarantine pass first. */
  def perceptualHash(media: DataFrame, codec: Codec = StubCodec): Dataset[MediaHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("modality"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        val c = codec
        it.map { r =>
          val px = c.grayPixels(r.payload, r.modality, 8, 8)
          // integer mean (floor) — deterministic, no double accumulation
          val mean = px.map(_.toLong).sum / 64L
          var bits = 0L
          var i = 0
          while (i < 64) { if (px(i) > mean) bits |= (1L << i); i += 1 }
          MediaHash(r.doc_id, bits)
        }
      }
  }

  /** Near-duplicate image pairs by phash Hamming distance, banded like
    * SimHash/MinHash: the 64-bit hash splits into `bands` equal chunks and
    * only rows sharing a chunk value meet (pigeonhole: any pair within
    * `bands − 1` bits shares at least one clean band — full recall for
    * `maxDist < bands`). One chunk-keyed shuffle; per-chunk fan-out is
    * bounded by how many images share 16 identical bits, the usual
    * blocking trade. Output: `(id_a, id_b, dist)`, `id_a < id_b`. */
  /** The per-band `(band, chunk)` struct array of a 64-bit hash. The
    * mask must special-case `width = 64` (bands = 1): `(1L << 64) - 1`
    * silently wraps to 0 on the JVM (shift distance is mod 64), which
    * would collapse EVERY hash into chunk 0. */
  private def bandedChunks(phash: Column, bands: Int): Column = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(phash, b * width)
          .bitwiseAND(lit(mask)).as("chunk"))): _*)
  }

  def phashNearDupPairs(hashes: Dataset[MediaHash], maxDist: Int = 3,
                        bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands ($bands) must divide 64")
    require(maxDist >= 0 && maxDist < bands,
      s"full recall needs maxDist ($maxDist) < bands ($bands) — raise bands or lower maxDist")
    val spark = hashes.sparkSession
    import spark.implicits._
    val banded = hashes.toDF()
      .select(col("doc_id"), col("phash"),
        explode(bandedChunks(col("phash"), bands)).as("bk"))
      .select(col("doc_id"), col("phash"), col("bk.band"), col("bk.chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** One frame's perceptual hash. */
  final case class FrameHash(doc_id: Long, frame_idx: Int, phash: Long)

  /** Per-frame aHash: [[sampleFrames]]' evenly-spaced windows, each hashed
    * by the [[perceptualHash]] grid rule. The codec's `modality` is passed
    * as "image" — a real video codec would decode keyframes at timestamps;
    * the byte-window stub keeps schema, fan-out and determinism identical
    * (the brief's stub-the-codec contract). */
  def frameHashes(media: DataFrame, n: Int, frameBytes: Int = 32,
                  codec: Codec = StubCodec): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    sampleFrames(media, n, frameBytes).mapPartitions { it =>
      val c = codec
      it.map { f =>
        val px = c.grayPixels(f.frame, "image", 8, 8)
        val mean = px.map(_.toLong).sum / 64L
        var bits = 0L
        var i = 0
        while (i < 64) { if (px(i) > mean) bits |= (1L << i); i += 1 }
        FrameHash(f.doc_id, f.frame_idx, bits)
      }
    }
  }

  /** Video-style near-duplicate detection by FRAME VOTING: two media rows
    * pair iff at least `minMatching` of their `nFrames` temporally-aligned
    * sampled frames hash within `maxDist` Hamming bits — re-encoded or
    * tail-edited copies keep most aligned frames near-identical, while a
    * single shared still (an intro card, a watermark frame) cannot clear
    * the vote. Output `(id_a, id_b, n_matching)`, `id_a < id_b`,
    * `n_matching` the EXACT count of matching frame positions.
    *
    * Recall: per frame the banded chunk join has full recall for
    * `dist < bands` (pigeonhole, [[phashNearDupPairs]]); a qualifying pair
    * has ≥ `minMatching` such frames, every one of which is found — so the
    * vote count is exact and no qualifying pair is missed.
    *
    * Scale shape for 100 TB: frame hashing is one map pass (frames ×
    * 64-byte grids, iterator-streamed); the hashes are materialized ONCE
    * behind a lazy localCheckpoint (the banded self-join reads both
    * sides). The join keys on `(frame_idx, band, chunk)` with members
    * RANK-CAPPED at `maxBucket` per bucket (the
    * [[graft.operators.Dedup.minhashCandidatePairs]] contract): an
    * over-cap bucket is boilerplate structure — solid frames, letterboxed
    * stills — whose pair fan-out would be quadratic; audit candidates
    * with [[phashBucketProfile]] per frame slot before trusting a new
    * corpus. Capping weakens the vote count for pairs whose matching
    * frames ALL sit beyond the cap in EVERY band — the degenerate regime
    * by construction. The vote is one pair-keyed count; no stage touches
    * payload bytes after the hash pass. */
  def videoNearDupPairs(media: DataFrame, nFrames: Int = 8,
                        frameBytes: Int = 32, maxDist: Int = 3,
                        bands: Int = 4, minMatching: Int = 6,
                        maxBucket: Int = 256,
                        codec: Codec = StubCodec): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands ($bands) must divide 64")
    require(maxDist >= 0 && maxDist < bands,
      s"full recall needs maxDist ($maxDist) < bands ($bands)")
    require(minMatching >= 1 && minMatching <= nFrames,
      s"minMatching ($minMatching) must be in [1, nFrames=$nFrames]")
    require(maxBucket >= 2, s"maxBucket ($maxBucket) must be >= 2 to emit any pair")
    val fh = frameHashes(media, nFrames, frameBytes, codec).toDF()
      .localCheckpoint(false)
    val banded = fh.select(col("doc_id"), col("frame_idx"), col("phash"),
        explode(bandedChunks(col("phash"), bands)).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("phash"),
        col("bk.band").as("band"), col("bk.chunk").as("chunk"))
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("frame_idx", "band", "chunk").orderBy("doc_id")))
      .filter(col("_r") <= maxBucket)
      .drop("_r")
    banded.as("a")
      .join(banded.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.frame_idx").as("frame_idx"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("int").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_matching"))
      .filter(col("n_matching") >= minMatching)
  }

  /** Band-bucket occupancy audit for [[phashNearDupPairs]] — the image
    * mirror of `Dedup.minhashBucketProfile`: run it BEFORE the pair join
    * on a new corpus to find boilerplate buckets (solid-color frames,
    * letterboxed stills, shared watermarks collapse to identical hash
    * chunks the same way boilerplate text collapses MinHash bands). A
    * bucket of size s fans out to s·(s−1)/2 comparisons, so the largest
    * `n_members` here bound the join's hot keys. Output:
    * `(band, chunk, n_members)`, largest first. */
  def phashBucketProfile(hashes: Dataset[MediaHash], bands: Int = 4,
                         minSize: Int = 2): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands ($bands) must divide 64")
    hashes.toDF()
      .select(col("doc_id"),
        explode(bandedChunks(col("phash"), bands)).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.chunk").as("chunk"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= minSize)
      .orderBy(col("n_members").desc, col("band"), col("chunk"))
  }
}
