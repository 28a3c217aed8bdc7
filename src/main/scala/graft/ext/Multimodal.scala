package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-item decode/feature steps run as partition-local transformations
  * over typed Datasets (the JVM analog of `mapInPandas`: one iterator per
  * partition, vectorizable batch shape, no driver round-trips).
  *
  * Decode is REAL for every format the JVM handles: PPM/P6 images, PNG
  * (hand-rolled zero-dependency path — full chunk walk, IDAT inflate,
  * None/Sub/Up/Average/Paeth unfiltering over java.util.zip), RIFF/WAVE
  * 16-bit PCM audio, video as a concatenated stream of P6 frames, and —
  * via `javax.imageio` (java.desktop ships with this JDK) — JPEG, BMP,
  * GIF and the other ImageIO reader formats. Only codecs the JDK
  * genuinely lacks (MP3, H.264) fall back to [[MediaCodec.decodeOpaque]]
  * — a clearly-marked byte-level fallback at the codec boundary; swapping
  * in such a codec changes that one function.
  *
  * Scale notes: payloads never pass through a shuffle here — all steps are
  * narrow (mapPartitions over the scan). For real pipelines the table is
  * written with a size-bucketed partition column so skewed large videos
  * don't straggle one task; `repartitionBySize` provides that key.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata (FIXTURES-style). */
  case class MediaRow(
      media_id: Long,
      kind: String,       // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      signal_len: Int,             // decoded samples/subpixels, not payload bytes
      byte_histogram: Array[Long], // 16 bins over the normalized 0..255 signal
      mean_byte: Double,           // mean of the normalized signal
      decoded_checksum: Long)      // checksum over the decoded signal

  /** The codec boundary. PPM (P6), PNG, WAV (PCM16 mono) and
    * concatenated-P6 "video" are decoded for real in pure JVM code; other
    * image formats (JPEG, BMP, GIF, …) decode through `javax.imageio`.
    * Only payloads no JDK decoder understands (MP3, H.264) fall back to
    * [[decodeOpaque]].
    *
    * All decoders are total: a corrupt payload degrades to the opaque
    * fallback instead of failing the task — at 100 TB a handful of bad rows
    * must not kill a stage.
    */
  object MediaCodec {

    /** Binary PPM (P6): "P6\n<w> <h>\n255\n" + w*h*3 RGB bytes. */
    def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != $width*$height*3")
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Parse one P6 frame starting at `offset`. Returns
      * (width, height, rgb, bytesConsumed) or None on malformed input.
      * Handles arbitrary whitespace and `#` comment lines in the header.
      */
    def decodePpmAt(payload: Array[Byte], offset: Int): Option[(Int, Int, Array[Byte], Int)] = {
      var pos = offset
      def skipSpaceAndComments(): Unit = {
        var going = true
        while (going && pos < payload.length) {
          val c = payload(pos)
          if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
          else going = false
        }
      }
      def readInt(): Option[Int] = {
        skipSpaceAndComments()
        var v = 0; var any = false
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); any = true; pos += 1
        }
        if (any) Some(v) else None
      }
      if (pos + 2 > payload.length || payload(pos) != 'P' || payload(pos + 1) != '6') return None
      pos += 2
      for {
        w <- readInt(); h <- readInt(); maxval <- readInt()
        if maxval == 255 && w > 0 && h > 0
        // exactly one whitespace byte separates the header from the raster
        _ <- if (pos < payload.length) { pos += 1; Some(()) } else None
        // raster size computed in Long: a corrupt header declaring huge
        // dimensions must degrade to None, not overflow Int and crash
        nL = w.toLong * h * 3
        if pos + nL <= payload.length
        n = nL.toInt // safe: bounded by payload.length above
      } yield {
        val rgb = java.util.Arrays.copyOfRange(payload, pos, pos + n)
        (w, h, rgb, pos + n - offset)
      }
    }

    def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      decodePpmAt(payload, 0).map { case (w, h, rgb, _) => (w, h, rgb) }

    /** Video-as-P6-stream: back-to-back P6 frames (all same dimensions). */
    def decodePpmStream(payload: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
      val frames = Seq.newBuilder[(Int, Int, Array[Byte])]
      var pos = 0
      var ok = true
      while (ok && pos < payload.length) {
        decodePpmAt(payload, pos) match {
          case Some((w, h, rgb, consumed)) => frames += ((w, h, rgb)); pos += consumed
          case None => ok = false
        }
      }
      if (ok) frames.result() else Seq.empty
    }

    def encodePpmStream(frames: Seq[(Int, Int, Array[Byte])]): Array[Byte] =
      frames.iterator.flatMap { case (w, h, rgb) => encodePpm(w, h, rgb) }.toArray

    /** RIFF/WAVE, PCM, 16-bit mono, little-endian. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize).put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)                 // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16)                // block align, bits/sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(s => bb.putShort(s))
      bb.array()
    }

    /** Walks RIFF chunks (not fixed offsets — extra chunks are legal). */
    def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
      if (payload.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag4(at: Int): String =
        new String(payload, at, 4, "US-ASCII")
      if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
      var pos = 12
      var sampleRate = -1
      var bitsPerSample = -1
      var data: Array[Short] = null
      while (pos + 8 <= payload.length) {
        val id = tag4(pos)
        val size = bb.getInt(pos + 4)
        if (size < 0 || pos + 8 + size > payload.length) return None
        id match {
          case "fmt " if size >= 16 =>
            val audioFormat = bb.getShort(pos + 8)
            val numChannels = bb.getShort(pos + 10)
            // contract is PCM 16-bit MONO: multi-channel data would decode
            // as channel-interleaved "mono" (wrong sample count, broken
            // downsampling), so it degrades to the opaque fallback instead
            if (audioFormat != 1 || numChannels != 1) return None
            sampleRate = bb.getInt(pos + 12)
            bitsPerSample = bb.getShort(pos + 22)
          case "data" =>
            if (bitsPerSample != 16) return None // fmt must precede data
            val n = size / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = bb.getShort(pos + 8 + i * 2); i += 1 }
            data = out
          case _ => // skip unknown chunks (LIST, fact, ...)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (sampleRate > 0 && data != null) Some((sampleRate, data)) else None
    }

    // ── PNG (8-bit depth, non-interlaced, gray/RGB/gray+alpha/RGBA) ──────
    // zlib ships in the JDK (java.util.zip), so PNG — a genuinely
    // compressed format — decodes for real here: chunk walk, concatenated
    // IDAT inflate, and per-row unfiltering (None/Sub/Up/Average/Paeth).

    private val pngSignature =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    private def crc32(bytes: Array[Byte]*): Int = {
      val c = new java.util.zip.CRC32
      bytes.foreach(c.update)
      c.getValue.toInt
    }

    /** Minimal RGB PNG writer: filter-0 rows, one IDAT, correct CRCs. */
    def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3)
      val raw = new Array[Byte](height * (1 + width * 3))
      var y = 0
      while (y < height) {
        System.arraycopy(rgb, y * width * 3, raw, y * (1 + width * 3) + 1, width * 3)
        y += 1
      }
      val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      deflater.setInput(raw); deflater.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val idat = buf.toByteArray
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .array()
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val t = tag.getBytes("US-ASCII")
        java.nio.ByteBuffer.allocate(12 + data.length)
          .putInt(data.length).put(t).put(data).putInt(crc32(t, data)).array()
      }
      pngSignature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** PNG decode → (width, height, RGB triplets). Gray replicates to RGB,
      * alpha drops — the uniform image-signal contract of this module. */
    def decodePng(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 8 + 25 || !payload.take(8).sameElements(pngSignature)) return None
      val bb = java.nio.ByteBuffer.wrap(payload)
      var pos = 8
      var w = 0; var h = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var sawEnd = false
      while (!sawEnd && pos + 8 <= payload.length) {
        val len = bb.getInt(pos)
        if (len < 0 || pos + 12 + len > payload.length) return None
        new String(payload, pos + 4, 4, "US-ASCII") match {
          case "IHDR" if len == 13 =>
            w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
            val depth = payload(pos + 16); colorType = payload(pos + 17)
            val interlace = payload(pos + 20)
            if (depth != 8 || interlace != 0 ||
              !Set(0, 2, 4, 6).contains(colorType & 0xff)) return None
          case "IDAT" => idat.write(payload, pos + 8, len)
          case "IEND" => sawEnd = true
          case _ => // ancillary chunk (tEXt, pHYs, ...): skip
        }
        pos += 12 + len
      }
      if (w <= 0 || h <= 0 || idat.size == 0) return None
      val bpp = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
      // dimension sanity in Long: a corrupt IHDR declaring billions of
      // pixels must return None, not wrap Int and throw on allocation
      if (w.toLong * h > (1L << 26) || w.toLong * h * (bpp + 1) + h > Int.MaxValue) return None
      val stride = w * bpp
      val raw = new Array[Byte](h * (1 + stride))
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      try {
        var off = 0
        while (!inflater.finished() && off < raw.length) {
          val n = inflater.inflate(raw, off, raw.length - off)
          if (n == 0 && inflater.needsInput()) return None // truncated stream
          off += n
        }
        if (off != raw.length) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inflater.end()
      // unfilter in place into `img` (RFC 2083 §6): a = left, b = up, c = up-left
      val img = new Array[Byte](h * stride)
      var y = 0
      while (y < h) {
        val filter = raw(y * (1 + stride)) & 0xff
        val rowIn = y * (1 + stride) + 1
        var x = 0
        while (x < stride) {
          val a = if (x >= bpp) img(y * stride + x - bpp) & 0xff else 0
          val b = if (y > 0) img((y - 1) * stride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) img((y - 1) * stride + x - bpp) & 0xff else 0
          val v = raw(rowIn + x) & 0xff
          val out = filter match {
            case 0 => v
            case 1 => v + a
            case 2 => v + b
            case 3 => v + (a + b) / 2
            case 4 => // Paeth predictor
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          img(y * stride + x) = out.toByte
          x += 1
        }
        y += 1
      }
      // normalize to RGB triplets
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        colorType match {
          case 0 => val g = img(i); rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
          case 4 => val g = img(i * 2); rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
          case 2 => System.arraycopy(img, i * 3, rgb, i * 3, 3)
          case _ => System.arraycopy(img, i * 4, rgb, i * 3, 3)
        }
        i += 1
      }
      Some((w, h, rgb))
    }

    /** Fallback for payloads no JDK decoder understands (codecs the JDK
      * genuinely lacks: MP3, H.264). Byte-level signal; deterministic. */
    def decodeOpaque(payload: Array[Byte]): Array[Int] =
      payload.map(b => b & 0xff)

    // ── javax.imageio (JPEG, BMP, GIF, and the other JDK reader formats) ─
    // java.desktop ships with this JDK (ImageIO.getReaderFormatNames lists
    // 16 formats including JPEG); no external library involved.

    /** Decode any ImageIO-readable payload (JPEG/BMP/GIF/…); pixels
      * normalized to RGB triplets like every other image decoder here.
      * Total: unreadable or absurdly-sized payloads return None — the
      * dimension guard reads the HEADER ONLY (ImageReader.getWidth/Height)
      * before any pixel allocation, so a few-KB decompression bomb
      * declaring a 50000×50000 raster is rejected without ever allocating
      * it (an after-the-fact check on `ImageIO.read`'s result would OOM
      * the task first). */
    def decodeImageIO(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      var iis: javax.imageio.stream.ImageInputStream = null
      var reader: javax.imageio.ImageReader = null
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        reader = readers.next()
        reader.setInput(iis)
        val w = reader.getWidth(0); val h = reader.getHeight(0) // header-only
        if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) None
        else {
          val img = reader.read(0)
          val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk, not per-pixel
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            rgb(i * 3) = ((p >> 16) & 0xff).toByte
            rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
            rgb(i * 3 + 2) = (p & 0xff).toByte
            i += 1
          }
          Some((w, h, rgb))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally {
        if (reader != null) reader.dispose()
        if (iis != null) try iis.close() catch { case scala.util.control.NonFatal(_) => () }
      }
    }

    /** Encode RGB triplets with an ImageIO writer (`"jpeg"`, `"bmp"`,
      * `"gif"`, `"png"`) — the fixture-side twin of [[decodeImageIO]]. */
    def encodeImageIO(format: String, width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3)
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < width * height) {
        img.setRGB(i % width, i / width,
          ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff))
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      // write() returns false (writing nothing) when no writer exists for
      // the format — an empty payload here would read downstream as a
      // corrupt input instead of a caller error
      require(javax.imageio.ImageIO.write(img, format, out),
        s"no ImageIO writer for format '$format'")
      out.toByteArray
    }

    /** Image decode: the zero-dependency hand-rolled paths first (PNG by
      * signature, then PPM), then `javax.imageio` for everything else the
      * JDK reads (JPEG/BMP/GIF, plus PNG variants outside the hand-rolled
      * subset, e.g. 16-bit or interlaced). */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      decodePng(payload).orElse(decodePpm(payload)).orElse(decodeImageIO(payload))

    /** Decode to a normalized 0..255 signal: image subpixels as-is, audio
      * samples shifted from [-32768,32767], video frames concatenated. */
    def decode(kind: String, payload: Array[Byte]): Array[Int] = kind match {
      case "image" =>
        decodeImage(payload).map(_._3.map(b => b & 0xff)).getOrElse(decodeOpaque(payload))
      case "audio" =>
        decodeWav(payload).map(_._2.map(s => (s + 32768) >> 8)).getOrElse(decodeOpaque(payload))
      case "video" =>
        val frames = decodePpmStream(payload)
        if (frames.nonEmpty) frames.iterator.flatMap(_._3.iterator.map(b => b & 0xff)).toArray
        else decodeOpaque(payload)
      case _ => decodeOpaque(payload)
    }
  }

  /** Deterministic synthetic media table with REAL payloads: P6 images,
    * PCM16 WAV audio, P6-stream video — the fixture generator. */
  def sampleMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      (i % 3).toInt match {
        case 0 => // image: alternate PPM / PNG payloads
          val w = 8 + (i % 9).toInt; val h = 6 + (i % 7).toInt
          val rgb = Array.tabulate[Byte](w * h * 3)(j => ((i * 131 + j * 7) % 256).toByte)
          val payload =
            if ((i / 3) % 2 == 0) MediaCodec.encodePpm(w, h, rgb)
            else MediaCodec.encodePng(w, h, rgb)
          MediaRow(i, "image", payload, w, h, 0, 1)
        case 1 => // audio
          val nSamp = 64 + (i % 128).toInt
          val samples = Array.tabulate[Short](nSamp)(j => ((i * 37 + j * 613) % 24001 - 12000).toShort)
          MediaRow(i, "audio", MediaCodec.encodeWav(8000, samples), 0, 0, 8000, 1)
        case _ => // video
          val w = 6 + (i % 5).toInt; val h = 4 + (i % 4).toInt
          val frames = 2 + (i % 6).toInt
          val payload = MediaCodec.encodePpmStream((0 until frames).map { f =>
            (w, h, Array.tabulate[Byte](w * h * 3)(j => ((i * 131 + f * 17 + j * 7) % 256).toByte))
          })
          MediaRow(i, "video", payload, w, h, 0, frames)
      }
    }
  }

  /** Partition-local feature extraction (the mapInPandas analog):
    * real decode, then histogram + mean + checksum over the signal. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val signal = MediaCodec.decode(r.kind, r.payload)
        val hist = new Array[Long](16)
        var sum = 0L
        var checksum = 1L
        signal.foreach { v =>
          hist(v >> 4) += 1
          sum += v
          checksum = (checksum * 31 + v) % 1000000007L
        }
        MediaFeatures(r.media_id, r.kind, r.payload.length, signal.length, hist,
          if (signal.isEmpty) 0.0 else sum.toDouble / signal.length, checksum)
      }
    }
  }

  /** Real image resize: decode, nearest-neighbor resample to targetW×targetH,
    * re-encode. Applies per frame for video; audio passes through (see
    * [[downsampleAudio]]). Narrow — no shuffle. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    def resample(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
      Array.tabulate[Byte](targetW * targetH * 3) { j =>
        val px = j / 3; val ch = j % 3
        val x = (px % targetW) * w / targetW
        val y = (px / targetW) * h / targetH
        rgb((y * w + x) * 3 + ch)
      }
    media.map { r =>
      r.kind match {
        case "image" =>
          // decode ONCE, remembering which format claimed the payload
          MediaCodec.decodePng(r.payload) match {
            case Some((w, h, rgb)) =>
              r.copy(payload = MediaCodec.encodePng(targetW, targetH, resample(w, h, rgb)),
                width = targetW, height = targetH)
            case None =>
              MediaCodec.decodePpm(r.payload) match {
                case Some((w, h, rgb)) =>
                  r.copy(payload = MediaCodec.encodePpm(targetW, targetH, resample(w, h, rgb)),
                    width = targetW, height = targetH)
                case None =>
                  // ImageIO formats (JPEG/BMP/GIF) re-encode as PNG: the
                  // resized payload stays lossless and deterministic
                  // regardless of the (lossy, encoder-dependent) input codec
                  MediaCodec.decodeImageIO(r.payload).fold(r) { case (w, h, rgb) =>
                    r.copy(payload = MediaCodec.encodePng(targetW, targetH, resample(w, h, rgb)),
                      width = targetW, height = targetH)
                  }
              }
          }
        case "video" =>
          val frames = MediaCodec.decodePpmStream(r.payload)
          if (frames.isEmpty) r
          else r.copy(
            payload = MediaCodec.encodePpmStream(frames.map { case (w, h, rgb) =>
              (targetW, targetH, resample(w, h, rgb)) }),
            width = targetW, height = targetH)
        case _ => r
      }
    }
  }

  /** Real audio downsample: decode WAV, keep every `factor`-th sample,
    * re-encode at sampleRate/factor. Non-audio rows pass through. */
  def downsampleAudio(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(factor >= 1)
    media.map { r =>
      if (r.kind != "audio") r
      else MediaCodec.decodeWav(r.payload).fold(r) { case (rate, samples) =>
        val kept = Array.tabulate[Short]((samples.length + factor - 1) / factor)(j => samples(j * factor))
        r.copy(payload = MediaCodec.encodeWav(rate / factor, kept), sample_rate = rate / factor)
      }
    }
  }

  /** Real frame sampling for video rows: decode the P6 stream, keep every
    * k-th frame, re-encode. Non-video rows pass through unchanged. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind != "video") r
      else {
        val frames = MediaCodec.decodePpmStream(r.payload)
        if (frames.isEmpty) r
        else {
          val kept = frames.zipWithIndex.collect { case (f, idx) if idx % everyK == 0 => f }
          r.copy(payload = MediaCodec.encodePpmStream(kept), n_frames = kept.length)
        }
      }
    }
  }

  /** Size-bucketed repartition key so heavyweight payloads spread across
    * tasks instead of stacking in one partition at scale. */
  def repartitionBySize(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, pmod(xxhash64(col("media_id"), length(col("payload"))), lit(partitions)))

  /** 64-bit average-hash (aHash) perceptual fingerprint: block-average the
    * image onto an 8×8 grayscale grid, then set bit i when block i is
    * brighter than the global mean. Integer-exact throughout (block/global
    * means compared by cross-multiplication, no division), so the hash is
    * bit-stable across platforms; near-identical images — recompressions,
    * small edits, resizes — land within a few bits of each other, which is
    * the property image dedup banding exploits. */
  def averageHash(w: Int, h: Int, rgb: Array[Byte]): Long = {
    require(rgb.length == w * h * 3 && w > 0 && h > 0)
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val p = (y * w + x) * 3
        sum(by * 8 + bx) += (rgb(p) & 0xff) + (rgb(p + 1) & 0xff) + (rgb(p + 2) & 0xff)
        cnt(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    val total = sum.sum
    val totalCnt = cnt.sum
    var hash = 0L
    var i = 0
    while (i < 64) {
      // block mean > global mean ⟺ sum_i·totalCnt > total·cnt_i; products
      // stay under 2^63 for any image up to 256×256 blocks of 16-bit pixels
      if (cnt(i) > 0 && sum(i) * totalCnt > total * cnt(i)) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Per-image aHash fingerprints for every decodable image row —
    * partition-local decode (the mapInPandas analog), no shuffle. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(col("kind") === "image")
      .flatMap { r =>
        MediaCodec.decodeImage(r.payload).map { case (w, h, rgb) =>
          (r.media_id, averageHash(w, h, rgb))
        }
      }
      .toDF("media_id", "ahash")
  }

  /** Image near-duplicate pairs by banded aHash: the 64-bit fingerprint
    * splits into 4×16-bit bands; a candidate pair must agree on at least
    * one band (pigeonhole: guaranteed for Hamming distance ≤ 3, probable
    * well past that), then the exact Hamming distance filters to
    * `maxHamming`. The same bucket-capped self-join contract as MinHash
    * LSH — [[Dedup.saltedBuckets]] bounds degenerate buckets (an all-black
    * corpus) — so candidate volume stays near-linear in corpus size. */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 4,
                    cap: Int = Dedup.DefaultBucketCap): DataFrame =
    bandedHashNearDups(imageHashes(media), maxHamming, cap)

  /** Shared 64-bit-fingerprint near-dup kernel: 4×16-bit banding, salted
    * (band, value) self-join, exact Hamming re-rank — the same
    * bucket-capped contract as MinHash LSH, over any `(media_id, ahash)`
    * frame (image aHash, audio energy hash). */
  private def bandedHashNearDups(hashes: DataFrame, maxHamming: Int,
                                 cap: Int): DataFrame = {
    val banded = Dedup.saltedBuckets(
      hashes.select(
          col("media_id"), col("ahash"),
          posexplode(array((0 until 4).map(b =>
            shiftrightunsigned(col("ahash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
        .withColumnRenamed("pos", "band_id")
        .withColumnRenamed("col", "band_val")
        .localCheckpoint(), // decode + hash once for both join sides
      Seq("band_id", "band_val"), "media_id", cap)
    banded.as("l")
      .join(banded.as("r"),
        col("l.band_id") === col("r.band_id") && col("l.band_val") === col("r.band_val") &&
          col("l.salt") === col("r.salt") && col("l.media_id") < col("r.media_id"))
      .select(
        col("l.media_id").as("media_a"),
        col("r.media_id").as("media_b"),
        col("l.ahash").as("ah_a"),
        col("r.ahash").as("ah_b"))
      .dropDuplicates("media_a", "media_b")
      .withColumn("hamming", bit_count(col("ah_a").bitwiseXOR(col("ah_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_a"), col("media_b"), col("hamming"))
      .orderBy(col("media_a"), col("media_b"))
  }

  /** Gain-invariant audio energy fingerprint: 64 equal time frames, bit f
    * set iff frame mean |amplitude| exceeds the global mean (integer
    * cross-multiplied comparison, like [[averageHash]]'s). Multiplying
    * every sample by a positive gain scales both sides of the comparison
    * equally, so re-levelled copies of a clip hash identically; localized
    * edits flip only their frames' bits. Exact up to 2^24 samples
    * (~6 min at 44.1 kHz): past that `sum·count` would overflow —
    * fingerprint longer audio per segment. */
  def audioHash(samples: Array[Short]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val sum = new Array[Long](64)
    val cnt = new Array[Long](64)
    var i = 0
    while (i < n) {
      val f = (i.toLong * 64 / n).toInt
      sum(f) += math.abs(samples(i).toInt)
      cnt(f) += 1
      i += 1
    }
    val total = sum.sum
    val totalCnt = cnt.sum
    var hash = 0L
    var f = 0
    while (f < 64) {
      if (cnt(f) > 0 && sum(f) * totalCnt > total * cnt(f)) hash |= (1L << f)
      f += 1
    }
    hash
  }

  /** Per-clip energy fingerprints for every decodable audio row. */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          MediaCodec.decodeWav(r.payload).map { case (_, samples) =>
            (r.media_id, audioHash(samples))
          }
        }
      }
      .toDF("media_id", "ahash")
  }

  /** Audio near-duplicate pairs — the [[imageNearDups]] contract over the
    * energy fingerprint: re-encoded/re-levelled copies land at Hamming 0,
    * locally edited clips at small distances. */
  def audioNearDups(media: Dataset[MediaRow], maxHamming: Int = 4,
                    cap: Int = Dedup.DefaultBucketCap): DataFrame =
    bandedHashNearDups(audioHashes(media), maxHamming, cap)

  /** Per-video fingerprints: the XOR-rotated fold of every frame's
    * [[averageHash]]. Rotation makes the fold ORDER-SENSITIVE (a reversed
    * clip hashes differently — plain XOR would collide it) while staying
    * one pass; identical frame sequences hash identically regardless of
    * container chunking, and editing one frame flips only the bits that
    * frame contributed. */
  def videoHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val frames = MediaCodec.decodePpmStream(r.payload)
          if (frames.isEmpty) None
          else Some((r.media_id, frames.foldLeft(0L) { case (acc, (w, h, rgb)) =>
            java.lang.Long.rotateLeft(acc, 1) ^ averageHash(w, h, rgb)
          }))
        }
      }
      .toDF("media_id", "ahash")
  }

  /** Video near-duplicate pairs — the same banded-Hamming kernel over the
    * frame-fold fingerprint. Catches re-chunked/re-wrapped copies and
    * clips with a few edited frames; temporal edits (cuts, reordering)
    * change the fingerprint by design. */
  def videoNearDups(media: Dataset[MediaRow], maxHamming: Int = 4,
                    cap: Int = Dedup.DefaultBucketCap): DataFrame =
    bandedHashNearDups(videoHashes(media), maxHamming, cap)

  // ---------------------------------------------------------------------
  // Documents-seeded media corpora: the oracle bridge for the near-dup
  // layer. Pixel/sample values are integer formulas over (doc_id, n_chars)
  // that DuckDB can compute from the documents table, so the REAL pipeline
  // — encode to PPM/PNG/WAV, decode, fingerprint, banded self-join — is
  // hash-checked against an independent replay of the fingerprint
  // arithmetic. A codec or hash bug breaks the match; only the decode step
  // itself stays Spark-side (it is the identity on these lossless
  // round-trips, which is exactly what the check pins). Same-n_chars
  // documents get identical seeds, so the corpus contains genuine
  // duplicates ACROSS codecs (PPM vs PNG by doc parity) and across gain
  // levels (audio), plus small-Hamming near-dups via the doc-keyed noise
  // term — the shapes image/audio dedup exists for.
  // ---------------------------------------------------------------------

  /** Image corpus seeded by documents: dims from n_chars (so equal-length
    * docs are duplicate candidates), subpixel j =
    * `(n_chars·131 + j·7 + noise) mod 256` with `noise = 8` where
    * `j ≡ doc_id (mod 97)` — a ~1% brightness edit that lands copies a few
    * Hamming bits apart. Even doc_ids encode PPM, odd PNG: byte-identical
    * pixels through two different codecs. */
  def imageCorpusFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nc) =>
      val w = (8 + nc % 9).toInt
      val h = (6 + nc % 7).toInt
      val rgb = Array.tabulate[Byte](w * h * 3) { j =>
        val noise = if (j % 97 == id % 97) 8L else 0L
        ((nc * 131 + j.toLong * 7 + noise) % 256).toByte
      }
      val payload =
        if (id % 2 == 0) MediaCodec.encodePpm(w, h, rgb)
        else MediaCodec.encodePng(w, h, rgb)
      MediaRow(id, "image", payload, w, h, 0, 1)
    }
  }

  /** Audio corpus seeded by documents: clip length and base waveform from
    * n_chars, re-levelled by a per-doc gain `1 + doc_id mod 3` (the energy
    * fingerprint must erase it), plus a +500 spike where
    * `j ≡ doc_id (mod 89)` (the localized edit). Max |sample| =
    * 4000·3 + 500, safely inside PCM16. */
  def audioCorpusFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nc) =>
      val n = (64 + nc % 128).toInt
      val gain = 1 + (id % 3)
      val samples = Array.tabulate[Short](n) { j =>
        val base = (nc * 37 + j.toLong * 613) % 8001 - 4000
        val noise = if (j % 89 == id % 89) 500L else 0L
        (base * gain + noise).toShort
      }
      MediaRow(id, "audio", MediaCodec.encodeWav(8000, samples), 0, 0, 8000, 1)
    }
  }

  /** q121: image near-duplicate pairs over the documents-seeded corpus —
    * the full decode → aHash → banded-Hamming pipeline, oracle-replayed. */
  def imageNearDupsFromDocs(t: graft.core.Tables, maxHamming: Int = 4): DataFrame =
    imageNearDups(imageCorpusFromDocs(t.documents), maxHamming)

  /** q122: audio near-duplicate pairs over the documents-seeded corpus. */
  def audioNearDupsFromDocs(t: graft.core.Tables, maxHamming: Int = 4): DataFrame =
    audioNearDups(audioCorpusFromDocs(t.documents), maxHamming)

  /** Shared oracle tail for the banded-Hamming near-dup twins: replays
    * [[graft.ext.Dedup.saltedBuckets]]'s bucket cap (bucket sizes →
    * ⌈n/cap⌉ splitHash-salted sub-buckets; ≤ cap members ⇒ 1 salt ⇒
    * salt 0 for all — identical to the unsalted join), then computes the
    * exact Hamming ONLY over candidate pairs. The r7 tail computed
    * Hamming over ALL doc pairs (`bands × bands` on band_id alone) before
    * intersecting with candidates — quadratic in corpus size, the reason
    * q121/q122 stayed oracle-gated at sf0.01 (VERDICT r7 item 7). With
    * candidates O(cap·n) and Hamming restricted to them, the twin
    * completes at mid scale AND stays faithful when the cap engages
    * (the r7 tail would diverge from the engine on any over-cap bucket).
    * Expects a `bands(doc_id, band_id, band_val)` CTE in scope. */
  private def bandedNearDupsTailSql(maxHamming: Int, cap: Int): String =
    s"""sizes AS MATERIALIZED (
       |  SELECT band_id, band_val, count(*) AS bucket_n
       |  FROM bands GROUP BY 1, 2),
       |salted AS MATERIALIZED (
       |  SELECT b.doc_id, b.band_id, b.band_val,
       |    (${Sampling.splitHashSql("b.doc_id")})
       |      % ((s.bucket_n + ${cap - 1}) // $cap) AS salt
       |  FROM bands b JOIN sizes s
       |    ON s.band_id = b.band_id AND s.band_val = b.band_val),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS media_a, r.doc_id AS media_b
       |  FROM salted l JOIN salted r
       |    ON l.band_id = r.band_id AND l.band_val = r.band_val
       |       AND l.salt = r.salt AND l.doc_id < r.doc_id)
       |SELECT c.media_a, c.media_b,
       |  CAST(sum(bit_count(xor(lb.band_val, rb.band_val))) AS INTEGER) AS hamming
       |FROM cand c
       |JOIN bands lb ON lb.doc_id = c.media_a
       |JOIN bands rb ON rb.doc_id = c.media_b AND rb.band_id = lb.band_id
       |GROUP BY 1, 2
       |HAVING sum(bit_count(xor(lb.band_val, rb.band_val))) <= $maxHamming
       |ORDER BY 1, 2""".stripMargin

  /** DuckDB twin of [[imageNearDupsFromDocs]]: replays [[averageHash]]'s
    * integer arithmetic (block assignment `(y·8)//h`, cross-multiplied
    * mean comparison) from the seed formulas, assembles the 64-bit hash as
    * 4×16-bit bands (BIGINT-safe — bit 63 of a whole hash would overflow
    * signed SQL arithmetic), and mirrors the salted banded candidate join +
    * candidate-restricted Hamming filter ([[bandedNearDupsTailSql]]). */
  def imageNearDupsSql(maxHamming: Int = 4,
                       cap: Int = Dedup.DefaultBucketCap): String =
    s"""WITH m AS MATERIALIZED (
       |  SELECT doc_id, n_chars, 8 + n_chars % 9 AS w, 6 + n_chars % 7 AS h
       |  FROM documents),
       |px AS MATERIALIZED (
       |  SELECT doc_id,
       |    ((y * 8) // h) * 8 + (x * 8) // w AS blk,
       |    ((n_chars * 131 + ((y * w + x) * 3 + 0) * 7 +
       |       CASE WHEN ((y * w + x) * 3 + 0) % 97 = doc_id % 97 THEN 8 ELSE 0 END) % 256)
       |    + ((n_chars * 131 + ((y * w + x) * 3 + 1) * 7 +
       |       CASE WHEN ((y * w + x) * 3 + 1) % 97 = doc_id % 97 THEN 8 ELSE 0 END) % 256)
       |    + ((n_chars * 131 + ((y * w + x) * 3 + 2) * 7 +
       |       CASE WHEN ((y * w + x) * 3 + 2) % 97 = doc_id % 97 THEN 8 ELSE 0 END) % 256)
       |      AS v
       |  FROM m, unnest(range(0, h)) AS uy(y), unnest(range(0, w)) AS ux(x)),
       |blocks AS MATERIALIZED (
       |  SELECT doc_id, blk, CAST(sum(v) AS BIGINT) AS s, count(*) AS c
       |  FROM px GROUP BY 1, 2),
       |tot AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS total, CAST(sum(c) AS BIGINT) AS totalc
       |  FROM blocks GROUP BY 1),
       |bands AS MATERIALIZED (
       |  -- explicit doc×band grid: an all-zero band must still exist as a
       |  -- row (the engine's posexplode always yields 4 bands), or two
       |  -- blank-band docs would never meet in the candidate join
       |  SELECT t.doc_id, g.band_id,
       |    CAST(coalesce(sum(CASE WHEN b.s * t.totalc > t.total * b.c
       |                  THEN 1 << (b.blk % 16) END), 0) AS BIGINT) AS band_val
       |  FROM tot t CROSS JOIN unnest(range(0, 4)) AS g(band_id)
       |  LEFT JOIN blocks b ON b.doc_id = t.doc_id AND b.blk // 16 = g.band_id
       |  GROUP BY 1, 2),
       |""".stripMargin + bandedNearDupsTailSql(maxHamming, cap)

  /** DuckDB twin of [[audioNearDupsFromDocs]]: replays [[audioHash]]'s
    * frame-energy arithmetic (frame `f = (j·64)//n`, |amplitude| sums,
    * cross-multiplied comparison) from the seed formulas — gain and all —
    * then the same salted banded join ([[bandedNearDupsTailSql]]). */
  def audioNearDupsSql(maxHamming: Int = 4,
                       cap: Int = Dedup.DefaultBucketCap): String =
    s"""WITH m AS MATERIALIZED (
       |  SELECT doc_id, n_chars, 64 + n_chars % 128 AS n, 1 + doc_id % 3 AS gain
       |  FROM documents),
       |samp AS MATERIALIZED (
       |  SELECT doc_id, (j * 64) // n AS f,
       |    abs(((n_chars * 37 + j * 613) % 8001 - 4000) * gain +
       |        CASE WHEN j % 89 = doc_id % 89 THEN 500 ELSE 0 END) AS a
       |  FROM m, unnest(range(0, n)) AS u(j)),
       |frames AS MATERIALIZED (
       |  SELECT doc_id, f, CAST(sum(a) AS BIGINT) AS s, count(*) AS c
       |  FROM samp GROUP BY 1, 2),
       |tot AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS total, CAST(sum(c) AS BIGINT) AS totalc
       |  FROM frames GROUP BY 1),
       |bands AS MATERIALIZED (
       |  SELECT t.doc_id, g.band_id,
       |    CAST(coalesce(sum(CASE WHEN fr.s * t.totalc > t.total * fr.c
       |                  THEN 1 << (fr.f % 16) END), 0) AS BIGINT) AS band_val
       |  FROM tot t CROSS JOIN unnest(range(0, 4)) AS g(band_id)
       |  LEFT JOIN frames fr ON fr.doc_id = t.doc_id AND fr.f // 16 = g.band_id
       |  GROUP BY 1, 2),
       |""".stripMargin + bandedNearDupsTailSql(maxHamming, cap)
}
