package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.MediaCodec
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: real PPM/WAV codecs, partition-local
  * feature extraction, resize / downsample / frame-sample, fallback. */
class MultimodalSpec extends SparkSpec {

  test("PPM P6 round-trip, including comment-bearing headers") {
    val rgb = Array.tabulate[Byte](5 * 4 * 3)(j => (j * 11 % 256).toByte)
    val enc = MediaCodec.encodePpm(5, 4, rgb)
    val Some((w, h, back)) = MediaCodec.decodePpm(enc)
    assert(w == 5 && h == 4 && back.sameElements(rgb))
    // header with a comment line (legal PPM) still parses
    val commented = ("P6\n# made by graft\n5 4\n255\n".getBytes("US-ASCII") ++ rgb)
    val Some((w2, h2, back2)) = MediaCodec.decodePpm(commented)
    assert(w2 == 5 && h2 == 4 && back2.sameElements(rgb))
  }

  test("WAV PCM16 round-trip; unknown RIFF chunks are skipped") {
    val samples = Array.tabulate[Short](300)(j => ((j * 613) % 24001 - 12000).toShort)
    val enc = MediaCodec.encodeWav(8000, samples)
    val Some((rate, back)) = MediaCodec.decodeWav(enc)
    assert(rate == 8000 && back.sameElements(samples))
    // splice an unknown LIST chunk between fmt and data — must still decode
    val bb = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("LIST".getBytes("US-ASCII")).putInt(2).putShort(7)
    val spliced = enc.take(36) ++ bb.array() ++ enc.drop(36)
    // fix RIFF size
    val fixed = spliced.clone()
    val riffSize = spliced.length - 8
    java.nio.ByteBuffer.wrap(fixed, 4, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(riffSize)
    val Some((rate2, back2)) = MediaCodec.decodeWav(fixed)
    assert(rate2 == 8000 && back2.sameElements(samples))
  }

  test("PNG round-trip through the JDK-zlib encoder/decoder") {
    val rgb = Array.tabulate[Byte](7 * 5 * 3)(j => (j * 13 % 256).toByte)
    val enc = MediaCodec.encodePng(7, 5, rgb)
    assert(enc.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
    val Some((w, h, back)) = MediaCodec.decodePng(enc)
    assert(w == 7 && h == 5 && back.sameElements(rgb))
    // PPM decoder must NOT claim it; the image dispatcher must
    assert(MediaCodec.decodePpm(enc).isEmpty)
    assert(MediaCodec.decodeImage(enc).isDefined)
  }

  test("PNG unfiltering handles Sub/Up/Average/Paeth rows") {
    // craft a PNG whose rows use every non-trivial filter; CRCs are not
    // validated by the decoder so the test builds chunks directly
    val w = 4; val h = 4; val bpp = 3
    val rgb = Array.tabulate[Byte](w * h * bpp)(j => ((j * 31 + 7) % 256).toByte)
    def px(y: Int, x: Int): Int = if (x < 0 || y < 0) 0 else rgb(y * w * bpp + x) & 0xff
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val filters = Array(4, 1, 2, 3) // Paeth on y=0 exercises the b=c=0 edge
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(filters(y))
      for (x <- 0 until w * bpp) {
        val v = px(y, x)
        val pred = filters(y) match {
          case 1 => px(y, x - bpp)
          case 2 => px(y - 1, x)
          case 3 => (px(y, x - bpp) + px(y - 1, x)) / 2
          case 4 => paeth(px(y, x - bpp), px(y - 1, x), px(y - 1, x - bpp))
        }
        raw.write((v - pred) & 0xff)
      }
    }
    val d = new java.util.zip.Deflater(); d.setInput(raw.toByteArray); d.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) idat.write(tmp, 0, d.deflate(tmp))
    def chunk(tag: String, data: Array[Byte]): Array[Byte] =
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tag.getBytes("US-ASCII")).put(data).putInt(0).array()
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((dw, dh, back)) = MediaCodec.decodePng(png)
    assert(dw == w && dh == h && back.sameElements(rgb))
  }

  test("PNG grayscale and RGBA normalize to RGB triplets") {
    // build gray (colorType 0) and RGBA (colorType 6) images with filter-0
    // rows through the same chunk assembly
    def build(colorType: Int, bpp: Int, pix: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val raw = new java.io.ByteArrayOutputStream()
      for (y <- 0 until h) {
        raw.write(0)
        raw.write(pix, y * w * bpp, w * bpp)
      }
      val d = new java.util.zip.Deflater(); d.setInput(raw.toByteArray); d.finish()
      val idat = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) idat.write(tmp, 0, d.deflate(tmp))
      def chunk(tag: String, data: Array[Byte]): Array[Byte] =
        java.nio.ByteBuffer.allocate(12 + data.length)
          .putInt(data.length).put(tag.getBytes("US-ASCII")).put(data).putInt(0).array()
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }
    val gray = Array.tabulate[Byte](6)(j => (j * 40).toByte) // 3x2 gray
    val Some((_, _, g)) = MediaCodec.decodePng(build(0, 1, gray, 3, 2))
    assert(g.grouped(3).zip(gray.iterator).forall { case (t, v) => t.forall(_ == v) })
    val rgba = Array.tabulate[Byte](2 * 2 * 4)(j => (j * 11).toByte)
    val Some((_, _, c)) = MediaCodec.decodePng(build(6, 4, rgba, 2, 2))
    val expected = (0 until 4).flatMap(i => rgba.slice(i * 4, i * 4 + 3)).toArray
    assert(c.sameElements(expected))
  }

  test("codec round-trip properties: random sizes and content (seeded)") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 40) {
      // PNG + PPM + BMP: arbitrary dimensions incl. 1-pixel edges
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      for ((enc, name) <- Seq(
          (MediaCodec.encodePng(w, h, rgb), "png"),
          (MediaCodec.encodePpm(w, h, rgb), "ppm"),
          (MediaCodec.encodeImageIO("bmp", w, h, rgb), "bmp"))) {
        val Some((dw, dh, back)) = MediaCodec.decodeImage(enc)
        assert(dw == w && dh == h && back.sameElements(rgb), s"$name ${w}x$h")
      }
      // WAV PCM16: arbitrary lengths incl. zero samples
      val n = rnd.nextInt(500)
      val samples = Array.fill[Short](n)(rnd.nextInt(65536).toShort)
      val Some((rate, sBack)) = MediaCodec.decodeWav(MediaCodec.encodeWav(44100, samples))
      assert(rate == 44100 && sBack.sameElements(samples), s"wav n=$n")
    }
  }

  test("ImageIO path: JPEG is in this JDK; BMP round-trips bit-exact") {
    val fmts = javax.imageio.ImageIO.getReaderFormatNames.map(_.toLowerCase).toSet
    assert(fmts.contains("jpeg") && fmts.contains("bmp"))
    // BMP is lossless RGB: decodeImage must return the exact source raster
    val rgb = Array.tabulate[Byte](9 * 6 * 3)(j => (j * 17 % 256).toByte)
    val bmp = MediaCodec.encodeImageIO("bmp", 9, 6, rgb)
    val Some((w, h, back)) = MediaCodec.decodeImage(bmp)
    assert(w == 9 && h == 6 && back.sameElements(rgb))
  }

  test("JPEG fixture decodes end-to-end; features track the PPM ground truth") {
    import spark.implicits._
    // smooth horizontal gradient: the signal JPEG preserves well, so the
    // decoded features can be compared against the lossless PPM twin
    val w = 32; val h = 24
    val rgb = Array.tabulate[Byte](w * h * 3) { j =>
      val x = (j / 3) % w
      (x * 255 / (w - 1)).toByte
    }
    val jpeg = MediaCodec.encodeImageIO("jpeg", w, h, rgb)
    assert(MediaCodec.decodePng(jpeg).isEmpty && MediaCodec.decodePpm(jpeg).isEmpty,
      "fixture must exercise the ImageIO branch, not the hand-rolled paths")
    val media = Seq(
      Multimodal.MediaRow(0L, "image", jpeg, w, h, 0, 1),
      Multimodal.MediaRow(1L, "image", MediaCodec.encodePpm(w, h, rgb), w, h, 0, 1)).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val Array(jf, pf) = feats
    // both decoded for real: identical signal shape, near-identical stats
    assert(jf.signal_len == w * h * 3 && pf.signal_len == w * h * 3)
    assert(math.abs(jf.mean_byte - pf.mean_byte) < 2.0,
      s"jpeg mean ${jf.mean_byte} vs ppm mean ${pf.mean_byte}")
    // per-pixel: lossy but close on a smooth gradient
    val Some((_, _, jr)) = MediaCodec.decodeImage(jpeg)
    val maxErr = jr.zip(rgb).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 16, s"jpeg max pixel error $maxErr")
  }

  test("resizeImages resamples JPEG inputs via ImageIO, re-encoding as PNG") {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](16 * 12 * 3)(j => ((j / 3) % 256).toByte)
    val jpeg = MediaCodec.encodeImageIO("jpeg", 16, 12, rgb)
    val media = Seq(Multimodal.MediaRow(0L, "image", jpeg, 16, 12, 0, 1)).toDS()
    val out = Multimodal.resizeImages(media, 4, 3).collect().head
    assert(out.width == 4 && out.height == 3)
    val Some((w, h, back)) = MediaCodec.decodePng(out.payload) // lossless re-encode
    assert(w == 4 && h == 3 && back.length == 36)
  }

  test("corrupt payloads fall back to the opaque decoder, never throw") {
    val junk = Array.tabulate[Byte](50)(j => (j * 3).toByte)
    assert(MediaCodec.decode("image", junk).sameElements(MediaCodec.decodeOpaque(junk)))
    assert(MediaCodec.decode("audio", junk).sameElements(MediaCodec.decodeOpaque(junk)))
    assert(MediaCodec.decode("video", junk).sameElements(MediaCodec.decodeOpaque(junk)))
    // truncated PPM (header claims more raster than present) degrades too
    val short = MediaCodec.encodePpm(4, 4, new Array[Byte](48)).dropRight(10)
    assert(MediaCodec.decode("image", short).sameElements(MediaCodec.decodeOpaque(short)))
  }

  test("sampleMedia payloads are real decodable media matching metadata") {
    val rows = Multimodal.sampleMedia(spark, 60).collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      r.kind match {
        case "image" =>
          val Some((w, h, rgb)) = MediaCodec.decodeImage(r.payload)
          assert(w == r.width && h == r.height && rgb.length == w * h * 3)
        case "audio" =>
          val Some((rate, samples)) = MediaCodec.decodeWav(r.payload)
          assert(rate == r.sample_rate && samples.nonEmpty)
        case "video" =>
          val frames = MediaCodec.decodePpmStream(r.payload)
          assert(frames.length == r.n_frames)
          assert(frames.forall { case (w, h, _) => w == r.width && h == r.height })
      }
    }
    // deterministic across invocations
    val again = Multimodal.sampleMedia(spark, 60).collect()
    assert(rows.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("extractFeatures decodes for real: signal length matches media shape") {
    val media = Multimodal.sampleMedia(spark, 60)
    val byId = media.collect().map(r => r.media_id -> r).toMap
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 60)
    feats.foreach { f =>
      val r = byId(f.media_id)
      val expectedLen = r.kind match {
        case "image" => r.width * r.height * 3
        case "audio" => MediaCodec.decodeWav(r.payload).get._2.length
        case "video" => r.n_frames * r.width * r.height * 3
      }
      assert(f.signal_len == expectedLen, s"${f.kind} ${f.media_id}")
      assert(f.n_bytes == r.payload.length)
      assert(f.byte_histogram.length == 16)
      assert(f.byte_histogram.sum == f.signal_len)
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
    }
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.decoded_checksum).sameElements(again.map(_.decoded_checksum)))
  }

  test("resizeImages resamples pixels for images and every video frame") {
    val resized = Multimodal.resizeImages(Multimodal.sampleMedia(spark, 30), 4, 3).collect()
    resized.foreach { r =>
      r.kind match {
        case "image" =>
          val Some((w, h, rgb)) = MediaCodec.decodeImage(r.payload)
          assert(w == 4 && h == 3 && rgb.length == 36 && r.width == 4 && r.height == 3)
        case "video" =>
          val frames = MediaCodec.decodePpmStream(r.payload)
          assert(frames.nonEmpty && frames.forall { case (w, h, rgb) => w == 4 && h == 3 && rgb.length == 36 })
          assert(frames.length == r.n_frames) // frame count preserved
        case _ => assert(MediaCodec.decodeWav(r.payload).isDefined) // untouched
      }
    }
    // resized pixels come from the source raster (nearest neighbor), spot-check 1x1
    val one = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val rgb11 = MediaCodec.decodePpm(
      MediaCodec.encodePpm(2, 2, one)).get._3
    assert(rgb11.sameElements(one))
  }

  test("downsampleAudio halves rate and keeps every 2nd sample") {
    val media = Multimodal.sampleMedia(spark, 30)
    val orig = media.collect().filter(_.kind == "audio").map(r => r.media_id -> r).toMap
    val down = Multimodal.downsampleAudio(media, 2).collect().filter(_.kind == "audio")
    down.foreach { r =>
      val Some((rate, samples)) = MediaCodec.decodeWav(r.payload)
      val Some((origRate, origSamples)) = MediaCodec.decodeWav(orig(r.media_id).payload)
      assert(rate == origRate / 2 && r.sample_rate == rate)
      assert(samples.length == (origSamples.length + 1) / 2)
      assert(samples.zipWithIndex.forall { case (s, j) => s == origSamples(j * 2) })
    }
  }

  test("sampleFrames keeps every k-th decoded frame of video rows") {
    val media = Multimodal.sampleMedia(spark, 30)
    val before = media.collect().map(r => r.media_id -> r).toMap
    val sampled = Multimodal.sampleFrames(media, everyK = 2).collect()
    sampled.foreach { r =>
      val orig = before(r.media_id)
      if (r.kind == "video") {
        val origFrames = MediaCodec.decodePpmStream(orig.payload)
        val keptFrames = MediaCodec.decodePpmStream(r.payload)
        val expected = origFrames.zipWithIndex.collect { case (f, i) if i % 2 == 0 => f }
        assert(r.n_frames == expected.length && keptFrames.length == expected.length)
        keptFrames.zip(expected).foreach { case ((_, _, a), (_, _, b)) => assert(a.sameElements(b)) }
      } else assert(r.payload.sameElements(orig.payload))
    }
  }

  test("repartitionBySize spreads rows across requested partitions") {
    val df = Multimodal.sampleMedia(spark, 200).toDF()
    val parts = Multimodal.repartitionBySize(df, 8)
      .select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1)
  }

  test("averageHash is codec-invariant and tolerant of tiny edits") {
    val w = 32; val h = 24
    // structured image: left half dark, right half bright
    val rgb = Array.tabulate[Byte](w * h * 3) { j =>
      if ((j / 3) % w < w / 2) 20.toByte else 200.toByte
    }
    val base = Multimodal.averageHash(w, h, rgb)
    // same pixels through PNG vs PPM encodings → identical hash
    val viaPng = MediaCodec.decodePng(MediaCodec.encodePng(w, h, rgb)).get
    assert(Multimodal.averageHash(viaPng._1, viaPng._2, viaPng._3) == base)
    // one edited pixel moves the hash at most a few bits
    val edited = rgb.clone(); edited(0) = 255.toByte; edited(1) = 255.toByte
    val hamming = java.lang.Long.bitCount(base ^ Multimodal.averageHash(w, h, edited))
    assert(hamming <= 2, s"tiny edit moved $hamming bits")
    // the inverted image is far away
    val inverted = rgb.map(b => (255 - (b & 0xff)).toByte)
    assert(java.lang.Long.bitCount(base ^ Multimodal.averageHash(w, h, inverted)) >= 32)
  }

  test("imageNearDups pairs the recompressed/edited copies, not the distinct image") {
    import spark.implicits._
    val w = 32; val h = 24
    val rgb = Array.tabulate[Byte](w * h * 3) { j =>
      (((j / 3) % w) * 255 / w).toByte // horizontal gradient
    }
    val edited = rgb.clone(); edited(100) = 0.toByte
    val inverted = rgb.map(b => (255 - (b & 0xff)).toByte)
    val media = Seq(
      Multimodal.MediaRow(0L, "image", MediaCodec.encodePpm(w, h, rgb), w, h, 0, 1),
      Multimodal.MediaRow(1L, "image", MediaCodec.encodePng(w, h, rgb), w, h, 0, 1),
      Multimodal.MediaRow(2L, "image", MediaCodec.encodePpm(w, h, edited), w, h, 0, 1),
      Multimodal.MediaRow(3L, "image", MediaCodec.encodePpm(w, h, inverted), w, h, 0, 1),
      Multimodal.MediaRow(4L, "audio", MediaCodec.encodeWav(8000, Array[Short](1, 2, 3)), 0, 0, 8000, 1))
      .toDS()
    val pairs = Multimodal.imageNearDups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "identical pixels through two codecs not paired")
    assert(pairs.contains((0L, 2L)), "one-pixel edit not paired")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "inverted image wrongly paired")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "non-image row leaked in")
  }

  test("audioHash is gain-invariant; audioNearDups pairs re-levelled clips") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // a structured clip: quiet-loud alternating envelope
    val clip = Array.tabulate[Short](4096) { i =>
      val amp = if ((i / 256) % 2 == 0) 400 else 8000
      (rnd.nextInt(2 * amp) - amp).toShort
    }
    val relevelled = clip.map(s => (s / 2).toShort)        // -6 dB copy
    val edited = clip.clone()                              // one frame zeroed
    java.util.Arrays.fill(edited, 0, 64, 0.toShort)
    val unrelated = Array.tabulate[Short](4096) { i =>
      val amp = if ((i / 64) % 2 == 0) 7000 else 300       // different envelope
      (rnd.nextInt(2 * amp) - amp).toShort
    }
    // gain invariance at the hash level
    assert(Multimodal.audioHash(clip) == Multimodal.audioHash(relevelled))
    val media = Seq(
      Multimodal.MediaRow(0L, "audio", MediaCodec.encodeWav(8000, clip), 0, 0, 8000, 1),
      Multimodal.MediaRow(1L, "audio", MediaCodec.encodeWav(8000, relevelled), 0, 0, 8000, 1),
      Multimodal.MediaRow(2L, "audio", MediaCodec.encodeWav(8000, edited), 0, 0, 8000, 1),
      Multimodal.MediaRow(3L, "audio", MediaCodec.encodeWav(8000, unrelated), 0, 0, 8000, 1),
      Multimodal.MediaRow(4L, "image", MediaCodec.encodePpm(2, 2,
        Array.fill[Byte](12)(3)), 2, 2, 0, 1))
      .toDS()
    val pairs = Multimodal.audioNearDups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "re-levelled copy not paired")
    assert(pairs.contains((0L, 2L)), "one-frame edit not paired")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated clip wrongly paired")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "non-audio row leaked in")
  }

  test("videoNearDups pairs identical frame streams, rejects reordered frames") {
    import spark.implicits._
    val w = 16; val h = 12
    // pseudo-random content per frame: distinct block-mean patterns, so
    // distinct aHashes (a pure gradient rescaled per frame keeps the SAME
    // aHash — every block keeps its side of the global mean)
    def frame(seed: Int) = Array.tabulate[Byte](w * h * 3) { j =>
      ((j * 131 + seed * 977 + (j * j + seed) % 89) % 256).toByte
    }
    val clip = (0 until 4).map(f => (w, h, frame(f)))
    val reordered = clip.reverse
    val edited = clip.updated(3, (w, h, frame(9)))
    def enc(fs: Seq[(Int, Int, Array[Byte])]) = MediaCodec.encodePpmStream(fs)
    val media = Seq(
      Multimodal.MediaRow(0L, "video", enc(clip), w, h, 0, 4),
      Multimodal.MediaRow(1L, "video", enc(clip), w, h, 0, 4),      // exact copy
      Multimodal.MediaRow(2L, "video", enc(edited), w, h, 0, 4),    // one frame swapped
      Multimodal.MediaRow(3L, "video", enc(reordered), w, h, 0, 4), // temporal edit
      Multimodal.MediaRow(4L, "audio", MediaCodec.encodeWav(8000, Array[Short](1, 2)), 0, 0, 8000, 1))
      .toDS()
    val hashes = Multimodal.videoHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(0L) == hashes(1L), "identical frame streams must hash equal")
    assert(hashes(0L) != hashes(3L), "reordered frames must hash differently")
    val pairs = Multimodal.videoNearDups(media, maxHamming = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact video copy not paired")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "non-video row leaked in")
  }
}
