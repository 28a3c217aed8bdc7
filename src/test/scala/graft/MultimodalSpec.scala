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
          val Some((w, h, rgb)) = MediaCodec.decodePpm(r.payload)
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
          val Some((w, h, rgb)) = MediaCodec.decodePpm(r.payload)
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
}
