package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, partition-local feature
  * extraction, resize/frame-sample shapes, determinism of the stub. */
class MultimodalSpec extends SparkSpec {

  test("sampleMedia is deterministic and typed") {
    val a = Multimodal.sampleMedia(spark, 50).collect()
    val b = Multimodal.sampleMedia(spark, 50).collect()
    assert(a.length == 50)
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    assert(a.map(_.payload.toSeq).toSeq == b.map(_.payload.toSeq).toSeq)
    assert(a.map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("extractFeatures: histogram bins sum to byte count; deterministic") {
    val media = Multimodal.sampleMedia(spark, 60)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 60)
    feats.foreach { f =>
      assert(f.byte_histogram.length == 16)
      assert(f.byte_histogram.sum == f.n_bytes)
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
    }
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.decoded_checksum).sameElements(again.map(_.decoded_checksum)))
  }

  test("resizePayload truncates payloads to the cap") {
    val resized = Multimodal.resizePayload(Multimodal.sampleMedia(spark, 30), 80).collect()
    assert(resized.forall(_.payload.length <= 80))
  }

  test("sampleFrames reduces only video rows") {
    val media = Multimodal.sampleMedia(spark, 30)
    val before = media.collect().map(r => r.media_id -> r).toMap
    val sampled = Multimodal.sampleFrames(media, everyK = 2).collect()
    sampled.foreach { r =>
      val orig = before(r.media_id)
      if (r.kind == "video") {
        assert(r.payload.length <= orig.payload.length)
        // n_frames must equal the number of chunks actually kept
        val frameSize = math.max(1, orig.payload.length / math.max(1, orig.n_frames))
        val chunks = (orig.payload.length + frameSize - 1) / frameSize
        val kept = (chunks + 1) / 2 // every 2nd chunk starting at 0
        assert(r.n_frames == kept, s"n_frames ${r.n_frames} != kept $kept")
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
