package graft

import graft.streaming.StatefulDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** flatMapGroupsWithState dedup: first occurrence emitted once, replays
  * swallowed across micro-batches, state survives between batches. */
class StatefulDedupSpec extends SparkSpec {

  test("streaming dedup emits first occurrence only, across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StatefulDedup.dedupByKey(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      in.addData(("a", "first-a"), ("b", "first-b"), ("a", "dup-a"))
      q.processAllAvailable()
      val batch1 = spark.table("dedup").as[StatefulDedup.Seen].collect()
      assert(batch1.map(_.key).sorted.sameElements(Array("a", "b")))
      assert(batch1.find(_.key == "a").get.firstValue == "first-a")
      assert(batch1.find(_.key == "a").get.replays == 1)

      // batch 2: replays of known keys emit NOTHING; a new key emits once
      in.addData(("a", "late-dup"), ("b", "late-dup"), ("c", "first-c"))
      q.processAllAvailable()
      val all = spark.table("dedup").as[StatefulDedup.Seen].collect()
      assert(all.length == 3) // still one row per key
      assert(all.find(_.key == "c").get.firstValue == "first-c")
    } finally q.stop()
  }

  test("built-in dropDuplicatesWithinWatermark twin: dups within the window swallowed") {
    // the custom flatMapGroupsWithState dedup above carries a replay
    // counter; when only suppression is needed, Spark's built-in
    // watermark-bounded dedup is the zero-code alternative — state evicts
    // once the watermark passes, the bounded-state property our custom
    // retentionMs timeout provides
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val in = MemoryStream[(String, Timestamp)]
    val q = in.toDF().toDF("key", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_dedup").start()
    try {
      in.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(2)))
      q.processAllAvailable()
      in.addData(("a", ts(3))) // still within the watermark window: swallowed
      q.processAllAvailable()
      val keys = spark.table("wm_dedup").select("key").as[String].collect().sorted
      assert(keys.sameElements(Array("a", "b")), keys.mkString(","))
    } finally q.stop()
  }

  test("batch twin keeps first-by-ts per key") {
    import spark.implicits._
    val df = Seq(("a", "v1", 1L), ("a", "v2", 2L), ("b", "x", 5L))
      .toDF("key", "value", "ts")
    val out = StatefulDedup.dedupBatch(df).collect()
    assert(out.length == 2)
    assert(out.find(_.getString(0) == "a").get.getString(1) == "v1")
    assert(out.find(_.getString(0) == "a").get.getLong(2) == 2L)
  }
}
