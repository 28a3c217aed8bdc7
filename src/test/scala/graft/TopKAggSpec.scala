package graft

import graft.functions.TopKAgg
import graft.functions.TopKAgg.TopKBuffer
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** The bounded top-k-per-group aggregate: heap kernel vs brute force,
  * merge/state round-trips, the k-header merge contract, and the scale
  * claim itself — the query plan aggregates instead of window-sorting. */
class TopKAggSpec extends SparkSpec {

  private val L0 = Literal(0L)

  // deterministic LCG so the brute-force comparison covers ties and
  // saturated/unsaturated buffers without flaky randomness
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))

  private def bruteTopK(pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.sortBy { case (o, p) => (-o, p) }.take(k)

  test("heap keeps exactly the k best under (ord DESC, payload ASC), any input order") {
    val pairs = lcg(42).take(400).grouped(2).map { g =>
      val s = g.toSeq
      ((s.head % 50).abs, (s(1) % 1000).abs) // heavy ties in ord
    }.toSeq
    for (k <- Seq(1, 7, 100, 500)) {
      val buf = new TopKBuffer(k)
      pairs.foreach { case (o, p) => buf.insert(o, p) }
      assert(buf.sortedPairs.toSeq == bruteTopK(pairs, k),
        s"k=$k kept set diverges from brute force")
    }
  }

  test("merge of per-chunk buffers equals the single-buffer result") {
    val pairs = lcg(7).take(600).grouped(2).map { g =>
      val s = g.toSeq
      ((s.head % 40).abs, (s(1) % 10000).abs)
    }.toSeq
    val k = 13
    val whole = new TopKBuffer(k)
    pairs.foreach { case (o, p) => whole.insert(o, p) }

    val agg = TopKAgg.TopKByAgg(L0, L0, k)
    val merged = pairs.grouped(50).foldLeft(new TopKBuffer(k)) { (acc, chunk) =>
      val part = new TopKBuffer(k)
      chunk.foreach { case (o, p) => part.insert(o, p) }
      // round-trip through the wire format, as a real shuffle would
      agg.merge(acc, agg.deserialize(agg.serialize(part)))
    }
    assert(merged.sortedPairs.toSeq == whole.sortedPairs.toSeq)
  }

  test("merging a state UP to a larger k is a hard error, not a silent truncation") {
    val small = TopKAgg.TopKByAgg(L0, L0, 4)
    val buf = new TopKBuffer(4)
    (1L to 10L).foreach(i => buf.insert(i, i))
    val bytes = small.serialize(buf)
    val bigger = TopKAgg.TopKByAgg(L0, L0, 8)
    val e = intercept[IllegalArgumentException](bigger.deserialize(bytes))
    assert(e.getMessage.contains("exceeds the serialized state's k"))
    // merging DOWN degrades cleanly to the merge-side k
    val smaller = TopKAgg.TopKByAgg(L0, L0, 2)
    assert(smaller.deserialize(bytes).sortedPairs.toSeq == Seq((10L, 10L), (9L, 9L)))
  }

  test("q112 equals the window form on real data") {
    val t = sf()
    val expected = t.documents
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rank") <= 3)
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rank"))
      .collect().toSeq
    val got = graft.ext.Sampling.topDocsPerSource(t).collect().toSeq
    assert(got == expected)
  }

  test("q114 sample is exactly min(k, |group|) rows per source, layout-independent") {
    val t = sf()
    val a = graft.ext.Sampling.sampleKPerSource(t).collect().toSeq
    val sizes = a.groupBy(_.getString(0)).view.mapValues(_.size).toMap
    val groupSizes = t.documents.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, n) <- groupSizes)
      assert(sizes(s) == math.min(5L, n), s"source $s sampled ${sizes.get(s)} of $n")
    // a different physical layout must not change the picked set
    val relaid = graft.core.Tables(spark, "/root/testdata/sf0.001") // fresh plans
    val b = graft.ext.Sampling.sampleKPerSource(relaid).collect().toSeq
    assert(a == b)
  }

  test("string-payload heap: kept set, wire-format merge, UTF-8 binary tiebreak") {
    import org.apache.spark.unsafe.types.UTF8String
    val words = Seq("data", "database", "set", "zeta", "alpha", "Alpha", "a", "")
    val pairs = lcg(11).take(300).zipWithIndex.map { case (h, i) =>
      ((h % 20).abs, UTF8String.fromString(words(i % words.length)))
    }.toSeq
    val k = 5
    val whole = new TopKAgg.TopKStrBuffer(k)
    pairs.foreach { case (o, p) => whole.insert(o, p) }
    val brute = pairs.sortWith((a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)).take(k)
    assert(whole.sortedPairs.toSeq == brute)

    val agg = TopKAgg.TopKStrByAgg(L0, L0, k)
    val merged = pairs.grouped(37).foldLeft(new TopKAgg.TopKStrBuffer(k)) { (acc, chunk) =>
      val part = new TopKAgg.TopKStrBuffer(k)
      chunk.foreach { case (o, p) => part.insert(o, p) }
      agg.merge(acc, agg.deserialize(agg.serialize(part)))
    }
    assert(merged.sortedPairs.toSeq == whole.sortedPairs.toSeq)
  }

  test("q116 equals the window form on real data") {
    val t = sf()
    val df = t.documents
      .select(col("lang"),
        explode(array_distinct(graft.ext.TextAnalysis.tokens(lower(col("text"))))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("df"))
    val expected = df
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("df").desc, col("term"))))
      .filter(col("rank") <= 10)
      .select(col("lang"), col("rank"), col("term"), col("df"))
      .orderBy(col("lang"), col("rank"))
      .collect().toSeq
    val got = graft.ext.TextAnalysis.topTermsPerLang(t).collect().toSeq
    assert(got == expected)
  }

  test("plan: aggregates with partial+final pair, no Window, no full-input Sort") {
    val df = graft.ext.Sampling.topDocsPerSource(sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.split("graft_topk").length >= 3,
      s"expected partial+final graft_topk aggregation:\n${p.take(1500)}")
    assert(!p.contains("Window"), s"top-k fell back to a window sort:\n${p.take(1500)}")
    // the only Sort allowed is the final presentation order on the k*groups
    // result rows — it must sit ABOVE the aggregate, never below
    val sortIdx = p.indexOf("Sort [")
    val aggIdx = p.indexOf("graft_topk")
    assert(sortIdx == -1 || sortIdx < aggIdx,
      s"a Sort runs below the aggregate (full-input sort):\n${p.take(1500)}")
  }
}
