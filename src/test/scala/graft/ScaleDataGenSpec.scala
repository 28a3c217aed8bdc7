package graft

import java.nio.file.Files

import graft.tools.ScaleDataGen
import org.apache.spark.sql.functions._

/** Pins the production-dup-density fixture's construction invariants
  * (VERDICT r6 item 3): exactly one near-dup PAIR per base doc (20% of
  * elements dup members, every cluster size 2, independent of scale), all
  * other elements pairwise-unique, and the documents-table invariant
  * `n_chars = length(text)` preserved. The copy-heavy default's
  * quadratic-output behavior is adjudicated in SCALE.md; this fixture is
  * the linear-band control. */
class ScaleDataGenSpec extends SparkSpec {

  private val copies = 10

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-prod-fixture").toString
    ScaleDataGen.generate(spark, "/root/testdata/sf0.001", d, copies,
      docMode = "production")
    d
  }

  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val baseCount =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()

  test("row count scales exactly copies x base") {
    assert(docs.count() === baseCount * copies)
  }

  test("n_chars tracks the generated text") {
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() === 0L)
  }

  test("exactly one near-dup pair per base doc; 20% dup members") {
    val dups = docs.filter(col("text").endsWith(" dupcopy"))
      .select(col("doc_id").as("dup_id"),
        expr("substring(text, 1, length(text) - 8)").as("stripped"))
      .cache()
    assert(dups.count() === baseCount,
      "expected exactly one dup member per base doc")
    // every dup's stripped text matches exactly one sibling, and the
    // sibling is the adjacent copy of the SAME base doc (cluster size 2)
    val paired = dups.join(docs.select(col("doc_id").as("sib_id"),
      col("text").as("sib_text")), col("stripped") === col("sib_text"))
    assert(paired.count() === baseCount, "dup must pair with exactly one sibling")
    val crossCluster = paired
      .filter(col("dup_id") % baseCount =!= col("sib_id") % baseCount)
      .count()
    assert(crossCluster === 0L, "dup paired outside its base doc's cluster")
  }

  test("no exact duplicates anywhere; non-dup splices stay unique") {
    assert(docs.select(col("text")).distinct().count() === baseCount * copies)
  }

  test("embeddings: scaled count, no exact-equal vectors") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val baseEmb =
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(emb.count() === baseEmb * copies)
    // dup members differ by the 1e-4 nudge; uniques by the 1.5 push —
    // exact equality would mean the perturbation silently no-opped
    assert(emb.select(col("embedding")).distinct().count() === baseEmb * copies)
  }

  test("referential integrity of the scaled star schema holds") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val orphans = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"), "left_anti").count()
    assert(orphans === 0L, s"$orphans orders reference missing customers")
  }

  test("hotkey events mode: ~30% of rows on user 0, deterministic") {
    val d = Files.createTempDirectory("graft-skew-fixture").toString
    ScaleDataGen.generate(spark, "/root/testdata/sf0.001", d, copies,
      docMode = "copyheavy", eventsMode = "hotkey")
    val ev = spark.read.parquet(s"$d/events.parquet").cache()
    val total = ev.count()
    val hot = ev.filter(col("user_id") === 0L).count()
    val share = hot.toDouble / total
    assert(share > 0.25 && share < 0.35,
      s"hot-key share $share outside the designed ~30% band")
    // the hot key dominates every OTHER key by an order of magnitude
    val second = ev.filter(col("user_id") =!= 0L)
      .groupBy(col("user_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(hot > 10L * second,
      s"hot key ($hot rows) does not dominate runner-up ($second rows)")
    // seedless determinism: a regeneration reproduces the exact rows
    val d2 = Files.createTempDirectory("graft-skew-fixture2").toString
    ScaleDataGen.generate(spark, "/root/testdata/sf0.001", d2, copies,
      docMode = "copyheavy", eventsMode = "hotkey")
    val ev2 = spark.read.parquet(s"$d2/events.parquet")
    assert(ev.unionAll(ev2).distinct().count() === ev.distinct().count())
    ev.unpersist()
  }
}
