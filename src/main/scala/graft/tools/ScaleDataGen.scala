package graft.tools

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the TESTDATA.md fixture set: replicates every
  * table `copies`× with key-space remapping that preserves referential
  * integrity (copy c of orders references copy c of customer, etc.), so any
  * join/aggregate over the scaled set exercises exactly the plans the base
  * set does — at N× the rows. Used for the sf1 (10×) scale-up smoke recorded
  * in SCALE.md: the correctness gate stays at sf0.01 with the DuckDB oracle;
  * this set answers "does the plan survive a 10× scale-up" with a
  * measurement instead of an argument.
  *
  * Everything is a narrow projection over a broadcast copy-index frame — no
  * driver-side data, no RNG (seedless determinism: the copy index IS the
  * perturbation seed), safe to re-run (overwrite).
  *
  * Key remapping: `key + copy * stride` where stride = max(key)+1 of the
  * base table (one 1-row aggregate per keyed table — bounded driver work).
  * Timestamps are kept, so the scaled set densifies the same time range
  * (10× rows per hour bucket), which is what a larger deployment over the
  * same period looks like.
  *
  * Text/embedding perturbation: a copy keeps its base text verbatim when
  * `(doc_id + copy) % 5 == 0` (a ~20% cross-copy exact-duplicate rate — a
  * realistic crawl-like dup load for the dedup family) and otherwise gets a
  * deterministic ` copyN` suffix, making it a NEAR-duplicate of its base
  * (one-token delta) — so MinHash/SimHash/CC queries see both dup kinds at
  * scale. `n_chars` tracks the suffix so the documents invariant holds.
  * Embeddings perturb dimension 0 by `copy * 1e-3`, keeping copies
  * near-identical in cosine — the SemDeDup/ANN stress case.
  */
object ScaleDataGen {

  private def withCopies(df: DataFrame, copies: Int): DataFrame =
    // broadcast 1-column frame of `copies` rows: replication without a
    // shuffle; every source partition expands in place
    df.crossJoin(broadcast(
      df.sparkSession.range(copies).select(col("id").cast("int").as("copy"))))

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  private def remap(key: String, s: Long) =
    (col(key) + col("copy") * lit(s)).as(key)

  def generate(spark: SparkSession, srcDir: String, dstDir: String,
               copies: Int = 10): Unit = {
    val t = Tables(spark, srcDir)
    def out(name: String)(df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    // dimension row counts that scale with sf in TPC-H get replicated too;
    // the fixed-size dims (region, nation) are copied verbatim
    out("region")(t.region)
    out("nation")(t.nation)

    val custStride = stride(t.customer, "c_custkey")
    val suppStride = stride(t.supplier, "s_suppkey")
    val partStride = stride(t.part, "p_partkey")
    val orderStride = stride(t.orders, "o_orderkey")

    out("customer")(withCopies(t.customer, copies).select(
      remap("c_custkey", custStride), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))
    out("supplier")(withCopies(t.supplier, copies).select(
      remap("s_suppkey", suppStride), col("s_name"), col("s_nationkey"),
      col("s_acctbal")))
    out("part")(withCopies(t.part, copies).select(
      remap("p_partkey", partStride), col("p_name"), col("p_brand"),
      col("p_type"), col("p_size"), col("p_retailprice")))
    out("orders")(withCopies(t.orders, copies).select(
      remap("o_orderkey", orderStride), remap("o_custkey", custStride),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")))
    out("lineitem")(withCopies(t.lineitem, copies).select(
      remap("l_orderkey", orderStride), remap("l_partkey", partStride),
      remap("l_suppkey", suppStride), col("l_linenumber"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))

    // events: read through Tables.eventsRaw and write `ts` back in whatever
    // physical encoding the source drop used (int64 nanos stays int64;
    // µs timestamps stay µs) — Tables.events is schema-adaptive on read,
    // so the scaled dir round-trips under the same contract as the source
    val ev = t.eventsRaw
    val eventStride = stride(ev, "event_id")
    val userStride = stride(ev, "user_id")
    out("events")(withCopies(ev, copies).select(
      remap("event_id", eventStride), col("ts"), remap("user_id", userStride),
      col("event_type"), col("value"), col("props")))

    val docStride = stride(t.documents, "doc_id")
    val keepVerbatim = (col("doc_id") + col("copy")) % 5 === 0
    val suffix = concat(lit(" copy"), col("copy").cast("string"))
    out("documents")(withCopies(t.documents, copies).select(
      remap("doc_id", docStride),
      when(col("copy") === 0 || keepVerbatim, col("text"))
        .otherwise(concat(col("text"), suffix)).as("text"),
      col("lang"), col("source"),
      when(col("copy") === 0 || keepVerbatim, col("n_chars"))
        .otherwise(col("n_chars") + length(suffix)).as("n_chars")))

    val vecStride = stride(t.embeddings, "vec_id")
    out("embeddings")(withCopies(t.embeddings, copies).select(
      remap("vec_id", vecStride),
      when(col("copy") === 0, col("embedding")).otherwise(
        transform(col("embedding"),
          (x, i) => when(i === 0, x + (col("copy") * lit(0.001f))).otherwise(x))
      ).as("embedding"),
      col("label")))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, copies)
    spark.stop()
  }
}
