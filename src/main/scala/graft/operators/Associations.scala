package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the co-occurrence mining stage of a
  * recommendation / assortment pipeline (Agrawal & Srikant, VLDB'94's
  * Apriori pair step). The reference's analytics layer stops at grouped
  * aggregates; pairwise lift is the natural next question its zone/hour
  * tables raise ("which zones co-occur in one user's day"), re-posed here
  * on the richer orders/part star.
  *
  * Scale posture: the ONLY quadratic surface is pairs-within-basket, and
  * it is doubly bounded: (a) the item vocabulary is brand-sized (the
  * classic Apriori trick — mine at a coarse item hierarchy level, the
  * domain is ≤ dozens), so a basket yields at most C(|brands|,2) pairs;
  * (b) infrequent items are cut BEFORE the self-join by a broadcast
  * frequent-item filter, so pair expansion never sees long-tail items.
  * Pair counting is one shuffle on the (a,b) key; supports/lifts are
  * single IEEE divisions of exact longs, so DuckDB reproduces every
  * double bit-for-bit.
  */
object Associations {

  /** q162: brand-level association rules over order baskets.
    * `minItemCount` is the Apriori frequent-item threshold (applied to
    * single items before pair expansion); `minPairCount` the pair support
    * cut. Output: one row per ordered pair (a < b) with support,
    * both-direction confidences, and lift. */
  def brandRules(t: Tables, minItemCount: Long = 10,
                 minPairCount: Long = 5): DataFrame = {
    // basket = order; item = part brand (distinct within basket)
    val baskets = t.lineitem
      .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct()
      .localCheckpoint() // feeds totals, item counts, and both join sides

    val nBaskets = baskets.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemCounts = baskets.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemCount) // Apriori: prune before pairing
      .localCheckpoint() // brand-count-sized; read by the filter + both rule sides

    // frequent-items-only baskets, then pairs (a < b) within each basket
    val frequent = baskets
      .join(broadcast(itemCounts.select(col("item"))), "item")
    val pairs = frequent.as("x")
      .join(frequent.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    pairs
      .join(broadcast(itemCounts.select(col("item").as("item_a"),
        col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("item").as("item_b"),
        col("n_item").as("n_b"))), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("conf_a_to_b"),
        round(col("n_ab").cast("double") / col("n_b"), 6).as("conf_b_to_a"),
        round(col("n_ab").cast("double") * col("n_baskets") /
          (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** DuckDB mirror of [[brandRules]] — identical counts and division
    * order, so every rounded double matches bit-for-bit. */
  def brandRulesSql(minItemCount: Long = 10, minPairCount: Long = 5): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM baskets),
       |ic AS (
       |  SELECT item, count(*) AS n_item FROM baskets GROUP BY 1
       |  HAVING count(*) >= $minItemCount),
       |freq AS (SELECT b.* FROM baskets b JOIN ic USING (item)),
       |pairs AS (
       |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS n_ab
       |  FROM freq x JOIN freq y
       |    ON x.basket = y.basket AND x.item < y.item
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $minPairCount)
       |SELECT item_a, item_b, n_ab, a.n_item AS n_a, b.n_item AS n_b,
       |  round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support,
       |  round(CAST(n_ab AS DOUBLE) / a.n_item, 6) AS conf_a_to_b,
       |  round(CAST(n_ab AS DOUBLE) / b.n_item, 6) AS conf_b_to_a,
       |  round(CAST(n_ab AS DOUBLE) * n_baskets
       |    / (CAST(a.n_item AS DOUBLE) * b.n_item), 6) AS lift
       |FROM pairs
       |JOIN ic a ON a.item = pairs.item_a
       |JOIN ic b ON b.item = pairs.item_b
       |CROSS JOIN nb
       |ORDER BY item_a, item_b""".stripMargin
}
