package graft.ext

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string matching — the entity-resolution /
  * data-cleaning half of deduplication: "small ring" vs "small rings" are
  * different rows to [[Dedup]]'s set-similarity kernels but one typo apart
  * to a human. Reference anchor: the reference cleans categorical values
  * by exact normalization only (`airflow/dags/nyc_weather_etl.py:153`
  * lowercases zone names to classify them); this is the scale-out
  * generalization a 100 TB catalog actually needs.
  *
  * Algorithm: lossless affix blocking + exact Levenshtein verify.
  *
  *  - **Pre-aggregate first**: the fact table collapses to DISTINCT values
  *    with row counts before any pair work — pair-space is vocabulary-sized
  *    (the same discipline as [[Bpe]]'s word-frequency frame), so the
  *    corpus is touched exactly once regardless of scale.
  *  - **Blocking (d = 1)**: a pair at edit distance ≤ 1 differs by one
  *    substitution, insertion, or deletion at some position p. For strings
  *    of length ≥ 2k, either p ≥ k (the k-char prefix survives untouched)
  *    or p ≤ len−k−1 (the k-char suffix survives) — 2k ≤ len guarantees
  *    the union covers every p, so candidates sharing a `P:prefix` or
  *    `S:suffix` block key are COMPLETE. Strings shorter than 2k+d fall
  *    into length-band blocks `L:l .. L:l+d` (any pair within ed ≤ d has
  *    length difference ≤ d, so the bands overlap); strings in the
  *    boundary range [2k, 2k+d) emit BOTH key families so cross-regime
  *    pairs are never lost. The oracle is a brute-force all-pairs
  *    Levenshtein — the bit-exact compare therefore PROVES losslessness on
  *    the data, not just in the spec.
  *  - **Verify**: exact `levenshtein` (codegen'd binary expression) on the
  *    deduplicated candidate set only.
  *
  * Scale posture: blocks shard by affix across the cluster (one shuffle of
  * the vocabulary frame, exploded ≤ 4 keys/row). The documented worst case
  * is an identical-affix corpus (every value shares the same prefix AND
  * suffix — e.g. fixed-format serial numbers), which degrades one block to
  * quadratic: production mitigations are recursing the blocking on the
  * remainder after the shared affix, or a Hamming-specialized path for
  * fixed-width keys. General ed ≤ d needs d+1 pigeonhole segments
  * (PassJoin); this kernel pins the d = 1 contract and fails fast beyond.
  */
object FuzzyJoin {

  /** Blocking keys for one value (see class doc): P/S affix keys for long
    * strings, L length-band keys for short ones, both in the boundary. */
  private[ext] def blockingKeys(name: Column, d: Int, k: Int): Column = {
    val l = length(name)
    val ps = array(
      concat(lit("P:"), substring(name, 1, k)),
      concat(lit("S:"), substring(name, -k, k)))
    val bands = transform(
      sequence(l, l + lit(d)),
      i => concat(lit("L:"), i.cast("string")))
    when(l >= 2 * k && l < 2 * k + d, concat(ps, bands))
      .when(l >= 2 * k + d, ps)
      .otherwise(bands)
  }

  /** The generic kernel: `names` must have columns (name, n_rows). All
    * distinct-value pairs within edit distance `d`, blocking-complete (see
    * class doc). */
  def fuzzyJoin(names: DataFrame, d: Int = 1, k: Int = 3): DataFrame = {
    require(d == 1, s"affix blocking is complete for d = 1 only (got $d); " +
      "d >= 2 needs d+1 pigeonhole segments (PassJoin)")
    val keyed = names.select(
      col("name"), col("n_rows"),
      explode(blockingKeys(col("name"), d, k)).as("bk"))
    val cand = keyed.as("a")
      .join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.name") < col("b.name"))
      .select(
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n_rows").as("n_a"), col("b.n_rows").as("n_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("int"))
      .filter(col("dist") <= d)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** All pairs of DISTINCT `part.p_name` values within edit distance `d`
    * (default 1), with each value's row count — the "merge these catalog
    * entries?" review queue. Output: (name_a, name_b, dist, n_a, n_b). */
  def fuzzyNameJoin(t: Tables, d: Int = 1, k: Int = 3): DataFrame =
    fuzzyJoin(
      t.part.groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_rows")),
      d, k)

  /** The DuckDB mirror of [[fuzzyNameJoin]] — deliberately BRUTE FORCE
    * (all-pairs Levenshtein over the distinct names), so the hash compare
    * proves the affix blocking loses no pair on the real data. */
  def fuzzyNameJoinSql(d: Int = 1): String =
    s"""WITH names AS (
       |  SELECT p_name AS name, count(*) AS n_rows FROM part GROUP BY 1)
       |SELECT a.name AS name_a, b.name AS name_b,
       | CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist,
       | a.n_rows AS n_a, b.n_rows AS n_b
       |FROM names a JOIN names b ON a.name < b.name
       |WHERE levenshtein(a.name, b.name) <= $d
       |ORDER BY name_a, name_b""".stripMargin

  /** q154: end-to-end ENTITY RESOLUTION — the composed pipeline every
    * catalog-cleaning job ships: fuzzy match ([[fuzzyJoin]]'s lossless
    * blocking + Levenshtein verify) → transitive closure
    * ([[Dedup.connectedComponentsStar]], O(log n) rounds) → one CANONICAL
    * record per entity cluster. Entities are the distinct `part` names;
    * each gets a stable numeric id (min p_partkey of its rows — already
    * computed by the distinct aggregate, no extra pass), the cluster id
    * is the component minimum, and the canonical surface form is the
    * minimum-id member's name. The q45/q68 shape over EDIT-distance
    * edges instead of shingle-Jaccard edges — the two closures share the
    * CC kernel.
    *
    * Scale: pair work is vocabulary-sized (pre-aggregated names), CC runs
    * on the match graph only, and the final joins key on the broadcastable
    * names frame. */
  def entityClusters(t: Tables, d: Int = 1, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val names = t.part
      .groupBy(col("p_name").as("name"))
      .agg(min(col("p_partkey")).as("ent_id"), count(lit(1)).as("n_rows"))
      .localCheckpoint() // consumed by blocking, two id-mappings, CC nodes
    val pairs = fuzzyJoin(names.select(col("name"), col("n_rows")), d, k)
    val ids = names.select(col("name"), col("ent_id"))
    val edges = pairs
      .join(broadcast(ids.select(col("name").as("name_a"), col("ent_id").as("src"))), "name_a")
      .join(broadcast(ids.select(col("name").as("name_b"), col("ent_id").as("dst"))), "name_b")
      .select(col("src"), col("dst"))
    // name_a < name_b does not order the ids — leave canonicalization to CC
    val labels = Dedup.connectedComponentsStar(
      names.select(col("ent_id").as("id")), edges)
    labels
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .join(broadcast(ids.select(col("name"), col("ent_id"))),
        col("id") === col("ent_id"))
      .join(broadcast(ids.select(col("name").as("canonical_name"),
        col("ent_id").as("component"))), Seq("component"))
      .select(col("name"), col("ent_id"), col("component").as("cluster_id"),
        col("cluster_size"), col("canonical_name"))
      .orderBy(col("name"))
  }

  /** DuckDB mirror of [[entityClusters]] — brute-force match pairs plus
    * a recursive-CTE closure (the q45 oracle pattern), so the hash gate
    * proves blocking losslessness AND closure equivalence at once. */
  def entityClustersSql(d: Int = 1): String =
    s"""WITH RECURSIVE names AS (
       |  SELECT p_name AS name, min(p_partkey) AS ent_id, count(*) AS n_rows
       |  FROM part GROUP BY 1),
       |pairs AS (
       |  SELECT a.ent_id AS src, b.ent_id AS dst
       |  FROM names a JOIN names b ON a.name < b.name
       |  WHERE levenshtein(a.name, b.name) <= $d),
       |edges AS (
       |  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |reach(id, label) AS (
       |  SELECT ent_id, ent_id FROM names
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
       |labels AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY 1),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1)
       |SELECT n.name, l.id AS ent_id, l.cluster_id, s.cluster_size,
       | c.name AS canonical_name
       |FROM labels l
       |JOIN names n ON n.ent_id = l.id
       |JOIN sizes s USING (cluster_id)
       |JOIN names c ON c.ent_id = l.cluster_id
       |ORDER BY n.name""".stripMargin

  /** q156: GOLDEN-RECORD SURVIVORSHIP — the apply step of entity
    * resolution ([[entityClusters]] decides which rows are the same
    * entity; this MERGES their attributes into one master record, the
    * MDM "survivorship rules" stage). Per entity cluster, over ALL
    * underlying `part` rows of its member names:
    *   - `canonical_name`: the cluster representative (min-id member);
    *   - `mode_brand`: most frequent brand, ties broken lexically — a
    *     two-level aggregate (cluster×brand counts, then a row_number
    *     pick over the brand-cardinality-sized frame), never a
    *     collect_list;
    *   - completeness-style aggregates: row/variant counts, exact
    *     min/max size, decimal-kernel avg price.
    *
    * Scale: the cluster map is vocabulary-sized by construction
    * (distinct names), hence broadcastable — the catalog rows never
    * shuffle to meet it. The merge is two grouped passes over the
    * catalog (brand-mode counts; everything else), each reducing to a
    * cluster-sized frame with map-side partials; all remaining joins and
    * windows run on those small frames. */
  def goldenRecords(t: Tables, d: Int = 1, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.ExactAgg.davg
    val clusters = entityClusters(t, d, k)
      .select(col("name"), col("cluster_id"), col("canonical_name"))
    val rows = t.part.join(broadcast(clusters), col("p_name") === col("name"))
    val brandCounts = rows
      .groupBy(col("cluster_id"), col("p_brand"))
      .agg(count(lit(1)).as("n"))
    val modeBrand = brandCounts
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("n").desc, col("p_brand"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("p_brand").as("mode_brand"))
    rows
      .groupBy(col("cluster_id"), col("canonical_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("name")).as("n_variants"),
        min(col("p_partkey")).as("golden_key"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        davg(col("p_retailprice")).as("avg_price"))
      .join(modeBrand, Seq("cluster_id"))
      .select(col("cluster_id"), col("canonical_name"), col("golden_key"),
        col("n_rows"), col("n_variants"), col("mode_brand"),
        col("min_size"), col("max_size"), col("avg_price"))
      .orderBy(col("cluster_id"))
  }

  /** DuckDB mirror of [[goldenRecords]] — the [[entityClustersSql]]
    * closure plus the same two-level mode and survivorship aggregates. */
  def goldenRecordsSql(d: Int = 1): String = {
    import graft.functions.ExactAgg.{Sql => O}
    s"""WITH RECURSIVE names AS (
       |  SELECT p_name AS name, min(p_partkey) AS ent_id, count(*) AS n_rows
       |  FROM part GROUP BY 1),
       |pairs AS (
       |  SELECT a.ent_id AS src, b.ent_id AS dst
       |  FROM names a JOIN names b ON a.name < b.name
       |  WHERE levenshtein(a.name, b.name) <= $d),
       |edges AS (
       |  SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |reach(id, label) AS (
       |  SELECT ent_id, ent_id FROM names
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
       |labels AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY 1),
       |clusters AS (
       |  SELECT n.name, l.cluster_id, c.name AS canonical_name
       |  FROM labels l
       |  JOIN names n ON n.ent_id = l.id
       |  JOIN names c ON c.ent_id = l.cluster_id),
       |rows_ AS (
       |  SELECT p.*, cl.cluster_id, cl.canonical_name
       |  FROM part p JOIN clusters cl ON cl.name = p.p_name),
       |mode_brand AS (
       |  SELECT cluster_id, p_brand AS mode_brand
       |  FROM (SELECT cluster_id, p_brand, count(*) AS n FROM rows_ GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY n DESC, p_brand) = 1)
       |SELECT r.cluster_id, r.canonical_name,
       |  min(r.p_partkey) AS golden_key,
       |  count(*) AS n_rows,
       |  count(DISTINCT r.p_name) AS n_variants,
       |  any_value(m.mode_brand) AS mode_brand,
       |  CAST(min(r.p_size) AS INTEGER) AS min_size,
       |  CAST(max(r.p_size) AS INTEGER) AS max_size,
       |  ${O.davg("r.p_retailprice")} AS avg_price
       |FROM rows_ r JOIN mode_brand m USING (cluster_id)
       |GROUP BY 1, 2
       |ORDER BY r.cluster_id""".stripMargin
  }

  /** q199: Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969 — the decision model behind Splink/dedupe.io-style linkers):
    * candidate `part` pairs blocked on (p_brand, p_size) are scored by the
    * likelihood ratio R = Π_f r_f, where per comparison field f,
    * r_f = m/u_f on agreement and (1−m)/(1−u_f) on disagreement. The
    * u-probabilities (chance agreement among NON-matches) are estimated
    * from the data itself as Σ_v c_v²/N² — the standard frequency-based
    * estimate — while m (agreement among true matches) is the usual fixed
    * prior. Pairs classify as match / possible / nonmatch by ratio
    * thresholds; unlike [[fuzzyJoin]]'s single-field edit distance this
    * weighs EVERY field by how discriminating it actually is (agreeing on
    * an 8-value name stem says more than agreeing on a 3-value price
    * band, and the ratio knows by how much).
    *
    * Comparison fields: p_type, the name's first token (stem), and the
    * retail-price century band ⌊price/100⌋. A field whose u = 1 (single
    * observed value, zero discrimination) never takes its disagreement
    * branch — CASE evaluates lazily in both engines, so the 1−u = 0
    * denominator is never touched.
    *
    * Bit-portability: each u is an exact BIGINT ratio; each r_f is ONE
    * IEEE division of exact integers; R is the fixed-order product
    * (r_type · r_stem) · r_band — identical bits in both engines, so even
    * the threshold comparisons agree exactly.
    *
    * Scale shape: u-tables are three value-frequency aggregates (narrow,
    * corpus-linear) collapsing to 1-row frames broadcast into the pair
    * scorer. Pair space: blocks at a FIXED key cardinality grow linearly
    * with the corpus, so raw in-block pairs grow quadratically — the r7
    * sf1 run measured exactly that (16.5× at 10× data). Blocks are
    * therefore salt-capped at `blockCap` members via the q34 machinery
    * ([[Dedup.saltedBuckets]]): a deterministic hash splits an oversized
    * block into ⌈n/cap⌉ sub-blocks and pairs are scored within sub-blocks
    * only — O(cap·n) pairs per block, the standard web-scale linkage
    * contract (recall inside degenerate blocks traded for bounded work;
    * production recovers it by adding blocking passes, not by unbounding
    * one). */
  def fellegiSunter(t: Tables, mPct: Int = 90, upper: Double = 30.0,
                    lower: Double = 1.0, blockCap: Int = 64): DataFrame = {
    val base = t.part.select(col("p_partkey"), col("p_brand"), col("p_size"),
      col("p_type"), substring_index(col("p_name"), " ", 1).as("stem"),
      floor(col("p_retailprice") / 100.0).cast("long").as("band"))
    // the salted block table is the linkage's index artifact — build it
    // once (both self-join sides read it; in production it is a persisted
    // table, the lshCandidateArtifacts pattern)
    val p = Dedup.saltedBuckets(base, Seq("p_brand", "p_size"), "p_partkey",
      blockCap).localCheckpoint()
    def uStats(c: Column, name: String): DataFrame =
      base.groupBy(c.as("v")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as(s"${name}_num"),
          (sum(col("c")) * sum(col("c"))).as(s"${name}_den"))
    val u = uStats(col("p_type"), "ut")
      .crossJoin(uStats(col("stem"), "us"))
      .crossJoin(uStats(col("band"), "ub")) // three 1-row frames
    def ratio(agree: Column, num: String, den: String): Column =
      when(agree,
        (lit(mPct.toLong) * col(den)).cast("double") /
          (lit(100L) * col(num)).cast("double"))
        .otherwise(
          (lit((100 - mPct).toLong) * col(den)).cast("double") /
            (lit(100L) * (col(den) - col(num))).cast("double"))
    val a = p.as("a"); val b = p.as("b")
    val pairs = a.join(b,
        col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.salt") === col("b.salt") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .crossJoin(broadcast(u))
      .select(
        col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
        col("a.p_brand").as("p_brand"), col("a.p_size").as("p_size"),
        (col("a.p_type") === col("b.p_type")).cast("int").as("agree_type"),
        (col("a.stem") === col("b.stem")).cast("int").as("agree_stem"),
        (col("a.band") === col("b.band")).cast("int").as("agree_band"),
        ratio(col("a.p_type") === col("b.p_type"), "ut_num", "ut_den")
          .as("r_type"),
        ratio(col("a.stem") === col("b.stem"), "us_num", "us_den")
          .as("r_stem"),
        ratio(col("a.band") === col("b.band"), "ub_num", "ub_den")
          .as("r_band"))
      .withColumn("fs_ratio", col("r_type") * col("r_stem") * col("r_band"))
    pairs.select(col("key_a"), col("key_b"), col("p_brand"), col("p_size"),
        col("agree_type"), col("agree_stem"), col("agree_band"),
        col("fs_ratio"),
        when(col("fs_ratio") >= upper, "match")
          .when(col("fs_ratio") >= lower, "possible")
          .otherwise("nonmatch").as("verdict"))
      .orderBy(col("key_a"), col("key_b"))
  }

  /** The DuckDB mirror of [[fellegiSunter]] — including the salt cap. */
  def fellegiSunterSql(mPct: Int = 90, upper: Double = 30.0,
                       lower: Double = 1.0, blockCap: Int = 64): String = {
    def ratio(agree: String, num: String, den: String): String =
      s"""CASE WHEN $agree
         |  THEN CAST($mPct * $den AS DOUBLE)
         |     / CAST(100 * $num AS DOUBLE)
         |  ELSE CAST(${100 - mPct} * $den AS DOUBLE)
         |     / CAST(100 * ($den - $num) AS DOUBLE) END""".stripMargin
    s"""WITH p0 AS (
       |  SELECT p_partkey, p_brand, p_size, p_type,
       |   string_split(p_name, ' ')[1] AS stem,
       |   CAST(floor(p_retailprice / 100.0) AS BIGINT) AS band
       |  FROM part),
       |bsz AS (
       |  SELECT p_brand, p_size, count(*) AS bucket_n
       |  FROM p0 GROUP BY 1, 2),
       |p AS (
       |  SELECT p0.*,
       |   (${graft.ext.Sampling.splitHashSql("p_partkey")})
       |     % ((bucket_n + ${blockCap - 1}) // $blockCap) AS salt
       |  FROM p0 JOIN bsz USING (p_brand, p_size)),
       |ut AS (
       |  SELECT CAST(sum(c * c) AS BIGINT) AS ut_num,
       |   CAST(sum(c) * sum(c) AS BIGINT) AS ut_den
       |  FROM (SELECT count(*) AS c FROM p GROUP BY p_type)),
       |us AS (
       |  SELECT CAST(sum(c * c) AS BIGINT) AS us_num,
       |   CAST(sum(c) * sum(c) AS BIGINT) AS us_den
       |  FROM (SELECT count(*) AS c FROM p GROUP BY stem)),
       |ub AS (
       |  SELECT CAST(sum(c * c) AS BIGINT) AS ub_num,
       |   CAST(sum(c) * sum(c) AS BIGINT) AS ub_den
       |  FROM (SELECT count(*) AS c FROM p GROUP BY band)),
       |scored AS (
       |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       |   a.p_brand, a.p_size,
       |   CASE WHEN a.p_type = b.p_type THEN 1 ELSE 0 END AS agree_type,
       |   CASE WHEN a.stem = b.stem THEN 1 ELSE 0 END AS agree_stem,
       |   CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS agree_band,
       |   (${ratio("a.p_type = b.p_type", "ut_num", "ut_den")}) AS r_type,
       |   (${ratio("a.stem = b.stem", "us_num", "us_den")}) AS r_stem,
       |   (${ratio("a.band = b.band", "ub_num", "ub_den")}) AS r_band
       |  FROM p a JOIN p b
       |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       |   AND a.salt = b.salt AND a.p_partkey < b.p_partkey
       |  CROSS JOIN ut CROSS JOIN us CROSS JOIN ub)
       |SELECT key_a, key_b, p_brand, CAST(p_size AS INTEGER) AS p_size,
       | agree_type, agree_stem, agree_band,
       | r_type * r_stem * r_band AS fs_ratio,
       | CASE WHEN r_type * r_stem * r_band >= $upper THEN 'match'
       |      WHEN r_type * r_stem * r_band >= $lower THEN 'possible'
       |      ELSE 'nonmatch' END AS verdict
       |FROM scored
       |ORDER BY key_a, key_b""".stripMargin
  }
}
