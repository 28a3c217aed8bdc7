package graft

import graft.ext.FuzzyJoin
import org.apache.spark.sql.functions._

/** FuzzyJoin: the load-bearing claim is that affix blocking is LOSSLESS for
  * d = 1 — every pair within edit distance 1 shares a block key. The spec
  * brute-forces Levenshtein over adversarial vocabularies (substitutions,
  * insertions, deletions, boundary lengths around 2k, shared-affix sets,
  * short strings) and demands set equality with the blocked+verified join.
  * The q137 oracle repeats the same proof on real data (its DuckDB side is
  * deliberately brute-force). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Single-node Levenshtein (classic DP) for the brute-force reference. */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var diag = prev(0)
      prev(0) = i
      for (j <- 1 to b.length) {
        val tmp = prev(j)
        prev(j) = math.min(
          math.min(prev(j) + 1, prev(j - 1) + 1),
          diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
        diag = tmp
      }
    }
    prev(b.length)
  }

  private def brute(names: Seq[String], d: Int): Set[(String, String)] =
    (for {
      a <- names; b <- names
      if a < b && lev(a, b) <= d
    } yield (a, b)).toSet

  private def blocked(names: Seq[String], d: Int, k: Int): Set[(String, String)] =
    FuzzyJoin
      .fuzzyJoin(
        names.toDF("name").groupBy("name").agg(count(lit(1)).as("n_rows")),
        d, k)
      .select("name_a", "name_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet

  test("blocking is lossless: substitutions, indels, boundary lengths, shorts") {
    val k = 3
    // every edit class at every position of a 2k-length base (the worst
    // case for affix coverage), plus strings straddling the len-2k regime
    // boundary, plus very short strings that ride the length bands
    val base = "abcdef" // len 6 = 2k
    val subs = base.indices.map(i => base.updated(i, 'Z'))
    val dels = base.indices.map(i => base.take(i) + base.drop(i + 1)) // len 5
    val ins  = (0 to base.length).map(i => base.take(i) + "Q" + base.drop(i)) // len 7
    val shorts = Seq("a", "ab", "abc", "abd", "bc", "", "abcd", "abcde")
    val longs  = Seq("abcdefgh", "abcdefgX", "Xbcdefgh", "abcXefgh")
    val names  = (Seq(base) ++ subs ++ dels ++ ins ++ shorts ++ longs).distinct
    val want = brute(names, 1)
    val got  = blocked(names, 1, k)
    assert(want.subsetOf(got) && got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("blocking is lossless on a shared-affix (hot-block) vocabulary") {
    // fixed-format serials: identical prefix AND suffix — the documented
    // degenerate case must stay CORRECT (complete), just not cheap
    val names = (0 until 60).map(i => f"SER-$i%04d-END")
    val want = brute(names, 1)
    assert(want.nonEmpty)
    assert(blocked(names, 1, 3) == want)
  }

  test("d >= 2 fails fast (pigeonhole contract)") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(Seq("x").toDF("name").withColumn("n_rows", lit(1L)), d = 2)
    }
  }

  test("q137 shape: row counts ride the distinct-name frame") {
    val out = FuzzyJoin.fuzzyNameJoin(sf("sf0.001")).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("dist") <= 1)
      assert(r.getAs[Long]("n_a") >= 1L && r.getAs[Long]("n_b") >= 1L)
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
    }
  }

  test("q154: clusters are closed over match pairs; canonical = min-id member") {
    val t = sf("sf0.001")
    val rows = FuzzyJoin.entityClusters(t).collect()
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    val byId = rows.map(r => r.getAs[Long]("ent_id") -> r).toMap
    // cluster id is the minimum member id, and the canonical name is that
    // member's surface form
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("ent_id")).min == cid)
      val canon = byId(cid).getAs[String]("name")
      members.foreach { m =>
        assert(m.getAs[String]("canonical_name") == canon)
        assert(m.getAs[Long]("cluster_size") == members.length)
      }
    }
    // every fuzzy match pair landed in one cluster (transitive closure ⊇ edges)
    FuzzyJoin.fuzzyNameJoin(t).collect().foreach { p =>
      assert(byName(p.getAs[String]("name_a")).getAs[Long]("cluster_id") ==
        byName(p.getAs[String]("name_b")).getAs[Long]("cluster_id"),
        s"matched pair split across clusters: ${p.getAs[String]("name_a")}")
    }
    assert(rows.exists(_.getAs[Long]("cluster_size") > 1),
      "fixture has no fuzzy matches — q154 would be testing the diagonal")
  }
}
