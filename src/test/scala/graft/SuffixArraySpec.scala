package graft

import java.nio.file.Files

import graft.core.Tables
import graft.ext.{Dedup, SuffixArray}

/** Suffix-array construction (q237/q238) against single-node ground truth:
  * the spans must equal an uncapped brute-force LCP sweep AND q123's
  * prefix-class union at the same minLen (the two distributed span
  * machineries validate each other), and the stats row must reproduce
  * brute-force values (longest repeat, its lexicographically first
  * location, suffix and coverage counts). */
class SuffixArraySpec extends SparkSpec {

  /** Uncapped brute force: for every (doc, pos), max LCP against every
    * other position; intervals [pos, pos+lcp) with lcp >= minLen merged
    * per doc. Mirrors DedupSpec's helper (duplicated deliberately so the
    * two spec files stay independent). */
  private def bruteSpans(docs: Seq[(Long, String)], minLen: Int): Seq[(Long, Long, Long)] = {
    val lm = bruteLcpMax(docs)
    val intervals = lm.collect {
      case ((id, p), l) if l >= minLen => (id, p.toLong, (p + l).toLong)
    }.toSeq
    intervals.groupBy(_._1).toSeq.flatMap { case (id, iv) =>
      val sorted = iv.map { case (_, s, e) => (s, e) }.sorted
      val out = Seq.newBuilder[(Long, Long, Long)]
      var cs = -1L; var ce = -1L
      sorted.foreach { case (s, e) =>
        if (cs < 0) { cs = s; ce = e }
        else if (s > ce) { out += ((id, cs, ce - cs)); cs = s; ce = e }
        else ce = math.max(ce, e)
      }
      if (cs >= 0) out += ((id, cs, ce - cs))
      out.result()
    }.sortBy(r => (r._1, r._2))
  }

  /** Brute lcp_max per (doc, pos). */
  private def bruteLcpMax(docs: Seq[(Long, String)]): Map[(Long, Int), Int] = {
    val toks = docs.map { case (id, tx) => id -> tx.trim.toLowerCase.split("\\s+").toVector }
    val all = for ((id, ts) <- toks; p <- ts.indices) yield (id, ts, p)
    def lcp(a: Vector[String], i: Int, b: Vector[String], j: Int): Int = {
      var l = 0
      while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
      l
    }
    all.map { case (id, ts, p) =>
      val rep = all.iterator
        .filter { case (id2, _, p2) => (id2, p2) != ((id, p)) }
        .map { case (_, ts2, p2) => lcp(ts, p, ts2, p2) }.maxOption.getOrElse(0)
      (id, p) -> rep
    }.toMap
  }

  private def writeDocs(docs: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sa").toFile.getAbsolutePath
    docs.map { case (id, tx) => (id, tx, "en", "synthetic", tx.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/documents.parquet")
    Tables(spark, base)
  }

  private val planted: Seq[(Long, String)] = {
    val long = (1 to 90).map(i => s"s$i").mkString(" ")  // 90-token repeat
    val short = (1 to 17).map(i => s"t$i").mkString(" ")
    val sub = (1 to 9).map(i => s"u$i").mkString(" ")    // below minLen=16
    Seq(
      (0L, s"alpha $long beta $sub gamma"),
      (1L, s"$long delta $short"),
      (2L, s"one two $short three $sub four"),
      (3L, (1 to 50).map(i => s"z$i").mkString(" ")),    // nothing shared
      (4L, s"pre ${(1 to 30).map(_ => "rep").mkString(" ")} post")) // self-overlap
  }

  test("saSpans equals uncapped brute force on the planted corpus") {
    val t = writeDocs(planted)
    val got = SuffixArray.saSpans(t, minLen = 16).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSeq
    assert(got == bruteSpans(planted, minLen = 16), s"got=$got")
    // the 90-token repeat is reported at its FULL length — the any-length
    // contract the windowed forms can only reach via interval chaining
    assert(got.exists { case (id, _, l) => id == 0L && l == 90L })
  }

  test("saSpans works at non-power-of-two minLen (q123 requires 2^k)") {
    val t = writeDocs(planted)
    val got = SuffixArray.saSpans(t, minLen = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSeq
    assert(got == bruteSpans(planted, minLen = 10), s"got=$got")
  }

  test("saSpans equals q123's prefix-class union at the same minLen") {
    val t = writeDocs(planted)
    val sa = SuffixArray.saSpans(t, minLen = 16).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSeq
    val classes = Dedup.maximalDuplicateSpansExact(t, minLen = 16, cap = 64)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start").toLong,
        r.getAs[Int]("span_tokens").toLong)).toSeq
    assert(sa == classes, s"sa=$sa\nclasses=$classes")
  }

  test("stats row reproduces brute-force longest repeat and coverage") {
    val t = writeDocs(planted)
    val row = SuffixArray.suffixArrayStats(t, minLen = 16).head()
    val lm = bruteLcpMax(planted)
    val maxLcp = lm.values.max
    assert(row.getAs[Long]("max_lcp") === maxLcp.toLong)
    val repAt = lm.collect { case ((id, p), l) if l == maxLcp => (id, p) }.min
    assert((row.getAs[Long]("rep_doc_id"), row.getAs[Long]("rep_pos")) ===
      ((repAt._1, repAt._2.toLong)))
    assert(row.getAs[Long]("n_dup_suffixes") ===
      lm.values.count(_ >= 16).toLong)
    val spans = bruteSpans(planted, minLen = 16)
    assert(row.getAs[Long]("n_spans") === spans.size.toLong)
    assert(row.getAs[Long]("dup_tokens") === spans.map(_._3).sum)
    assert(row.getAs[Long]("n_docs") === planted.size.toLong)
    assert(row.getAs[Long]("n_tokens") ===
      planted.map(_._2.trim.split("\\s+").length.toLong).sum)
  }

  test("repeat-free corpus: empty spans, zero dup suffixes") {
    val docs = Seq(
      (0L, (1 to 40).map(i => s"a$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"b$i").mkString(" ")))
    val t = writeDocs(docs)
    assert(SuffixArray.saSpans(t, minLen = 16).count() === 0L)
    val row = SuffixArray.suffixArrayStats(t, minLen = 16).head()
    assert(row.getAs[Long]("max_lcp") === 0L)
    assert(row.getAs[Long]("n_dup_suffixes") === 0L)
    assert(row.getAs[Long]("dup_tokens") === 0L)
  }

  // ── q247 repeat inventory ─────────────────────────────────────────────

  /** Brute-force LCP-interval node enumeration: sort all suffixes (real
    * tokens ordered after per-doc unique sentinels, mirroring the engine's
    * (flag, skey) alphabet), compute adjacent LCPs, then for each LCP
    * position find prev/next-smaller by linear scan. Returns the engine's
    * output shape plus, separately, every occurrence for coverage checks. */
  private def bruteNodes(docs: Seq[(Long, String)], minLen: Int,
                         preview: Int = 8)
      : (Seq[(Long, Long, Long, Long, String)],
         Seq[(Int, Long, Long, Long)],
         Seq[(Int, Int, Int)]) = {
    val toks = docs.map { case (id, tx) =>
      (id, tx.trim.toLowerCase.split("\\s+").toVector) }
    def keyAt(s: (Long, Vector[String], Int), off: Int): (Int, String) = {
      val (id, ts, p) = s
      if (p + off == ts.length) (0, f"$id%020d")
      else if (p + off > ts.length) (-1, "") // past sentinel: never reached
      else (1, ts(p + off))
    }
    val sufs = (for ((id, ts) <- toks; p <- 0 to ts.length)
      yield (id, ts, p)).toVector
    val sorted = sufs.sortWith { (a, b) =>
      var i = 0
      var r = 0
      while (r == 0) { // unique sentinels guarantee a difference in range
        val (ka, kb) = (keyAt(a, i), keyAt(b, i))
        r = Ordering[(Int, String)].compare(ka, kb)
        i += 1
      }
      r < 0
    }
    val n = sorted.length
    def lcp(a: (Long, Vector[String], Int), b: (Long, Vector[String], Int)): Int = {
      var l = 0
      while (keyAt(a, l) == keyAt(b, l)) l += 1
      l
    }
    // L0(j) = lcp(sorted(j-1), sorted(j)), j in 1..n-1
    val L0 = Array.tabulate(n)(j => if (j == 0) 0 else lcp(sorted(j - 1), sorted(j)))
    val seen = scala.collection.mutable.Set[(Int, Int, Int)]()
    val nodes = Seq.newBuilder[(Long, Long, Long, Long, String)]
    val occs = Seq.newBuilder[(Int, Long, Long, Long)] // (node, doc, pos, len)
    val ivls = Seq.newBuilder[(Int, Int, Int)] // (node, ps, ns) rank interval
    var nodeIdx = 0
    for (j <- 1 until n if L0(j) >= minLen) {
      val v = L0(j)
      var ps = j - 1
      while (ps >= 1 && L0(ps) >= v) ps -= 1
      if (ps < 1) ps = 0
      var ns = j + 1
      while (ns < n && L0(ns) >= v) ns += 1
      if (seen.add((ps, ns, v))) {
        val ex = sorted(ps) // suffix at the run's first rank
        val previewTx = ex._2.slice(ex._3, ex._3 + math.min(v, preview))
          .mkString(" ")
        nodes += ((v.toLong, (ns - ps).toLong, ex._1, ex._3.toLong, previewTx))
        ivls += ((nodeIdx, ps, ns))
        (ps until ns).foreach { r =>
          occs += ((nodeIdx, sorted(r)._1, sorted(r)._3.toLong, v.toLong))
        }
        nodeIdx += 1
      }
    }
    (nodes.result(), occs.result(), ivls.result()) // creation order = occ tags
  }

  test("repeatInventory equals brute-force LCP-interval enumeration") {
    val t = writeDocs(planted)
    for (minLen <- Seq(16, 3)) {
      val got = SuffixArray.repeatInventory(t, minLen = minLen).collect()
        .map(r => (r.getAs[Long]("len"), r.getAs[Long]("n_occ"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
          r.getAs[String]("preview"))).toSeq
      val (expRaw, _, _) = bruteNodes(planted, minLen)
      val exp = expRaw.sortBy { case (l, _, id, p, _) => (-l, id, p) }
      assert(got == exp, s"minLen=$minLen\ngot=$got\nexp=$exp")
      assert(exp.nonEmpty, s"fixture must plant nodes at minLen=$minLen")
    }
  }

  test("repeatInventory occurrence coverage equals saSpans (⊇ q238 claim)") {
    val t = writeDocs(planted)
    val spans = SuffixArray.saSpans(t, minLen = 16).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSeq
    val (_, occs, _) = bruteNodes(planted, minLen = 16)
    // merge [pos, pos+len) intervals per doc — must reproduce q238 exactly
    val merged = occs.map { case (_, id, p, l) => (id, p, p + l) }
      .groupBy(_._1).toSeq.flatMap { case (id, iv) =>
        val s = iv.map { case (_, a, b) => (a, b) }.sorted
        val out = Seq.newBuilder[(Long, Long, Long)]
        var cs = -1L; var ce = -1L
        s.foreach { case (a, b) =>
          if (cs < 0) { cs = a; ce = b }
          else if (a > ce) { out += ((id, cs, ce - cs)); cs = a; ce = b }
          else ce = math.max(ce, b)
        }
        if (cs >= 0) out += ((id, cs, ce - cs))
        out.result()
      }.sortBy(r => (r._1, r._2))
    assert(merged == spans.sortBy(r => (r._1, r._2)),
      s"merged=$merged\nspans=${spans.toSeq}")
  }

  // ── q250 repeat source spread ─────────────────────────────────────────

  private def writeDocsSrc(docs: Seq[(Long, String, String)]): Tables = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_sa_src").toFile.getAbsolutePath
    docs.map { case (id, tx, src) => (id, tx, "en", src, tx.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$base/documents.parquet")
    Tables(spark, base)
  }

  test("repeatSourceSpread equals brute-force classification (incl. the cap)") {
    val srcOf = Map(0L -> "sA", 1L -> "sB", 2L -> "sC", 3L -> "sC", 4L -> "sC")
    val t = writeDocsSrc(planted.map { case (id, tx) => (id, tx, srcOf(id)) })
    val (nodes, occs, _) = bruteNodes(planted, minLen = 3)
    val byNode = occs.groupBy(_._1)
    for (cap <- Seq(256, 3)) {
      val got = SuffixArray.repeatSourceSpread(t, minLen = 3, occCap = cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      val classed = nodes.zipWithIndex.map { case ((len, nOcc, _, _, _), idx) =>
        val cls =
          if (nOcc > cap) "ubiquitous"
          else if (byNode(idx).map(o => srcOf(o._2)).distinct.size >= 2)
            "cross_source"
          else "within_source"
        (cls, len, nOcc)
      }
      val exp = classed.groupBy(_._1).toSeq.map { case (cls, g) =>
        (cls, g.size.toLong, g.map(_._2).sum,
          g.map(x => x._2 * x._3).sum, g.map(_._2).max)
      }.sortBy(_._1)
      assert(got == exp, s"cap=$cap\ngot=$got\nexp=$exp")
      if (cap == 3) assert(exp.exists(_._1 == "ubiquitous"),
        "low cap must actually produce a capped (ubiquitous) class")
    }
    val full = SuffixArray.repeatSourceSpread(t, minLen = 3).collect()
      .map(_.getString(0)).toSet
    assert(full.contains("cross_source") && full.contains("within_source"),
      s"fixture must exercise both spread classes, got $full")
  }

  // ── q252 cross-source longest common substring ────────────────────────

  test("crossSourceLcs equals brute-force pair enumeration (incl. the cap)") {
    val srcOf = Map(0L -> "sA", 1L -> "sB", 2L -> "sC", 3L -> "sC", 4L -> "sC")
    val t = writeDocsSrc(planted.map { case (id, tx) => (id, tx, srcOf(id)) })
    val (nodes, occs, ivls) = bruteNodes(planted, minLen = 3)
    val byNode = occs.groupBy(_._1)
    val ivlOf = ivls.map { case (i, ps, ns) => i -> ((ps, ns)) }.toMap
    for (cap <- Seq(256, 3)) {
      val got = SuffixArray.crossSourceLcs(t, minLen = 3, occCap = cap)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getString(4))).toSeq
      val rows = nodes.zipWithIndex.flatMap {
        case ((len, nOcc, _, _, preview), idx) =>
          if (nOcc > cap) Seq.empty
          else {
            val srcs = byNode(idx).map(o => srcOf(o._2)).distinct.sorted
            for (i <- srcs.indices; j <- (i + 1) until srcs.size)
              yield (srcs(i), srcs(j), len, idx, preview)
          }
      }
      val exp = rows.groupBy(r => (r._1, r._2)).toSeq.map { case ((a, b), g) =>
        // argmax by the unique (len, rank-interval) node id — the engine's
        // (len, a, b) tie-break under the monotone j→i index shift
        val best = g.maxBy(r => (r._3, ivlOf(r._4)._1, ivlOf(r._4)._2))
        (a, b, g.map(_._3).max, g.size.toLong, best._5)
      }.sortBy(r => (r._1, r._2))
      assert(got == exp, s"cap=$cap\ngot=$got\nexp=$exp")
      if (cap == 256) {
        assert(exp.nonEmpty, "fixture must share repeats across sources")
        assert(nodes.exists(_._2 > 3),
          "fixture must hold a node the low cap excludes")
      }
    }
  }

  // ── q256 served cross-source contamination matrix ─────────────────────

  test("contaminationMatrixServed == crossSourceLcs + gate, from the artifact") {
    val srcOf = Map(0L -> "sA", 1L -> "sB", 2L -> "sC", 3L -> "sC", 4L -> "sC")
    val t = writeDocsSrc(planted.map { case (id, tx) => (id, tx, srcOf(id)) })
    val direct = SuffixArray.crossSourceLcs(t, minLen = 3, occCap = 256)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(direct.nonEmpty, "fixture must share repeats across sources")
    // a gate length between the min and max shared-LCS keeps both
    // verdicts populated when the fixture has distinct lengths
    val gateLen = (direct.map(_._3).min + direct.map(_._3).max) / 2 + 1
    val served = SuffixArray.contaminationMatrixServed(
        t, minLen = 3, occCap = 256, gateLen = gateLen.toInt).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getInt(5))).toSeq
    val exp = direct.map { case (a, b, len, n, prev) =>
      (a, b, len, n, prev, if (len >= gateLen) 1 else 0)
    }
    assert(served == exp, s"served=$served\nexp=$exp")
    if (direct.map(_._3).distinct.size > 1)
      assert(served.map(_._6).distinct.sorted == Seq(0, 1),
        "distinct lengths must split the gate verdicts")
    // the matrix is a persisted catalog artifact, not a per-request walk
    assert(t.spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_xsrc_")),
      "the contamination matrix must live as a catalog table")
    // second serve returns identical rows (reads the table, no rebuild)
    val again = SuffixArray.contaminationMatrixServed(
        t, minLen = 3, occCap = 256, gateLen = gateLen.toInt).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getInt(5))).toSeq
    assert(again == exp)
  }

  test("repeat-free corpus: empty inventory with the right schema") {
    val docs = Seq(
      (0L, (1 to 40).map(i => s"c$i").mkString(" ")),
      (1L, (1 to 40).map(i => s"d$i").mkString(" ")))
    val t = writeDocs(docs)
    val inv = SuffixArray.repeatInventory(t, minLen = 16)
    assert(inv.columns.toSeq ==
      Seq("len", "n_occ", "doc_id", "pos", "preview"))
    assert(inv.count() === 0L)
  }

  test("corpus with a >=4096-token repeat fails loudly, not silently") {
    val huge = (1 to 4100).map(_ => "w").mkString(" ") // 4100 equal tokens
    val t = writeDocs(Seq((0L, huge)))
    val e = intercept[IllegalArgumentException](
      SuffixArray.saSpans(t, minLen = 16).count())
    assert(e.getMessage.contains("MaxLevels"))
  }
}
