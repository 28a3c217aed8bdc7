package graft

import graft.functions.ZOrder
import graft.sources.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order layout: the bit interleave against an independent per-bit
  * reimplementation, and the layout claim itself — z-clustered files have
  * tight min/max ranges in BOTH dimensions where a linear sort leaves the
  * second dimension spanning the full domain in every file. */
class LayoutSpec extends SparkSpec {

  // independent Morton reference: bit-by-bit, no shared code with ZOrder
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
    }

  test("zValue matches a per-bit Morton reference, including 16-bit masking") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L), (3L, 70000L)) // >16-bit inputs mask down
    val df = spark.createDataFrame(cases).toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0) & 0xFFFF, r.getLong(1) & 0xFFFF),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order preserves locality: close points get close z-values within a quadrant") {
    // both coordinates in [0,16): z < 256 — the whole quadrant maps below
    // any point with a coordinate >= 16 in the same 16x16 grid scale
    val inQuad = mortonRef(15, 15)
    assert(inQuad == 255L)
    assert(mortonRef(16, 0) == 256L && mortonRef(0, 16) == 512L)
  }

  test("q113 z-values use the full curve at EVERY fixture scale (domains from data)") {
    // a hardcoded domain fits exactly one scale factor; deriving bounds
    // from the data must light up the top interleave bits regardless of
    // how wide the dimensions actually are
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val z = graft.sources.Layout.zOrderPreview(sf(dir))
        .agg(min(col("zvalue")).as("lo"), max(col("zvalue")).as("hi"))
        .collect()(0)
      // hour-dim bit 15 lands at z-bit 30, user-dim bit 15 at z-bit 31:
      // the max z-value must have at least one of the top two bits set
      assert(z.getAs[Long]("hi") >= (1L << 30),
        s"$dir: curve top never reached (max z = ${z.getAs[Long]("hi")})")
      assert(z.getAs[Long]("lo") < (1L << 24),
        s"$dir: curve bottom never reached (min z = ${z.getAs[Long]("lo")})")
    }
  }

  test("hilbert expression matches the single-node reference (codegen path)") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (32768L, 32767L), (70000L, 3L), (3L, 70000L))
    val df = spark.createDataFrame(cases).toDF("x", "y")
    graft.functions.HilbertCurve.register(spark)
    df.select(col("x"), col("y"),
        graft.functions.HilbertCurve.hilbertIndex(col("x"), col("y")).as("h"))
      .collect().foreach { r =>
        assert(r.getLong(2) == graft.functions.HilbertCurve.xy2d(r.getLong(0), r.getLong(1)),
          s"(${r.getLong(0)}, ${r.getLong(1)})")
      }
  }

  test("hilbert curve: bijective on the origin subsquare and step-adjacent") {
    // the order-16 curve starts at (0,0) and fills the quadrant containing
    // its start completely before leaving it (at every level the (0,0)
    // quadrant contributes d-digit 0), so the 64x64 origin subsquare must
    // map EXACTLY onto d in [0, 4096) — and walking d must move one
    // Manhattan step at a time. This pins the whole rotate/reflect
    // recursion, not just sampled values.
    val cells = for (x <- 0 until 64; y <- 0 until 64)
      yield graft.functions.HilbertCurve.xy2d(x.toLong, y.toLong) -> (x, y)
    val byD = cells.toMap
    assert(byD.size == 4096, "curve not bijective on the subsquare")
    assert(cells.map(_._1).min == 0L && cells.map(_._1).max == 4095L,
      "origin subsquare does not map onto [0, 4096)")
    (0L until 4095L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("clusterHilbert bounds BOTH dimensions' per-file spans") {
    val t = sf("sf0.01")
    val hourIdx = floor(unix_timestamp(col("ts")) / 3600L).cast("long") - 473352L
    val events = t.events.select(col("event_id"), hourIdx.as("h"), col("user_id"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hilbert").toString + "/files"
    Layout.clusterHilbert(events, col("h"), col("user_id"), files = 16)
      .write.parquet(tmp)
    val files = spark.read.parquet(tmp)
    assert(meanSpan(files, "h", 0, 720) < 0.5)
    assert(meanSpan(files, "user_id", 0, 150) < 0.5)
    assert(files.count() == events.count())
  }

  /** Mean per-file (max-min) extent of a column, as a fraction of its
    * global extent. */
  private def meanSpan(files: DataFrame, c: String, lo: Long, hi: Long): Double = {
    val spans = files.groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).as("span"))
      .agg(avg(col("span"))).collect()(0).getDouble(0)
    spans / (hi - lo).toDouble
  }

  test("writeZOrdered bounds BOTH dimensions' per-file spans; linear sort only one") {
    val t = sf("sf0.01")
    val hourIdx = floor(unix_timestamp(col("ts")) / 3600L).cast("long") - 473352L
    val events = t.events.select(col("event_id"), hourIdx.as("h"), col("user_id")).cache()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
      val zDir = s"$tmp/z"
      val linDir = s"$tmp/lin"
      Layout.writeZOrdered(events, col("h"), col("user_id"), zDir, files = 16)
      events.repartitionByRange(16, col("h")).sortWithinPartitions(col("h"))
        .write.parquet(linDir)

      val zFiles = spark.read.parquet(zDir)
      val linFiles = spark.read.parquet(linDir)
      // 10k events over 720 hours x 150 users; 16 z-range files ≈ 4x4
      // quadrants → each file should cover well under half of EACH domain
      val zH = meanSpan(zFiles, "h", 0, 720)
      val zU = meanSpan(zFiles, "user_id", 0, 150)
      assert(zH < 0.5, s"z-layout hour span $zH")
      assert(zU < 0.5, s"z-layout user span $zU")
      // the linear layout nails hours but every file spans ~all users
      val linU = meanSpan(linFiles, "user_id", 0, 150)
      assert(linU > 0.9, s"linear layout should not cluster users, got $linU")
      assert(zU < linU / 2, s"z-layout user span $zU not better than linear $linU")
      // row content identical either way
      assert(zFiles.count() == events.count())
      assert(zFiles.agg(sum(col("event_id"))).collect()(0).getLong(0) ==
        events.agg(sum(col("event_id"))).collect()(0).getLong(0))
    } finally events.unpersist()
  }
}
