package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * Estimator: hash every value into [0, M); keep the k smallest DISTINCT
  * hashes; if fewer than k distinct hashes exist the count is exact,
  * otherwise estimate `(k-1) * M / h_(k)` where `h_(k)` is the k-th
  * smallest (Bar-Yossef et al. 2002; the classic bottom-k sketch).
  *
  * Why KMV next to Spark's HLL (`approx_count_distinct`):
  *  - **engine-portable**: with the portable hash below, any SQL engine
  *    reproduces the estimate bit-for-bit (`list_sort(list(DISTINCT h))[k]`
  *    in DuckDB) — HLL sketches are implementation-defined;
  *  - **mergeable**: union of two sketches = merge the sorted arrays, keep
  *    k smallest — so partial aggregation / AQE re-partitioning work and
  *    the result is layout-independent, the same guarantee ExactAgg gives
  *    exact aggregates;
  *  - bounded state: k longs per group (k=256 → 2 KiB), shuffle carries
  *    sketches, not values.
  *
  * Relative error ~ 1/sqrt(k): k=256 → ~6%.
  */
object KmvSketch {

  val M = 2147483647L // 2^31 - 1

  /** Portable 31-bit hash of a non-negative integer key: two multiplicative
    * rounds mod M (Knuth 2654435761, then 2246822519). All intermediates
    * stay below 2^63 so overflow-checking engines (DuckDB) evaluate it
    * exactly: `(x mod M) * 2654435761 < 2^62.3`. */
  def hash31(c: Column): Column =
    pmod(pmod(pmod(c.cast("long"), lit(M)) * lit(2654435761L), lit(M)) *
      lit(2246822519L) + lit(1L), lit(M))

  /** The DuckDB mirror of [[hash31]]. */
  def hash31Sql(x: String): String =
    s"(((($x) % $M) * 2654435761 % $M) * 2246822519 + 1) % $M"

  /** The DuckDB mirror of the estimator over a value expression, for use in
    * a GROUP BY: exact below k distinct hashes, else (k-1)*M / h_(k). */
  def estimateSql(hashExpr: String, k: Int): String = {
    val num = (k - 1).toDouble * M // exact below 2^53
    s"""(CASE WHEN len(list_distinct(list($hashExpr))) < $k
       |      THEN CAST(len(list_distinct(list($hashExpr))) AS DOUBLE)
       |      ELSE $num / list_sort(list(DISTINCT $hashExpr))[$k] END)""".stripMargin
  }

  /** Typed Aggregator: buffer = sorted distinct array of the k smallest
    * hashes. reduce is O(log k) search + O(k) insert on new minima only;
    * merge is a linear sorted-merge. Deterministic for any input order. */
  private class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Double] {
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // h < current max: insert, drop largest
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) a(i) else b(j)
        if (takeA) i += 1 else j += 1
        if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 } // cross-array dedupe
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else ((k - 1).toDouble * M) / buf(k - 1)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV distinct-estimate aggregate column over a pre-hashed long column
    * (apply [[hash31]] first). Aggregator-via-udaf form — kept as the
    * readable reference implementation and parity check for
    * [[kmvDistinctNative]]. */
  def kmvDistinct(hashed: Column, k: Int = 256): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hashed)

  /** Mutable bottom-k buffer for the native aggregate: a sorted distinct
    * prefix of the k smallest hashes, updated in place (no per-row
    * allocation, unlike the immutable Aggregator buffer above). */
  final class KmvBuffer(val k: Int) {
    val hashes = new Array[Long](k)
    var n = 0

    def insert(h: Long): Unit = {
      val pos = java.util.Arrays.binarySearch(hashes, 0, n, h)
      if (pos < 0) {
        val ins = -pos - 1
        if (n < k) {
          System.arraycopy(hashes, ins, hashes, ins + 1, n - ins)
          hashes(ins) = h
          n += 1
        } else if (ins < k) { // new minimum: insert, drop current max
          System.arraycopy(hashes, ins, hashes, ins + 1, k - ins - 1)
          hashes(ins) = h
        }
      }
    }

    def estimate: Double =
      if (n < k) n.toDouble else (k - 1).toDouble * M / hashes(k - 1)
  }

  /** Catalyst-native KMV aggregate ([[TypedImperativeAggregate]]): the
    * buffer lives as an opaque object during partial aggregation and is
    * serialized ONLY at shuffle boundaries (4 + 8·n bytes). The
    * Aggregator-via-udaf path above routes every merge through its
    * ExpressionEncoder, deserializing/reserializing the array each time —
    * this form cuts that overhead on wide groupings, where each of
    * thousands of groups carries its own sketch. Estimator and input
    * contract (pre-[[hash31]]ed column) are identical, so the DuckDB
    * oracle SQL ([[estimateSql]]) replays both forms bit-for-bit. */
  case class KmvDistinctNative(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct expects a pre-hashed bigint/int column, got ${other.catalogString}")
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kmv_distinct"

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) buffer.insert(v.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      var i = 0
      while (i < other.n) { buffer.insert(other.hashes(i)); i += 1 }
      buffer
    }

    override def eval(buffer: KmvBuffer): Any = buffer.estimate

    override def serialize(buffer: KmvBuffer): Array[Byte] =
      serializeBuffer(buffer)

    override def deserialize(bytes: Array[Byte]): KmvBuffer =
      deserializeBuffer(bytes, k)

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctNative =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctNative =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The state half of the KMV state/merge pair (the bitmap-distinct
    * pattern applied to the approximate sketch): evals to the SERIALIZED
    * bottom-k buffer instead of the estimate, so distinct estimates
    * compose across time windows or rollup levels without re-touching the
    * fact. Bottom-k of a union of bottom-k sketches IS the global
    * bottom-k (any global minimum survives its own partition's sketch),
    * so re-aggregation with [[KmvMergeAgg]] is lossless w.r.t. the
    * estimator — and, unlike HLL states, fully oracle-replayable. */
  case class KmvStateAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_state expects a pre-hashed bigint/int column, got ${other.catalogString}")
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kmv_state"

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) buffer.insert(v.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      var i = 0
      while (i < other.n) { buffer.insert(other.hashes(i)); i += 1 }
      buffer
    }

    override def eval(buffer: KmvBuffer): Any = serializeBuffer(buffer)
    override def serialize(buffer: KmvBuffer): Array[Byte] = serializeBuffer(buffer)
    override def deserialize(bytes: Array[Byte]): KmvBuffer = deserializeBuffer(bytes, k)

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvStateAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvStateAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The merge half: unions serialized [[KmvStateAgg]] states and evals to
    * the distinct estimate. */
  case class KmvMergeAgg(
      child: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_merge expects a binary kmv-state column, got ${other.catalogString}")
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kmv_merge"

    override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

    override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
      val v = child.eval(input)
      if (v != null) {
        val other = deserializeBuffer(v.asInstanceOf[Array[Byte]], k)
        var i = 0
        while (i < other.n) { buffer.insert(other.hashes(i)); i += 1 }
      }
      buffer
    }

    override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
      var i = 0
      while (i < other.n) { buffer.insert(other.hashes(i)); i += 1 }
      buffer
    }

    override def eval(buffer: KmvBuffer): Any = buffer.estimate
    override def serialize(buffer: KmvBuffer): Array[Byte] = serializeBuffer(buffer)
    override def deserialize(bytes: Array[Byte]): KmvBuffer = deserializeBuffer(bytes, k)

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** State layout: ([[SketchState]] versioned header carrying the builder's
    * k, n, n sorted hashes). Carrying the builder's k in the header is what
    * makes k-mismatched merges SAFE to adjudicate: without it, a state with
    * n < k minima is indistinguishable from an unsaturated exact buffer.
    * The version byte makes the layout durable for checkpointed states
    * (pre-versioning k-only headers still read as version 0). */
  private val stateVersion = 1

  private def serializeBuffer(buffer: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(SketchState.HeaderBytes + 4 + 8 * buffer.n)
    SketchState.putHeader(bb, stateVersion, buffer.k)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.hashes(i)); i += 1 }
    bb.array()
  }

  private def deserializeBuffer(bytes: Array[Byte], k: Int): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val (_, stateK) = SketchState.readHeader(bb, stateVersion, "kmv")
    // Merging DOWN (state k > merge k) is sound: hashes are stored sorted
    // ascending, so keeping the first min(n, k) minima degrades the sketch
    // to the merge-side k — exactly what insert-based merging would
    // produce. Merging UP is NOT: a saturated k=256 state merged at k=512
    // would present its 256 minima as an unsaturated exact buffer and
    // report 256 "exact" distincts regardless of the true count — so that
    // direction is a hard error, not a silent underestimate.
    require(stateK >= k,
      s"kmv merge k=$k exceeds the serialized state's k=$stateK; " +
        "merge k must be <= the smallest builder k")
    val out = new KmvBuffer(k)
    val n = bb.getInt()
    out.n = math.min(n, k)
    var i = 0
    while (i < out.n) { out.hashes(i) = bb.getLong(); i += 1 }
    out
  }

  private val nativeFnName = "graft_kmv_distinct"
  private val stateFnName = "graft_kmv_state"
  private val mergeFnName = "graft_kmv_merge"

  private def kArg(exprs: Seq[Expression]): Int =
    exprs.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(256)

  /** Registers the native aggregates; k rides as an optional second literal
    * argument (default 256). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      nativeFnName, exprs => KmvDistinctNative(exprs.head, kArg(exprs)), "scala_udf")
    reg.createOrReplaceTempFunction(
      stateFnName, exprs => KmvStateAgg(exprs.head, kArg(exprs)), "scala_udf")
    reg.createOrReplaceTempFunction(
      mergeFnName, exprs => KmvMergeAgg(exprs.head, kArg(exprs)), "scala_udf")
  }

  /** Native KMV distinct-estimate over a pre-hashed long column. Call
    * [[register]] on the session first. */
  def kmvDistinctNative(hashed: Column, k: Int = 256): Column =
    call_function(nativeFnName, hashed, lit(k))

  /** Serialized bottom-k state over a pre-hashed long column; re-aggregate
    * with [[kmvMerge]]. Call [[register]] first. */
  def kmvState(hashed: Column, k: Int = 256): Column =
    call_function(stateFnName, hashed, lit(k))

  /** Distinct estimate from merged [[kmvState]] states. Call [[register]]
    * first. */
  def kmvMerge(state: Column, k: Int = 256): Column =
    call_function(mergeFnName, state, lit(k))
}
