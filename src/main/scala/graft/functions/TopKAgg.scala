package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — the scale path for "best k rows per
  * group".
  *
  * The window form (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`)
  * shuffles and SORTS every row of the input: at 100 TB that is a full-data
  * exchange plus an O(n log n) sort per partition, to keep k rows per group.
  * This aggregate keeps a k-element binary heap per group inside ordinary
  * hash aggregation, so
  *
  *  - partial aggregation bounds the shuffle at k pairs per (group,
  *    partition) — the exchange carries sketch-sized state, never the data;
  *  - no sort ever sees the full input (only the final k elements per group
  *    are sorted, at eval);
  *  - the heap state is mergeable, so AQE re-partitioning and partial
  *    pushdown compose like any other aggregate.
  *
  * Ordering is the total order (ord DESC, payload ASC) — the deterministic
  * tiebreak makes the kept set unique for any input order/layout, which is
  * what makes results hash-comparable against a
  * `row_number() OVER (ORDER BY ord DESC, payload)` oracle.
  *
  * Two call shapes, one kernel:
  *  - top-k by a value column (quality, size, score): `topKBy(v, id, k)`;
  *  - deterministic k-per-group UNIFORM sample: order by a portable hash of
  *    the id ([[KmvSketch.hash31]] negated, so the k smallest hashes win) —
  *    the per-group analogue of [[graft.ext.Sampling.deterministicSample]].
  */
object TopKAgg {

  /** Serialized-state format version (see [[SketchState]]); bump on any
    * byte-layout change. Both kernels share it — their layouts change
    * together by the mirrored-contract rule below. */
  private[functions] val stateVersion = 1

  /** Fixed-capacity binary heap over (ord, payload) pairs; the WORST kept
    * pair sits at the root, so saturated inserts are reject-or-replace-root
    * in O(log k) with zero allocation. "a worse than b" ⇔ a.ord < b.ord,
    * ties broken by larger payload (so the kept set is the k first rows
    * under ORDER BY ord DESC, payload ASC). */
  final class TopKBuffer(val k: Int) {
    val ords = new Array[Long](k)
    val pays = new Array[Long](k)
    var n = 0

    private def worse(ai: Long, ap: Long, bi: Long, bp: Long): Boolean =
      ai < bi || (ai == bi && ap > bp)

    private def swap(i: Int, j: Int): Unit = {
      val to = ords(i); ords(i) = ords(j); ords(j) = to
      val tp = pays(i); pays(i) = pays(j); pays(j) = tp
    }

    def insert(o: Long, p: Long): Unit = {
      if (n < k) {
        ords(n) = o; pays(n) = p
        var i = n
        n += 1
        // sift up: a node worse than its parent bubbles toward the root
        while (i > 0 && worse(ords(i), pays(i), ords((i - 1) / 2), pays((i - 1) / 2))) {
          swap(i, (i - 1) / 2)
          i = (i - 1) / 2
        }
      } else if (worse(ords(0), pays(0), o, p)) { // better than the current worst
        ords(0) = o; pays(0) = p
        var i = 0
        var done = false
        while (!done) { // sift down toward the worse child
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < n && worse(ords(l), pays(l), ords(w), pays(w))) w = l
          if (r < n && worse(ords(r), pays(r), ords(w), pays(w))) w = r
          if (w == i) done = true
          else { swap(i, w); i = w }
        }
      }
    }

    /** Kept pairs, best-first — only ever sorts k elements. */
    def sortedPairs: Array[(Long, Long)] = {
      val out = Array.tabulate(n)(i => (ords(i), pays(i)))
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }

  private val elemType = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false)))

  /** `graft_topk(ord, payload, k)` → array<struct<ord, payload>> of the k
    * best (ord DESC, payload ASC) pairs, best-first. */
  case class TopKByAgg(
      left: Expression,
      right: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(s"graft_topk k must be positive, got $k")
      case (LongType | IntegerType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects integral (ord, payload) columns, got (${l.catalogString}, ${r.catalogString})")
    }

    override def dataType: DataType = ArrayType(elemType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_topk"

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
      val o = left.eval(input)
      val p = right.eval(input)
      if (o != null && p != null)
        buffer.insert(o.asInstanceOf[Number].longValue(), p.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
      var i = 0
      while (i < other.n) { buffer.insert(other.ords(i), other.pays(i)); i += 1 }
      buffer
    }

    override def eval(buffer: TopKBuffer): Any =
      new GenericArrayData(buffer.sortedPairs.map { case (o, p) =>
        InternalRow(o, p): Any
      })

    /** State layout: ([[SketchState]] versioned header with builder k, n,
      * n (ord, payload) pairs) — the k header follows [[KmvSketch]]'s
      * convention: a state built at smaller k than the merge side has
      * already discarded rows the larger k would keep, so up-merge is a
      * hard error rather than a silent truncation. */
    override def serialize(buffer: TopKBuffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(SketchState.HeaderBytes + 4 + 16 * buffer.n)
      SketchState.putHeader(bb, TopKAgg.stateVersion, buffer.k)
      bb.putInt(buffer.n)
      var i = 0
      while (i < buffer.n) { bb.putLong(buffer.ords(i)); bb.putLong(buffer.pays(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val (_, stateK) = SketchState.readHeader(bb, TopKAgg.stateVersion, "topk")
      require(stateK >= k,
        s"topk merge k=$k exceeds the serialized state's k=$stateK; " +
          "merge k must be <= the smallest builder k")
      val out = new TopKBuffer(k)
      val n = bb.getInt()
      var i = 0
      while (i < n) { out.insert(bb.getLong(), bb.getLong()); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Fixed-capacity heap over (ord, string payload) pairs — the
    * [[TopKBuffer]] kernel with a text payload (terms, ids, urls), same
    * (ord DESC, payload ASC) total order with payload ties compared as
    * binary UTF-8 (Spark's and DuckDB's default string ordering, so the
    * kept set stays oracle-replayable).
    *
    * DELIBERATE TWIN of [[TopKBuffer]]: the long-payload kernel stays on
    * primitive arrays (zero boxing on the hot path) and a shared
    * payload-ops abstraction would box every element, so the heap logic
    * is specialized twice. Any fix to insert/sift/sortedPairs or the
    * serialized k-header contract MUST be mirrored in both kernels — the
    * wire-format merge tests in TopKAggSpec cover each twin separately. */
  final class TopKStrBuffer(val k: Int) {
    val ords = new Array[Long](k)
    val pays = new Array[org.apache.spark.unsafe.types.UTF8String](k)
    var n = 0

    private def worse(ai: Long, ap: org.apache.spark.unsafe.types.UTF8String,
                      bi: Long, bp: org.apache.spark.unsafe.types.UTF8String): Boolean =
      ai < bi || (ai == bi && ap.compareTo(bp) > 0)

    private def swap(i: Int, j: Int): Unit = {
      val to = ords(i); ords(i) = ords(j); ords(j) = to
      val tp = pays(i); pays(i) = pays(j); pays(j) = tp
    }

    def insert(o: Long, p: org.apache.spark.unsafe.types.UTF8String): Unit = {
      if (n < k) {
        ords(n) = o; pays(n) = p
        var i = n
        n += 1
        while (i > 0 && worse(ords(i), pays(i), ords((i - 1) / 2), pays((i - 1) / 2))) {
          swap(i, (i - 1) / 2)
          i = (i - 1) / 2
        }
      } else if (worse(ords(0), pays(0), o, p)) {
        ords(0) = o; pays(0) = p
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = l + 1
          var w = i
          if (l < n && worse(ords(l), pays(l), ords(w), pays(w))) w = l
          if (r < n && worse(ords(r), pays(r), ords(w), pays(w))) w = r
          if (w == i) done = true
          else { swap(i, w); i = w }
        }
      }
    }

    def sortedPairs: Array[(Long, org.apache.spark.unsafe.types.UTF8String)] = {
      val out = Array.tabulate(n)(i => (ords(i), pays(i)))
      scala.util.Sorting.stableSort(out,
        (a: (Long, org.apache.spark.unsafe.types.UTF8String),
         b: (Long, org.apache.spark.unsafe.types.UTF8String)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
      out
    }
  }

  private val strElemType = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** `graft_topk_str(ord, payload, k)` — the [[TopKByAgg]] contract with a
    * string payload. */
  case class TopKStrByAgg(
      left: Expression,
      right: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrBuffer] with BinaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case _ if k <= 0 => TypeCheckResult.TypeCheckFailure(s"graft_topk_str k must be positive, got $k")
      case (LongType | IntegerType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str expects (integral ord, string payload), got (${l.catalogString}, ${r.catalogString})")
    }

    override def dataType: DataType = ArrayType(strElemType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_topk_str"

    override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

    override def update(buffer: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
      val o = left.eval(input)
      val p = right.eval(input)
      if (o != null && p != null)
        // clone: the UTF8String points into a row buffer the scan reuses
        buffer.insert(o.asInstanceOf[Number].longValue(),
          p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
      buffer
    }

    override def merge(buffer: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
      var i = 0
      while (i < other.n) { buffer.insert(other.ords(i), other.pays(i)); i += 1 }
      buffer
    }

    override def eval(buffer: TopKStrBuffer): Any =
      new GenericArrayData(buffer.sortedPairs.map { case (o, p) =>
        InternalRow(o, p): Any
      })

    override def serialize(buffer: TopKStrBuffer): Array[Byte] = {
      val payloadBytes = new Array[Array[Byte]](buffer.n)
      var total = SketchState.HeaderBytes + 4 + 12 * buffer.n
      var i = 0
      while (i < buffer.n) {
        payloadBytes(i) = buffer.pays(i).getBytes
        total += payloadBytes(i).length
        i += 1
      }
      val bb = java.nio.ByteBuffer.allocate(total)
      SketchState.putHeader(bb, TopKAgg.stateVersion, buffer.k)
      bb.putInt(buffer.n)
      i = 0
      while (i < buffer.n) {
        bb.putLong(buffer.ords(i))
        bb.putInt(payloadBytes(i).length)
        bb.put(payloadBytes(i))
        i += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val (_, stateK) = SketchState.readHeader(bb, TopKAgg.stateVersion, "topk_str")
      require(stateK >= k,
        s"topk_str merge k=$k exceeds the serialized state's k=$stateK; " +
          "merge k must be <= the smallest builder k")
      val out = new TopKStrBuffer(k)
      val n = bb.getInt()
      var i = 0
      while (i < n) {
        val o = bb.getLong()
        val len = bb.getInt()
        val pb = new Array[Byte](len)
        bb.get(pb)
        out.insert(o, org.apache.spark.unsafe.types.UTF8String.fromBytes(pb))
        i += 1
      }
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrByAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKStrByAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private val fnName = "graft_topk"
  private val strFnName = "graft_topk_str"

  private def kArg(exprs: Seq[Expression]): Int =
    exprs.lift(2).map { e =>
      require(e.foldable,
        "graft_topk's k must be a literal (it sizes the per-group heap at plan time)")
      e.eval() match {
        case n: Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"graft_topk's k must be an integer literal, got $other")
      }
    }.getOrElse(10)

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      fnName, exprs => TopKByAgg(exprs.head, exprs(1), kArg(exprs)), "scala_udf")
    reg.createOrReplaceTempFunction(
      strFnName, exprs => TopKStrByAgg(exprs.head, exprs(1), kArg(exprs)), "scala_udf")
  }

  /** Top-k (ord DESC, payload ASC) pairs per group, best-first. Call
    * [[register]] on the session first. */
  def topKBy(ord: Column, payload: Column, k: Int): Column =
    call_function(fnName, ord, payload, lit(k))

  /** [[topKBy]] with a string payload. Call [[register]] first. */
  def topKStrBy(ord: Column, payload: Column, k: Int): Column =
    call_function(strFnName, ord, payload, lit(k))
}
