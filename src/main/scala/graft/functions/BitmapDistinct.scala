package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** EXACT distinct counting over non-negative integral key columns (full
  * long range) via a Roaring-style compressed bitmap (Chambi et al., "Better bitmap
  * performance with Roaring bitmaps", 2016) — array containers below 4096
  * values per 64K-key block, dense 8 KiB bitmap containers above.
  *
  * Why next to `count(DISTINCT …)`: Spark plans a query with TWO OR MORE
  * exact distincts as an Expand — every input row is replicated once per
  * distinct aggregate before the shuffle (q03's 3× row multiplication, its
  * whole bench cost). This aggregate keeps exactness in ONE pass: the
  * shuffle carries merged bitmaps (mergeable, order/layout-independent —
  * the ExactAgg doctrine applied to distinct counts), not replicated rows.
  * At 1e9 distinct keys a group's bitmap costs ~128 MiB worst-case but
  * compresses with key clustering; the sketch twins (HLL/KMV) remain the
  * choice when approximate is acceptable.
  */
object BitmapDistinct {

  private val ArrayContainerMax = 4096

  /** One 64K-key block: sorted array of low-16 bits, or a dense bitmap. */
  private[functions] final class Container {
    var arr: Array[Char] = new Array[Char](8) // sorted uniques, Char = u16
    var n: Int = 0
    var words: Array[Long] = null             // non-null once dense
    var card: Int = 0

    def dense: Boolean = words != null

    def add(low: Int): Unit =
      if (dense) {
        val w = low >>> 6
        val bit = 1L << (low & 63)
        if ((words(w) & bit) == 0L) { words(w) |= bit; card += 1 }
      } else {
        val pos = java.util.Arrays.binarySearch(arr, 0, n, low.toChar)
        if (pos < 0) {
          if (n == ArrayContainerMax) { toDense(); add(low) }
          else {
            if (n == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
            val ins = -pos - 1
            System.arraycopy(arr, ins, arr, ins + 1, n - ins)
            arr(ins) = low.toChar
            n += 1
          }
        }
      }

    private def toDense(): Unit = {
      words = new Array[Long](1024)
      var i = 0
      while (i < n) { val v = arr(i); words(v >>> 6) |= 1L << (v & 63); i += 1 }
      card = n
      arr = null; n = 0
    }

    def cardinality: Int = if (dense) card else n

    def mergeFrom(other: Container): Unit =
      if (other.dense) {
        if (!dense) toDense()
        var w = 0
        while (w < 1024) { words(w) |= other.words(w); w += 1 }
        card = 0
        w = 0
        while (w < 1024) { card += java.lang.Long.bitCount(words(w)); w += 1 }
      } else {
        var i = 0
        while (i < other.n) { add(other.arr(i)); i += 1 }
      }
  }

  /** Aggregate buffer: high-48-bits → container, so the full non-negative
    * long key space is supported (TPC-H orderkeys pass 2^31 well before
    * 100 TB; a 2^31 cap would fail exactly at the scale this aggregate is
    * for). */
  final class BitmapBuffer {
    private[functions] val containers =
      new java.util.TreeMap[java.lang.Long, Container]()

    def add(v: Long): Unit = {
      require(v >= 0, s"bitmap_distinct requires non-negative keys: got $v")
      val high = v >>> 16
      var c = containers.get(high)
      if (c == null) { c = new Container; containers.put(high, c) }
      c.add((v & 0xffff).toInt)
    }

    def mergeFrom(other: BitmapBuffer): Unit =
      other.containers.forEach { (high, oc) =>
        val c = containers.get(high)
        if (c == null) containers.put(high, oc) // buffers are single-owner
        else c.mergeFrom(oc)
      }

    def cardinality: Long = {
      var total = 0L
      containers.forEach((_, c) => total += c.cardinality)
      total
    }
  }

  case class BitmapDistinctAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_distinct expects an integral key column, got ${other.catalogString}")
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bitmap_distinct"

    override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer

    override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
      buffer.mergeFrom(other)
      buffer
    }

    override def eval(buffer: BitmapBuffer): Any = buffer.cardinality

    override def serialize(buffer: BitmapBuffer): Array[Byte] =
      serializeBuffer(buffer)

    override def deserialize(bytes: Array[Byte]): BitmapBuffer =
      deserializeBuffer(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Like [[BitmapDistinctAgg]] but evals to the SERIALIZED bitmap (binary)
    * instead of its cardinality — the Druid/ClickHouse `groupBitmapState`
    * half of the state/merge pattern. A downstream layer can re-aggregate
    * the states with [[BitmapMergeCountAgg]] (unions are associative and
    * commutative), so exact distinct counts compose across time windows or
    * rollup levels WITHOUT re-touching the fact table. */
  case class BitmapStateAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_state expects an integral key column, got ${other.catalogString}")
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bitmap_state"

    override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer

    override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
      val v = child.eval(input)
      if (v != null) buffer.add(v.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
      buffer.mergeFrom(other)
      buffer
    }

    override def eval(buffer: BitmapBuffer): Any = serializeBuffer(buffer)

    override def serialize(buffer: BitmapBuffer): Array[Byte] =
      serializeBuffer(buffer)
    override def deserialize(bytes: Array[Byte]): BitmapBuffer =
      deserializeBuffer(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): BitmapStateAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BitmapStateAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** The merge half: unions serialized bitmap states (from
    * [[BitmapStateAgg]]) and evals to the exact distinct count. */
  case class BitmapMergeCountAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BitmapBuffer] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_merge_count expects a binary bitmap-state column, got ${other.catalogString}")
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bitmap_merge_count"

    override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer

    override def update(buffer: BitmapBuffer, input: InternalRow): BitmapBuffer = {
      val v = child.eval(input)
      // deserializeBuffer allocates fresh containers, so single-owner
      // mergeFrom (which adopts the other side's containers) is safe here
      if (v != null) buffer.mergeFrom(deserializeBuffer(v.asInstanceOf[Array[Byte]]))
      buffer
    }

    override def merge(buffer: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
      buffer.mergeFrom(other)
      buffer
    }

    override def eval(buffer: BitmapBuffer): Any = buffer.cardinality

    override def serialize(buffer: BitmapBuffer): Array[Byte] =
      serializeBuffer(buffer)
    override def deserialize(bytes: Array[Byte]): BitmapBuffer =
      deserializeBuffer(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeCountAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeCountAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private[functions] def serializeBuffer(buffer: BitmapBuffer): Array[Byte] = {
    var size = 4
    buffer.containers.forEach { (_, c) =>
      size += 8 + 1 + (if (c.dense) 8192 else 4 + 2 * c.n)
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buffer.containers.size)
    buffer.containers.forEach { (high, c) =>
      bb.putLong(high)
      if (c.dense) {
        bb.put(1.toByte)
        var w = 0
        while (w < 1024) { bb.putLong(c.words(w)); w += 1 }
      } else {
        bb.put(0.toByte).putInt(c.n)
        var i = 0
        while (i < c.n) { bb.putChar(c.arr(i)); i += 1 }
      }
    }
    bb.array()
  }

  private[functions] def deserializeBuffer(bytes: Array[Byte]): BitmapBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new BitmapBuffer
    val nContainers = bb.getInt()
    var k = 0
    while (k < nContainers) {
      val high = bb.getLong()
      val c = new Container
      if (bb.get() == 1.toByte) {
        c.words = new Array[Long](1024)
        c.arr = null
        var w = 0; var card = 0
        while (w < 1024) {
          c.words(w) = bb.getLong(); card += java.lang.Long.bitCount(c.words(w)); w += 1
        }
        c.card = card
      } else {
        val n = bb.getInt()
        c.arr = new Array[Char](math.max(8, n))
        var i = 0
        while (i < n) { c.arr(i) = bb.getChar(); i += 1 }
        c.n = n
      }
      out.containers.put(high, c)
      k += 1
    }
    out
  }

  private val fnName = "graft_bitmap_distinct"
  private val stateFnName = "graft_bitmap_state"
  private val mergeFnName = "graft_bitmap_merge_count"

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      fnName, exprs => BitmapDistinctAgg(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      stateFnName, exprs => BitmapStateAgg(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      mergeFnName, exprs => BitmapMergeCountAgg(exprs.head), "scala_udf")
  }

  /** Exact distinct count of a non-negative integral column; one pass, no
    * Expand, mergeable across partials. Call [[register]] first. */
  def bitmapDistinct(key: Column): Column = call_function(fnName, key)

  /** Serialized bitmap state of a non-negative integral column — re-
    * aggregate with [[bitmapMergeCount]]. Call [[register]] first. */
  def bitmapState(key: Column): Column = call_function(stateFnName, key)

  /** Exact distinct count from merged [[bitmapState]] states. Call
    * [[register]] first. */
  def bitmapMergeCount(state: Column): Column = call_function(mergeFnName, state)
}
