package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bloom-filter runtime join filter — the semi-join reduction that matters
  * at 100 TB: build a compact membership filter over the small (dim) side's
  * join keys, broadcast it, and drop non-matching fact rows AT THE SCAN,
  * before they pay the shuffle. The subsequent exact join removes the false
  * positives, so query results are independent of filter sizing — the
  * filter only moves work earlier (Bloom 1970; the "runtime filter" /
  * sideways-information-passing pattern every warehouse engine ships).
  *
  * Mechanics:
  *  - [[BloomAgg]] is a TypedImperativeAggregate whose buffer is the bit
  *    array itself. Partials OR together — order/layout-independent, so the
  *    built filter is byte-identical under any partitioning (the ExactAgg
  *    doctrine applied to a sketch), and partial aggregation means the
  *    shuffle carries one filter per map task, never the keys.
  *  - [[BloomMightContain]] is a codegen'd scalar probe — the fact-side hot
  *    path stays inside whole-stage codegen (a HOF or UDF here would drop
  *    the entire scan out of codegen).
  *  - k probe positions derive from one 64-bit hash via the
  *    Kirsch–Mitzenmacher double-hashing construction `h1 + i·h2`, so a
  *    probe costs one hash, not k.
  *
  * Sizing: `numBits ≈ -n·ln(p)/ln(2)²` for target false-positive rate p;
  * the 2^17-bit default holds n=10^4 keys at p≈0.5% and costs 16 KiB to
  * broadcast. Serialized layout: `[int32 numHashes][int64 words...]`.
  */
object BloomFilterSketch {

  /** SplitMix64 finalizer — the statistical-quality 64-bit mixer (Steele et
    * al. 2014); also what java.util.SplittableRandom ships. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def numWords(numBits: Int): Int = (numBits + 63) >>> 6

  /** Set the k probe bits for `key` in `words` (bit space = 64·words.length). */
  def put(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val bits = words.length.toLong * 64
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L // odd, so probes cycle the whole bit space
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      words((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Probe a serialized filter (static: called from generated code). */
  def mightContain(filter: Array[Byte], key: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(filter)
    val numHashes = bb.getInt()
    val nWords = (filter.length - 4) >>> 3
    val bits = nWords.toLong * 64
    val h1 = mix64(key)
    val h2 = mix64(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % bits
      if ((bb.getLong(4 + ((pos >>> 6).toInt << 3)) & (1L << (pos & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Aggregate: build the filter over a key column. Buffer = the word
    * array; eval emits `[int32 numHashes][words]` bytes. */
  case class BloomAgg(
      child: Expression,
      numBits: Int,
      numHashes: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_agg expects an integral key column, got ${other.catalogString}")
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_bloom_agg"

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords(numBits))

    override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) put(buffer, numHashes, v.asInstanceOf[Number].longValue())
      buffer
    }

    override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
      buffer
    }

    override def eval(buffer: Array[Long]): Any = serialize(buffer)

    override def serialize(buffer: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
      bb.putInt(numHashes)
      var i = 0
      while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.getInt() // numHashes rides on the expression, not the buffer
      val out = new Array[Long]((bytes.length - 4) >>> 3)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Scalar probe: `might_contain(filter, key)`. False negatives are
    * impossible; false positives are the documented contract (callers keep
    * an exact join behind the filter). */
  case class BloomMightContain(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (binary, integral), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

    override def dataType: DataType = BooleanType

    override def nullSafeEval(filter: Any, key: Any): Any =
      mightContain(filter.asInstanceOf[Array[Byte]], key.asInstanceOf[Number].longValue())

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (f, k) =>
        s"${ev.value} = graft.functions.BloomFilterSketch.mightContain($f, (long) $k);")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  private val aggName = "graft_bloom_agg"
  private val probeName = "graft_bloom_contains"

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      aggName,
      exprs => BloomAgg(exprs(0), intLit(exprs(1), "numBits"), intLit(exprs(2), "numHashes")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      probeName, exprs => BloomMightContain(exprs(0), exprs(1)), "scala_udf")
  }

  /** Build a filter over an integral key column. Call [[register]] first. */
  def bloomAgg(key: Column, numBits: Int = 1 << 17, numHashes: Int = 5): Column =
    call_function(aggName, key, lit(numBits), lit(numHashes))

  /** Probe a built filter. */
  def bloomContains(filter: Column, key: Column): Column =
    call_function(probeName, filter, key)
}
