package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** One-pass Gram / covariance matrix over embedding vectors — the
  * PCA-and-whitening preparation step of an embedding curation pipeline
  * (mean-center, decorrelate, project before clustering or SemDeDup).
  *
  * Scale shape: the naive formulation explodes every vector into d
  * (position, value) rows and self-joins on the vector id — d²/2 rows per
  * vector through a shuffle (for d = 1024 that is half a million rows per
  * input row; at 100 TB the shuffle dwarfs the data). This aggregate keeps
  * the entire d×d upper triangle as ONE fixed-size buffer per partition —
  * update is d²/2 long multiply-adds done in-place, merge is elementwise
  * addition, and the only thing that ever crosses the wire is the buffer
  * itself (d(d+1)/2 + d longs ≈ 16 KB at d = 64). No explode, no join, no
  * per-pair shuffle rows: the same partial-aggregate pattern Spark uses for
  * sum(), applied to a matrix-valued moment.
  *
  * Exactness contract (the ExactAgg discipline applied to a matrix): the
  * CALLER scales each element to micro-unit longs with Spark's own
  * codegen'd `round(x * 1e6).cast(long)` (identical rounding to
  * [[ExactAgg.dsum]], replayed verbatim by the DuckDB oracle), so the
  * aggregate itself is pure integer arithmetic: element products are exact
  * longs, accumulated hi/lo-split (arithmetic `>> 26` + two's-complement
  * `& (2^26-1)`, the negative-safe split [[ExactAgg.dsum]] uses) so both
  * partial sums stay exact and merge-order-independent. Eval recombines
  * each cell as `hi·2^26 + lo` in double — deterministic from exact long
  * inputs, the same op chain the oracle SQL runs. |element| must stay
  * below ~9e5 micro-units (|x| < 0.9e6 after scaling ⇒ raw |x| ≲ 0.9),
  * comfortably above unit-normalized embedding magnitudes.
  *
  * Eval layout (array<double>, length 1 + d + d(d+1)/2):
  * `[0]` row count n; `[1..d]` per-dimension scaled sums (exact longs as
  * doubles); `[1+d ..]` upper-triangle scaled product sums in row-major
  * pair order, pair (i, j), i ≤ j, at index i·d − i(i−1)/2 + (j−i).
  */
object GramMatrix {

  /** Number of upper-triangle pairs for dimension d. */
  def nPairs(d: Int): Int = d * (d + 1) / 2

  /** Flat index of pair (i, j), 0-based, i <= j. */
  def pairIndex(d: Int, i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  private val Mask = 67108863L // 2^26 - 1
  private val Hi = 67108864.0 // 2^26

  /** buffer layout: [0] = n; [1 .. d] = elementwise long sums;
    * [1+d .. 1+d+P) = product hi sums; [1+d+P ..) = product lo sums. */
  case class GramAgg(
      child: Expression,
      dim: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) if dim > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_gram_matrix dimension must be positive, got $dim")
      case other => TypeCheckResult.TypeCheckFailure(
        "graft_gram_matrix expects array<bigint> (pre-scaled micro-units), got " +
          other.catalogString)
    }

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_gram_matrix"

    private val P = nPairs(dim)

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](1 + dim + 2 * P)

    override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        require(arr.numElements() == dim,
          s"graft_gram_matrix: vector of length ${arr.numElements()}, expected $dim")
        buffer(0) += 1L
        val li = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          li(i) = arr.getLong(i)
          buffer(1 + i) += li(i)
          i += 1
        }
        var idx = 0
        i = 0
        while (i < dim) {
          val a = li(i)
          var j = i
          while (j < dim) {
            val p = a * li(j)
            buffer(1 + dim + idx) += p >> 26
            buffer(1 + dim + P + idx) += p & Mask
            idx += 1
            j += 1
          }
          i += 1
        }
      }
      buffer
    }

    override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

    override def eval(buffer: Array[Long]): Any = {
      val out = new Array[Double](1 + dim + P)
      out(0) = buffer(0).toDouble
      var i = 0
      while (i < dim) { out(1 + i) = buffer(1 + i).toDouble; i += 1 }
      i = 0
      while (i < P) {
        out(1 + dim + i) =
          buffer(1 + dim + i).toDouble * Hi + buffer(1 + dim + P + i).toDouble
        i += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(buffer: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
      var i = 0
      while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private val fnName = "graft_gram_matrix"

  private def intArg(exprs: Seq[Expression], pos: Int): Int =
    exprs(pos).eval().asInstanceOf[Number].intValue()

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, exprs => GramAgg(exprs.head, intArg(exprs, 1)), "scala_udf")

  /** The moment-matrix aggregate over a PRE-SCALED `array<bigint>` column
    * (micro-unit longs — see class doc). Call [[register]] first. */
  def gramState(scaled: Column, dim: Int): Column =
    call_function(fnName, scaled, lit(dim))
}
