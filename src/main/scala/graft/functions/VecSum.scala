package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Elementwise vector-sum aggregate: `vec_sum(array<double>) →
  * array<double>` with Σ per dimension.
  *
  * Why a custom aggregate: Spark has no elementwise array-sum, so the
  * k-means/IVF centroid update otherwise routes through
  * `posexplode → groupBy(key, pos) → avg → sort_array(collect_list) → rebuild`
  * — two shuffles carrying rows×dims exploded rows, and (measured on the
  * q71 battery query) the explode multiplies the UPSTREAM projection: the
  * argmin cell assignment is a higher-order-function expression
  * (`transform`/`array_min` are CodegenFallback), Catalyst collapses it
  * into the post-explode projection, and the interpreted 16-centroid
  * distance scan re-runs once per exploded DIMENSION instead of once per
  * row — 64× redundant work that dominated the index build (~2 s of
  * q71's 7 s per Lloyd pass). This aggregate consumes the row's vector
  * once, keeps one `Array[Double]` of state per group, and is mergeable —
  * map-side partial sums, k×dims total state, no explode anywhere.
  *
  * Determinism: double addition order follows partial-aggregation order,
  * exactly like the `avg` it replaces — callers needing bit-exact
  * layout-independent sums quantize to integers first (see
  * [[graft.operators.KMeans]]).
  *
  * Null contract: null vectors are skipped (SQL aggregate convention);
  * null ELEMENTS are rejected with an error — silently treating a null
  * dimension as 0 would skew the centroid with no signal anywhere.
  * Mismatched lengths within a group are rejected for the same reason.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<float|double>, got $other")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // empty buffer = "no rows seen yet": dims are unknown until the first
  // vector arrives, and a zero-length vector input is also representable
  // (then the sum IS the empty array — eval distinguishes via a seen flag
  // packed as a 1-element prefix in serialize; in-memory we use null).
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf == null) new Array[Double](n) else buf
    if (acc.length != n)
      throw new IllegalArgumentException(
        s"vec_sum: vector length $n differs from group's ${acc.length}")
    val isF = elemIsFloat
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"vec_sum: null element at index $i")
      acc(i) += (if (isF) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b == null) return a
    if (a == null) return b
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"vec_sum: merging vectors of length ${a.length} and ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  // layout: [int32 n][n × float64]; n = -1 encodes the no-rows-yet null
  // buffer so a spilled/exchanged partial stays distinguishable from a
  // zero-length vector sum
  override def serialize(buf: Array[Double]): Array[Byte] = {
    if (buf == null) return ByteBuffer.allocate(4).putInt(-1).array()
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n < 0) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "vec_sum"
}

object VecSum {
  /** Aggregate Column: elementwise Σ of an array<float|double> column. */
  def vecSum(v: Column): Column =
    GraftColumnBridge.column(VecSumAgg(
      GraftColumnBridge.expression(v)).toAggregateExpression())
}
