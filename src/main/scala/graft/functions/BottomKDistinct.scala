package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The `k` lexicographically-smallest DISTINCT strings as one mergeable
  * aggregate — the KMV sketch construction ([[graft.operators.SetSketch]])
  * without a pre-aggregation `distinct()` pass: deduplication happens
  * inside the bounded buffer (an ordered set capped at `k`), so building
  * a sketch per group is ONE aggregation with map-side partials, and the
  * only exchange carries ≤ k-element buffers. This is what makes
  * `kmv_sketch` SQL-registrable in the `qs_sketch` mold.
  *
  * `mergeArrays = true` turns the same buffer into the sketch UNION
  * aggregate (`kmv_merge`): the input column is itself a sketch
  * (`array<string>`) and every element feeds the set — per-slice
  * sketches roll up to the corpus sketch without touching the corpus,
  * the incremental shape shared with `qs_merge`/`cm_merge`.
  *
  * Determinism: the buffer is a pure function of the input SET (order
  * and multiplicity never matter), and the result array is ascending —
  * identical to sorting the distinct values and taking the first k. */
case class BottomKDistinctAgg(
    child: Expression,
    k: Int,
    mergeArrays: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[UTF8String]] {

  require(k >= 1, s"bottom-k capacity must be >= 1, got $k")

  private implicit val ord: Ordering[UTF8String] =
    Ordering.fromLessThan((a, b) => a.compareTo(b) < 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (mergeArrays) child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_merge expects an array<string> sketch column, got $other")
    } else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a string key column, got $other")
    }

  override def createAggregationBuffer(): mutable.TreeSet[UTF8String] =
    mutable.TreeSet.empty

  // keeps |buf| <= k: below capacity everything distinct enters; at
  // capacity only a value smaller than the current k-th can displace it
  private def insert(buf: mutable.TreeSet[UTF8String], v: UTF8String): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (ord.lt(v, buf.last) && buf.add(v)) { buf.remove(buf.last); () }

  override def update(buf: mutable.TreeSet[UTF8String],
                      input: InternalRow): mutable.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeArrays) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          // eval may hand back views into a reused row buffer — copy
          if (!arr.isNullAt(i)) insert(buf, arr.getUTF8String(i).clone())
          i += 1
        }
      } else insert(buf, v.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(a: mutable.TreeSet[UTF8String],
                     b: mutable.TreeSet[UTF8String]): mutable.TreeSet[UTF8String] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[UTF8String]): Any =
    new GenericArrayData(buf.toArray[AnyRef].asInstanceOf[Array[Any]])

  override def serialize(buf: mutable.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val bytes = s.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len)
      in.readFully(sb)
      buf.add(UTF8String.fromBytes(sb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = if (mergeArrays) "kmv_merge" else "kmv_sketch"
}
