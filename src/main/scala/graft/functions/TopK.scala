package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a bounded-heap aggregate.
  *
  * Why a custom aggregate: the built-in formulations of "k best rows per
  * group" either window-sort (`row_number` over a partition shuffles and
  * sorts EVERY row of every group — a hot group's whole row set lands in one
  * sort) or `slice(sort_array(collect_list(...)))` (collects the entire
  * group into one aggregation buffer before truncating — unbounded memory).
  * This aggregate keeps O(k) state per group at every stage: each map task
  * maintains a k-bounded min-heap over its slice, partial heaps merge
  * pairwise on the reduce side, so the shuffle carries at most
  * `numPartitions · groups · k` rows of (ord, tie, payload) instead of the
  * data. That is the plan shape that survives a 100× skewed group.
  *
  * Semantics: keeps the k largest rows by `(ord DESC, tie ASC)` — the tie
  * column makes the result a deterministic total order (ord alone would be
  * engine-dependent under duplicates). Rows where ord or tie is null are
  * ignored (SQL aggregate convention). Output is
  * `array<struct<ord:double, tie:long, payload>>` sorted by the same order,
  * ready for `posexplode` (position + 1 == rank). For "k smallest", negate
  * ord at the call site.
  */
case class TopKRows(
    ord: Expression,
    tie: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Any)]] {

  require(k > 0, s"topK requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(ord, tie, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("tie", LongType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ord.dataType == DoubleType && tie.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topK expects (double, long, any), got (${ord.dataType}, ${tie.dataType}, ...)")

  /** Min-heap: head is the WORST kept row (smallest ord, then largest tie),
    * so a full heap evicts in O(log k) when a better row arrives. */
  private def heapOrdering: Ordering[(Double, Long, Any)] =
    Ordering.by[(Double, Long, Any), (Double, Long)](t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Any)] =
    mutable.PriorityQueue.empty(heapOrdering)

  /** true iff (o1, t1) ranks strictly better than (o2, t2). */
  private def better(o1: Double, t1: Long, o2: Double, t2: Long): Boolean =
    o1 > o2 || (o1 == o2 && t1 < t2)

  private def offer(buf: mutable.PriorityQueue[(Double, Long, Any)],
                    o: Double, t: Long, p: Any): Unit = {
    if (buf.size < k) buf.enqueue((o, t, p))
    else {
      val worst = buf.head
      if (better(o, t, worst._1, worst._2)) { buf.dequeue(); buf.enqueue((o, t, p)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long, Any)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, Any)] = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o != null && t != null) {
      // payload values may be views into a reused row buffer — copy before keeping
      offer(buf, o.asInstanceOf[Double], t.asInstanceOf[Long],
        InternalRow.copyValue(payload.eval(input)))
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long, Any)],
                     b: mutable.PriorityQueue[(Double, Long, Any)]): mutable.PriorityQueue[(Double, Long, Any)] = {
    b.foreach { case (o, t, p) => offer(a, o, t, p) }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Any)]): Any = {
    val sorted = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map { case (o, t, p) =>
      InternalRow(o, t, p)
    }.asInstanceOf[Array[Any]])
  }

  /** One UnsafeRow per entry, length-prefixed — the payload serializes
    * through the same binary row format the shuffle itself uses. */
  private lazy val entryProjection: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, LongType, payload.dataType))

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, t, p) =>
      val row = entryProjection.apply(InternalRow(o, t, p))
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Any)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(3)
      row.pointTo(rowBytes, len)
      buf.enqueue((row.getDouble(0), row.getLong(1),
        InternalRow.copyValue(row.get(2, payload.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), tie = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "top_k_rows"
}

object TopK {
  /** `array<struct<ord, tie, payload>>` of the k largest rows per group by
    * `(ord DESC, tie ASC)`; O(k) aggregation state, map-side partials. */
  def topK(k: Int, ord: Column, tie: Column, payload: Column): Column =
    GraftColumnBridge.column(TopKRows(
      GraftColumnBridge.expression(ord.cast("double")),
      GraftColumnBridge.expression(tie.cast("long")),
      GraftColumnBridge.expression(payload), k).toAggregateExpression())
}
