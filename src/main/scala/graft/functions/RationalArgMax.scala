package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact argmax by a RATIONAL score `num / den` — the aggregate behind the
  * WordPiece trainer's merge-pair selection (score = pair count divided by
  * the product of the two symbol counts).
  *
  * Why a custom aggregate: a rational has no fixed-width sort key, so
  * `max(struct(...))` / `ORDER BY` cannot rank it exactly — casting the
  * quotient to double collapses scores that differ beyond 53 bits of
  * mantissa (two pairs with counts near 2^53 compare EQUAL in double and
  * the argmax silently falls to the tie order), and any scaled-integer key
  * `floor(num·S/den)` needs S ≥ max(den)² to be collision-free, which
  * overflows every fixed decimal at corpus scale. This aggregate compares
  * candidates by BigInteger cross-multiplication (`n₁·d₂ vs n₂·d₁`) —
  * exact at ANY corpus size, O(1) state per group, map-side combinable
  * (argmax is associative+commutative), so the shuffle carries one
  * candidate per partition instead of the pair table.
  *
  * Semantics: keeps the row maximizing `num/den`; exact-score ties break
  * to the SMALLEST `(tie_a, tie_b)` (binary string order — identical in
  * Spark and DuckDB's default collation, making oracle replays exact).
  * Null inputs are ignored (SQL aggregate convention); a non-positive
  * denominator is a data error and fails loudly. Empty input → null.
  * Output: `struct<num:bigint, den:decimal(38,0), tie_a, tie_b>`.
  */
case class RationalArgMaxAgg(
    num: Expression,
    den: Expression,
    tieA: Expression,
    tieB: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RationalArgMaxAgg.Best] {

  override def children: Seq[Expression] = Seq(num, den, tieA, tieB)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("num", LongType, nullable = false),
    StructField("den", DecimalType(38, 0), nullable = false),
    StructField("tie_a", StringType, nullable = false),
    StructField("tie_b", StringType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val denOk = den.dataType match {
      case d: DecimalType => d.scale == 0
      case _ => false
    }
    if (num.dataType == LongType && denOk &&
        tieA.dataType == StringType && tieB.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rational_argmax expects (long, decimal(_,0), string, string), got " +
          s"(${num.dataType}, ${den.dataType}, ${tieA.dataType}, ${tieB.dataType})")
  }

  override def createAggregationBuffer(): RationalArgMaxAgg.Best =
    new RationalArgMaxAgg.Best

  /** true iff candidate 1 ranks strictly better: larger n/d, ties to the
    * smallest (a, b). Cross-multiplication keeps it exact at any width. */
  private def better(n1: Long, d1: BigInteger, a1: UTF8String, b1: UTF8String,
                     n2: Long, d2: BigInteger, a2: UTF8String, b2: UTF8String): Boolean = {
    val cmp = BigInteger.valueOf(n1).multiply(d2)
      .compareTo(BigInteger.valueOf(n2).multiply(d1))
    if (cmp != 0) cmp > 0
    else {
      val ca = a1.compareTo(a2)
      if (ca != 0) ca < 0 else b1.compareTo(b2) < 0
    }
  }

  private def offer(buf: RationalArgMaxAgg.Best, n: Long, d: BigInteger,
                    a: UTF8String, b: UTF8String): Unit = {
    if (!buf.set || better(n, d, a, b, buf.num, buf.den, buf.a, buf.b)) {
      buf.set = true; buf.num = n; buf.den = d; buf.a = a; buf.b = b
    }
  }

  override def update(buf: RationalArgMaxAgg.Best, input: InternalRow): RationalArgMaxAgg.Best = {
    val n = num.eval(input)
    val d = den.eval(input)
    val a = tieA.eval(input)
    val b = tieB.eval(input)
    if (n != null && d != null && a != null && b != null) {
      val dd = d.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toBigIntegerExact
      if (dd.signum <= 0)
        throw new IllegalArgumentException(
          s"rational_argmax: denominator must be positive, got $dd")
      // tie strings may be views into a reused row buffer — copy to keep
      offer(buf, n.asInstanceOf[Long], dd,
        InternalRow.copyValue(a).asInstanceOf[UTF8String],
        InternalRow.copyValue(b).asInstanceOf[UTF8String])
    }
    buf
  }

  override def merge(a: RationalArgMaxAgg.Best, b: RationalArgMaxAgg.Best): RationalArgMaxAgg.Best = {
    if (b.set) offer(a, b.num, b.den, b.a, b.b)
    a
  }

  override def eval(buf: RationalArgMaxAgg.Best): Any =
    if (!buf.set) null
    else InternalRow(buf.num,
      org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(buf.den), 38, 0),
      buf.a, buf.b)

  override def serialize(buf: RationalArgMaxAgg.Best): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.set)
    if (buf.set) {
      out.writeLong(buf.num)
      val db = buf.den.toByteArray
      out.writeInt(db.length); out.write(db)
      val ab = buf.a.getBytes
      out.writeInt(ab.length); out.write(ab)
      val bb = buf.b.getBytes
      out.writeInt(bb.length); out.write(bb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RationalArgMaxAgg.Best = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    if (in.readBoolean()) {
      buf.set = true
      buf.num = in.readLong()
      val db = new Array[Byte](in.readInt()); in.readFully(db)
      buf.den = new BigInteger(db)
      val ab = new Array[Byte](in.readInt()); in.readFully(ab)
      buf.a = UTF8String.fromBytes(ab)
      val bb = new Array[Byte](in.readInt()); in.readFully(bb)
      buf.b = UTF8String.fromBytes(bb)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): RationalArgMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RationalArgMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(num = newChildren(0), den = newChildren(1),
      tieA = newChildren(2), tieB = newChildren(3))
  override def prettyName: String = "rational_argmax"
}

object RationalArgMaxAgg {
  /** Mutable single-candidate buffer: the best (num/den, tie) seen. */
  final class Best {
    var set: Boolean = false
    var num: Long = 0L
    var den: BigInteger = BigInteger.ONE
    var a: UTF8String = _
    var b: UTF8String = _
  }
}

object RationalArgMax {
  /** `struct<num, den, tie_a, tie_b>` of the row maximizing the EXACT
    * rational `num / den` (BigInteger cross-multiplication — no double
    * rounding, no scaled-key overflow); score ties break to the smallest
    * `(tieA, tieB)` in binary string order. Null on empty input. */
  def rationalArgMax(num: Column, den: Column, tieA: Column, tieB: Column): Column =
    GraftColumnBridge.column(RationalArgMaxAgg(
      GraftColumnBridge.expression(num.cast("long")),
      GraftColumnBridge.expression(den.cast(DecimalType(38, 0))),
      GraftColumnBridge.expression(tieA),
      GraftColumnBridge.expression(tieB)).toAggregateExpression())
}
