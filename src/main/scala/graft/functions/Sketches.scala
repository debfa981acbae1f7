package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketches — the 100 TB way to keep corpus statistics.
  *
  * The point of a sketch over the exact aggregate is not the single query
  * (Spark's `count_distinct` works); it's INCREMENTALITY: a fixed-size
  * binary summary per partition/day/source can be materialized once,
  * merged later in any grouping, and never requires rescanning the data
  * it summarizes. At 100 TB, "distinct documents last quarter" becomes a
  * merge of 90 daily 8 KB sketches instead of a 25 TB scan.
  *
  *  - [[Sketches.hllSketch]]: HyperLogLog distinct-count registers
  *    (Flajolet et al. 2007) as a `binary` column — `max` per register is
  *    associative/commutative/idempotent, so merge order never matters and
  *    re-merging the same sketch is harmless.
  *  - [[Sketches.hllMerge]]: aggregate union of sketch columns.
  *  - [[Sketches.hllEstimate]]: scalar register→count estimator.
  *  - [[Sketches.freqItems]]: Misra–Gries frequent items with the
  *    Agarwal et al. 2012 mergeable-summaries merge — O(capacity) state at
  *    every stage, vs a vocabulary-sized `groupBy(item)` shuffle.
  *  - [[Sketches.quantileSketch]] / [[Sketches.quantileSketchMerge]] /
  *    [[Sketches.quantileSketchQuery]]: MRL/KLL-style mergeable quantile
  *    summary — the one-pass, few-KB alternative to
  *    [[graft.operators.Quantiles]]' exact distributed range sort.
  *
  * Distinct (HLL), frequency (count-min), heavy hitters (Misra–Gries),
  * quantiles (MRL) — the four corpus statistics a 100 TB pipeline keeps
  * incrementally.
  */
object Sketches {

  /** HLL sketch aggregate over PRE-HASHED 64-bit values: `binary(2^p)`
    * registers. Callers use [[hllSketch]], which hashes with Spark's
    * codegen'd `xxhash64` so this aggregate's hot loop is just an index
    * and a compare. Null hashes are ignored (SQL convention). */
  case class HllSketchAgg(
      child: Expression,
      p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    require(p >= 4 && p <= 16, s"hllSketch precision p must be in [4, 16], got $p")
    private val m = 1 << p

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hllSketch expects a pre-hashed bigint (use Sketches.hllSketch), got ${child.dataType}")

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        val idx = (h >>> (64 - p)).toInt
        val w = h << p
        // rank of the first 1-bit in the suffix; suffix all-zero counts as
        // if a 1 sat just past it (max rank 64 - p + 1 <= 61, fits a byte)
        val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
        if (rho > buf(idx)) buf(idx) = rho.toByte
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "hll_sketch"
  }

  /** Union of HLL sketches (per-register max). All inputs must share one
    * precision (= length); nulls are ignored; an all-null group yields an
    * empty (all-zero) sketch of the declared precision. */
  case class HllMergeAgg(
      child: Expression,
      p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    require(p >= 4 && p <= 16, s"hllMerge precision p must be in [4, 16], got $p")
    private val m = 1 << p

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hllMerge expects a binary sketch column, got ${child.dataType}")

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val sk = v.asInstanceOf[Array[Byte]]
        require(sk.length == m,
          s"hllMerge(p=$p) expects ${m}-byte sketches, got ${sk.length} bytes")
        var i = 0
        while (i < m) { if (sk(i) > buf(i)) buf(i) = sk(i); i += 1 }
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = buf.clone()
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "hll_merge"
  }

  /** Register→estimate: the standard HLL estimator with the small-range
    * linear-counting correction (no large-range correction — 64-bit hashes
    * make collisions in the hash space irrelevant). CodegenFallback is
    * fine here: this runs on AGGREGATED rows (one per group), never the
    * data stream. Precision is recovered from the sketch length. */
  case class HllEstimateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hllEstimate expects a binary sketch, got ${child.dataType}")

    override protected def nullSafeEval(input: Any): Any = {
      val regs = input.asInstanceOf[Array[Byte]]
      val m = regs.length
      require(m >= 16 && (m & (m - 1)) == 0, s"not an HLL sketch: length $m")
      val alpha = m match {
        case 16 => 0.673
        case 32 => 0.697
        case 64 => 0.709
        case _  => 0.7213 / (1.0 + 1.079 / m)
      }
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = alpha * m * m / sum
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      math.rint(est).toLong
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "hll_estimate"
  }

  /** HLL distinct sketch of `c` at precision `p` (2^p one-byte registers;
    * standard error ≈ 1.04/sqrt(2^p) — p=12 → 4 KB and ~1.6%). Hashing is
    * Spark's codegen'd `xxhash64` over the raw column value; the null
    * guard matters because `xxhash64(null)` returns the SEED, which would
    * silently count null as one more distinct value. */
  def hllSketch(c: Column, p: Int = 12): Column =
    GraftColumnBridge.column(HllSketchAgg(
      GraftColumnBridge.expression(when(c.isNotNull, xxhash64(c))), p).toAggregateExpression())

  /** Aggregate union of already-built sketches (all at precision `p`). */
  def hllMerge(sketch: Column, p: Int = 12): Column =
    GraftColumnBridge.column(HllMergeAgg(
      GraftColumnBridge.expression(sketch), p).toAggregateExpression())

  /** Scalar distinct-count estimate from a sketch column. */
  def hllEstimate(sketch: Column): Column =
    GraftColumnBridge.column(HllEstimateExpr(GraftColumnBridge.expression(sketch)))

  // ------------------------------------------------------------------
  // Misra–Gries frequent items
  // ------------------------------------------------------------------

  /** Misra–Gries heavy-hitters summary over string items with `capacity`
    * counters. Guarantee: every item with true count > N/(capacity+1) is
    * retained, and each retained count undershoots its true count by at
    * most N/(capacity+1) (N = stream length). Partial summaries merge with
    * the Agarwal et al. 2012 rule — add counts, then subtract the
    * (capacity+1)-th largest and drop non-positives — which preserves the
    * same error bound, so map-side partials ship `capacity` entries per
    * task instead of a vocabulary-sized shuffle.
    *
    * The decrement-all step is O(live counters) but amortized O(1) per
    * stream element (every decrement cancels an earlier increment).
    * Output: `array<struct<item:string, cnt:bigint>>`, count-descending
    * (item ascending on ties). Null items are ignored. */
  case class FreqItemsAgg(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

    require(capacity >= 1, s"freqItems capacity must be >= 1, got $capacity")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"freqItems expects a string item column, got ${child.dataType}")

    override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
      mutable.HashMap.empty

    override def update(buf: mutable.HashMap[UTF8String, Long],
                        input: InternalRow): mutable.HashMap[UTF8String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        // eval may return a view into a reused buffer — copy before keying
        val item = v.asInstanceOf[UTF8String].clone()
        buf.get(item) match {
          case Some(n) => buf.update(item, n + 1)
          case None if buf.size < capacity => buf.update(item, 1L)
          case None => // full and absent: decrement every counter by 1
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            buf.foreach { case (k, n) =>
              if (n == 1L) dead += k else buf.update(k, n - 1)
            }
            dead.foreach(buf.remove)
        }
      }
      buf
    }

    override def merge(a: mutable.HashMap[UTF8String, Long],
                       b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
      b.foreach { case (k, n) => a.update(k, a.getOrElse(k, 0L) + n) }
      if (a.size > capacity) {
        // subtract the (capacity+1)-th largest count from everything and
        // drop non-positives — at most `capacity` counters survive
        val cut = a.values.toArray.sortBy(-_).apply(capacity)
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        a.foreach { case (k, n) =>
          if (n - cut <= 0L) dead += k else a.update(k, n - cut)
        }
        dead.foreach(a.remove)
      }
      a
    }

    override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
      val sorted = buf.toArray.sortBy { case (k, n) => (-n, k) }
      new GenericArrayData(sorted.map { case (k, n) =>
        InternalRow(k, n)
      }.asInstanceOf[Array[Any]])
    }

    override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (k, n) =>
        val bytes = k.getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(n)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val n = in.readInt()
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val kb = new Array[Byte](len)
        in.readFully(kb)
        buf.update(UTF8String.fromBytes(kb), in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "freq_items"
  }

  /** Misra–Gries frequent-items aggregate: `array<struct<item, cnt>>` of at
    * most `capacity` candidates, count-descending. Counts UNDERSHOOT by up
    * to N/(capacity+1); for exact heavy hitters, second-pass count just the
    * returned candidates (see SparkEntry q83). */
  def freqItems(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(FreqItemsAgg(
      GraftColumnBridge.expression(c.cast("string")), capacity).toAggregateExpression())

  // ------------------------------------------------------------------
  // Count-min sketch
  // ------------------------------------------------------------------

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over pre-hashed
    * 64-bit values: `depth` rows of `width` long counters; each update
    * increments one counter per row (the row's index derives from the
    * value hash re-mixed with the row index), a point query takes the
    * MINIMUM across rows. Estimates NEVER undershoot the true count and
    * overshoot by at most `e·N/width` with probability `1 − e^−depth` —
    * the complement of [[FreqItemsAgg]] (MG undershoots, answers "what is
    * frequent"; CM overshoots, answers "how often is THIS item").
    * Counter-wise ADDITION makes partial sketches mergeable in any order,
    * so per-partition/day sketches materialize once and merge later —
    * the [[HllSketchAgg]] deployment shape with counts instead of
    * distincts. Serialized size: depth·width longs (the default 5×2048 is
    * 80 KB). Row remixing is SplitMix64's finalizer — fixed constants, so
    * a sketch built anywhere probes identically everywhere. */
  case class CountMinAgg(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 8, s"width must be >= 8, got $width")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"countMin expects a pre-hashed bigint (use Sketches.countMin), got ${child.dataType}")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var d = 0
        while (d < depth) {
          buf(d * width + CountMin.cell(h, d, width)) += 1L
          d += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = CountMin.toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = CountMin.toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = CountMin.fromBytes(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "count_min"
  }

  /** Point query against a count-min sketch column: min across rows.
    * CodegenFallback on aggregated rows only — never the data stream. */
  case class CountMinQueryExpr(sketch: Expression, probe: Expression, depth: Int)
    extends Expression with CodegenFallback {

    require(depth >= 1, s"depth must be >= 1, got $depth")
    override def children: Seq[Expression] = Seq(sketch, probe)
    override def nullable: Boolean = true
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      if (sketch.dataType == BinaryType && probe.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cmQuery expects (binary, bigint), got (${sketch.dataType}, ${probe.dataType})")

    override def eval(input: InternalRow): Any = {
      val sk = sketch.eval(input)
      val pv = probe.eval(input)
      if (sk == null || pv == null) null
      else {
        val buf = CountMin.fromBytes(sk.asInstanceOf[Array[Byte]])
        require(buf.length % depth == 0,
          s"sketch length ${buf.length} not divisible by depth $depth")
        val width = buf.length / depth
        val h = pv.asInstanceOf[Long]
        var best = Long.MaxValue
        var d = 0
        while (d < depth) {
          val c = buf(d * width + CountMin.cell(h, d, width))
          if (c < best) best = c
          d += 1
        }
        best
      }
    }

    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(sketch = newChildren(0), probe = newChildren(1))
    override def prettyName: String = "cm_query"
  }

  private[functions] object CountMin {
    /** Row-d cell index for hash h: SplitMix64 finalizer over h ⊕ row salt
      * — fixed constants, engine/JVM independent. */
    def cell(h: Long, d: Int, width: Int): Int = {
      var z = h ^ (0x9e3779b97f4a7c15L * (d + 1))
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (((z % width) + width) % width).toInt
    }
    def toBytes(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }
    def fromBytes(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong())
    }
  }

  /** Count-min aggregate of `c` (hashed with codegen'd `xxhash64`; null
    * guarded for the same reason as [[hllSketch]]). */
  def countMin(c: Column, depth: Int = 5, width: Int = 2048): Column =
    GraftColumnBridge.column(CountMinAgg(
      GraftColumnBridge.expression(when(c.isNotNull, xxhash64(c))),
      depth, width).toAggregateExpression())

  /** Merge of count-min sketch columns (counter-wise addition). All inputs
    * must share one (depth, width) geometry. */
  def countMinMerge(sketch: Column, depth: Int = 5, width: Int = 2048): Column = {
    val m = CountMinMergeAgg(GraftColumnBridge.expression(sketch), depth, width)
    GraftColumnBridge.column(m.toAggregateExpression())
  }

  /** Estimated count of `probe` in a sketch column (never undershoots).
    * The probe is null-guarded like the build side ([[countMin]]): bare
    * `xxhash64(null)` returns the SEED, so an unguarded null probe would
    * report the count of whatever collides with hash(seed) instead of
    * null. */
  def countMinQuery(sketch: Column, probe: Column, depth: Int = 5): Column =
    GraftColumnBridge.column(CountMinQueryExpr(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(when(probe.isNotNull, xxhash64(probe))),
      depth))

  /** Union of count-min sketches by addition; geometry checked per row. */
  case class CountMinMergeAgg(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
    require(width >= 8, s"width must be >= 8, got $width")
    private val n = depth * width

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"countMinMerge expects a binary sketch column, got ${child.dataType}")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val sk = CountMin.fromBytes(v.asInstanceOf[Array[Byte]])
        require(sk.length == n,
          s"countMinMerge(depth=$depth, width=$width) expects $n counters, got ${sk.length}")
        var i = 0
        while (i < n) { buf(i) += sk(i); i += 1 }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = CountMin.toBytes(buf)
    override def serialize(buf: Array[Long]): Array[Byte] = CountMin.toBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = CountMin.fromBytes(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "count_min_merge"
  }

  // ------------------------------------------------------------------
  // Quantile sketch (MRL-style compactor hierarchy)
  // ------------------------------------------------------------------

  /** Mergeable quantile summary: a hierarchy of weight-2^i compactors
    * (Manku-Rajagopalan-Lindsay 1998 collapse; the equal-capacity special
    * case of KLL, Karnin et al. 2016). Level i holds values of weight 2^i;
    * when a level reaches `k` values it sorts, keeps every other survivor
    * (start offset alternating per compaction — the DETERMINISTIC stand-in
    * for KLL's random coin, chosen so reruns reproduce bit-identical
    * sketches) and promotes them one level up at double weight. Total
    * weight is conserved exactly (`n` is the exact non-null/non-NaN count;
    * an odd buffer leaves its maximum behind), min/max ride exactly
    * alongside, so `p=0`/`p=1` are exact.
    *
    * Error: one compaction at level i shifts any rank by at most 2^i/2,
    * and level i compacts at most n/(k·2^i) times, so worst-case rank
    * error ≤ H·n/(2k) with H = number of compacting levels
    * ≈ log₂(n/k) — the deterministic MRL bound (alternation makes typical
    * error far smaller; the spec pins both). The trade against
    * [[Quantiles.exact]] is the sketch trade everywhere in this file: a
    * few-KB summary per partition/day/source, mergeable later in any
    * grouping, vs an exact distributed range sort that must re-scan. At
    * 100 TB, "p99 latency last quarter" is a merge of 90 daily sketches.
    *
    * Unlike [[HllSketchAgg]]/[[CountMinAgg]] (idempotent max / commutative
    * addition), compaction makes the BYTES merge-order-dependent; the rank
    * guarantee holds under every order (the error accounting above is
    * per-compaction, order-free), so specs assert the bound, not byte
    * identity. State: ≤ k values per level ⇒ ≤ k·H doubles live. */
  private[functions] final class QuantileState(val k: Int) {
    var n: Long = 0L
    var lo: Double = Double.PositiveInfinity
    var hi: Double = Double.NegativeInfinity
    /** levels(i): values of weight 2^i, unsorted between compactions. */
    val levels = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    /** per-level alternating survivor offset (toggles each compaction). */
    val parity = mutable.ArrayBuffer(false)

    def insert(v: Double): Unit = {
      n += 1
      if (v < lo) lo = v
      if (v > hi) hi = v
      levels(0) += v
      if (levels(0).length >= k) compactFrom(0)
    }

    /** Compact every level from `i0` up that is at/over capacity. */
    def compactFrom(i0: Int): Unit = {
      var i = i0
      while (i < levels.length && levels(i).length >= k) {
        val buf = levels(i)
        val sorted = buf.sortInPlace() // ascending
        val m = sorted.length
        val pairs = m / 2
        val off = if (parity(i)) 1 else 0
        parity(i) = !parity(i)
        if (i + 1 >= levels.length) {
          levels += mutable.ArrayBuffer.empty[Double]
          parity += false
        }
        val up = levels(i + 1)
        var j = 0
        while (j < pairs) { up += sorted(off + 2 * j); j += 1 }
        // odd count: the maximum keeps its weight at this level, so total
        // weight stays exactly n
        val leftover = if (m % 2 == 1) Some(sorted(m - 1)) else None
        buf.clear()
        leftover.foreach(buf += _)
        i += 1
      }
    }

    def mergeIn(o: QuantileState): Unit = {
      require(o.k == k, s"quantile sketch k mismatch: $k vs ${o.k}")
      n += o.n
      if (o.lo < lo) lo = o.lo
      if (o.hi > hi) hi = o.hi
      var i = 0
      while (i < o.levels.length) {
        if (i >= levels.length) {
          levels += mutable.ArrayBuffer.empty[Double]
          parity += o.parity(i)
        }
        levels(i) ++= o.levels(i)
        i += 1
      }
      // a merge can overfill a HIGHER level while lower ones stay small,
      // so sweep every level ([[compactFrom]] alone stops at the first
      // under-capacity level — correct for the one-at-a-time insert path)
      i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compactFrom(i)
        i += 1
      }
    }

    /** Lower quantile at rank ceil(p·n): smallest stored value whose
      * cumulative weight reaches the target. Exact at p=0/p=1. */
    def query(p: Double): Double = {
      if (p <= 0.0) return lo
      if (p >= 1.0) return hi
      val all = mutable.ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => all += ((v, w)))
        i += 1
      }
      val sorted = all.sortBy(_._1)
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var j = 0
      while (j < sorted.length) {
        cum += sorted(j)._2
        if (cum >= target) return sorted(j)._1
        j += 1
      }
      hi
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(n)
      out.writeDouble(lo)
      out.writeDouble(hi)
      out.writeInt(levels.length)
      var i = 0
      while (i < levels.length) {
        out.writeBoolean(parity(i))
        out.writeInt(levels(i).length)
        levels(i).foreach(out.writeDouble)
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  private[functions] object QuantileState {
    def fromBytes(bytes: Array[Byte]): QuantileState = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val st = new QuantileState(in.readInt())
      st.n = in.readLong()
      st.lo = in.readDouble()
      st.hi = in.readDouble()
      val nl = in.readInt()
      var i = 0
      while (i < nl) {
        if (i >= st.levels.length) {
          st.levels += mutable.ArrayBuffer.empty[Double]
          st.parity += false
        }
        st.parity(i) = in.readBoolean()
        val sz = in.readInt()
        var j = 0
        while (j < sz) { st.levels(i) += in.readDouble(); j += 1 }
        i += 1
      }
      st
    }
    def checkK(k: Int): Unit =
      require(k >= 8 && k <= 65536 && k % 2 == 0,
        s"quantile sketch k must be even and in [8, 65536], got $k")
  }

  /** Quantile-sketch aggregate of a numeric column: `binary` summary,
    * query with [[quantileSketchQuery]], merge with
    * [[quantileSketchMerge]]. Nulls and NaN are ignored (the
    * [[graft.operators.Quantiles]] convention — its exact aggregates
    * exclude them too, so sketch and exact answer the same question). */
  case class QuantileSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileState] {

    QuantileState.checkK(k)

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"quantileSketch expects a double column (use Sketches.quantileSketch), got ${child.dataType}")

    override def createAggregationBuffer(): QuantileState = new QuantileState(k)

    override def update(buf: QuantileState, input: InternalRow): QuantileState = {
      val v = child.eval(input)
      if (v != null) {
        val d = v.asInstanceOf[Double]
        if (!java.lang.Double.isNaN(d)) buf.insert(d)
      }
      buf
    }

    override def merge(a: QuantileState, b: QuantileState): QuantileState = {
      a.mergeIn(b); a
    }

    override def eval(buf: QuantileState): Any = buf.toBytes
    override def serialize(buf: QuantileState): Array[Byte] = buf.toBytes
    override def deserialize(bytes: Array[Byte]): QuantileState =
      QuantileState.fromBytes(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "quantile_sketch"
  }

  /** Union of quantile-sketch columns (level-wise concatenation +
    * re-compaction; same `k` required per row). */
  case class QuantileSketchMergeAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileState] {

    QuantileState.checkK(k)

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"quantileSketchMerge expects a binary sketch column, got ${child.dataType}")

    override def createAggregationBuffer(): QuantileState = new QuantileState(k)

    override def update(buf: QuantileState, input: InternalRow): QuantileState = {
      val v = child.eval(input)
      if (v != null) buf.mergeIn(QuantileState.fromBytes(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(a: QuantileState, b: QuantileState): QuantileState = {
      a.mergeIn(b); a
    }

    override def eval(buf: QuantileState): Any = buf.toBytes
    override def serialize(buf: QuantileState): Array[Byte] = buf.toBytes
    override def deserialize(bytes: Array[Byte]): QuantileState =
      QuantileState.fromBytes(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0))
    override def prettyName: String = "quantile_sketch_merge"
  }

  /** p-quantile estimate from a sketch column. CodegenFallback on
    * aggregated rows only (one row per group), like [[CountMinQueryExpr]]
    * — never the data stream. Null sketch, null p, or an empty sketch
    * (all-null/NaN group) yield null. */
  case class QuantileSketchQueryExpr(sketch: Expression, p: Expression)
    extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(sketch, p)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): TypeCheckResult =
      if (sketch.dataType == BinaryType && p.dataType == DoubleType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"qsQuery expects (binary, double), got (${sketch.dataType}, ${p.dataType})")

    override def eval(input: InternalRow): Any = {
      val sk = sketch.eval(input)
      val pv = p.eval(input)
      if (sk == null || pv == null) null
      else {
        val st = QuantileState.fromBytes(sk.asInstanceOf[Array[Byte]])
        if (st.n == 0L) null else st.query(pv.asInstanceOf[Double])
      }
    }

    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(sketch = newChildren(0), p = newChildren(1))
    override def prettyName: String = "qs_query"
  }

  /** Quantile-sketch aggregate of `c` (cast to double; null/NaN ignored).
    * Worst-case rank error ≤ log₂(n/k)·n/(2k) — k=512 keeps it under ~2%
    * out to n ≈ 10⁹; the summary is ≤ k·log₂(n/k) doubles (~90 KB). */
  def quantileSketch(c: Column, k: Int = 512): Column =
    GraftColumnBridge.column(QuantileSketchAgg(
      GraftColumnBridge.expression(c.cast("double")), k).toAggregateExpression())

  /** Merge of quantile-sketch columns (all built with the same `k`). */
  def quantileSketchMerge(sketch: Column, k: Int = 512): Column =
    GraftColumnBridge.column(QuantileSketchMergeAgg(
      GraftColumnBridge.expression(sketch), k).toAggregateExpression())

  /** Scalar p-quantile estimate from a sketch column (p in [0,1];
    * p=0/p=1 are exact min/max). */
  def quantileSketchQuery(sketch: Column, p: Column): Column =
    GraftColumnBridge.column(QuantileSketchQueryExpr(
      GraftColumnBridge.expression(sketch),
      GraftColumnBridge.expression(p.cast("double"))))
}
