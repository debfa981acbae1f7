package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkFunSuite {
  import spark.implicits._

  test("zValue: hand-interleaved bits, bounds fail loudly") {
    // x = 0b101 = 5, y = 0b011 = 3, bits = 3:
    // z bits (msb..lsb): y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    assert(got == 27L)
    // corners of the 2-bit grid
    val corners = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(corners == Seq(0L, 5L, 10L, 15L))
    // out-of-range coordinates raise, never wrap
    intercept[Exception] {
      Seq((4L, 0L)).toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y"), 2)).collect()
    }
    intercept[IllegalArgumentException] {
      Layout.zValue(col("x"), col("y"), 0)
    }
  }

  test("zOrderAudit: z-order spans both dims ~1/sqrt(F); x-sort spans one") {
    // full uniform 32x32 grid, 16 files
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val z = Layout.zOrderAudit(grid, "x", "y", bits = 5, nFiles = 16)
      .collect()
    assert(z.length == 16)
    // every z bucket is an 8x8 quadrant: span fraction 8/32 = 0.25 in BOTH
    z.foreach { r =>
      assert(r.getLong(1) == 64L)
      assert(r.getDouble(6) == 0.25 && r.getDouble(7) == 0.25)
    }
    // contrast: bucketing the same grid by x alone (the single-column
    // sort layout) pins x to 2/32 but leaves y spanning the whole domain
    val xsorted = grid
      .groupBy(expr("x div 2").as("bucket"))
      .agg(min("y").as("y_min"), max("y").as("y_max"))
      .collect()
    xsorted.foreach(r => assert(r.getLong(2) - r.getLong(1) + 1 == 32L))
  }

  test("hilbertValue: base case, bijection, and the adjacency property Z lacks") {
    // bits = 1 hand walk: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3
    val base = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 1).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(base == Seq(0L, 1L, 2L, 3L))
    // bits = 3: a BIJECTION onto 0..63, and consecutive d values are GRID
    // NEIGHBORS (|Δx|+|Δy| = 1 at every step) — the defining Hilbert
    // property, which Morton/Z violates at every quadrant boundary.
    // Properties independent of any reference implementation.
    val cells = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), 3).as("d"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until 64L))
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L)
    }
    // and the Z curve indeed breaks adjacency somewhere on the same grid
    val zcells = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 3).as("z"))
      .collect().map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(zcells.sliding(2).exists { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    })
    // quadrant containment: the first quarter of indices fills ONE 4x4
    // quadrant (here the lower-left, given the base orientation)
    val firstQ = cells.take(16).map(_._2)
    assert(firstQ.forall { case (x, y) => x < 4 && y < 4 })
    // bounds raise, never wrap
    intercept[Exception] {
      Seq((8L, 0L)).toDF("x", "y")
        .select(Layout.hilbertValue(col("x"), col("y"), 3)).collect()
    }
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("x"), col("y"), 0)
    }
  }

  test("hilbertAudit: tighter-or-equal boxes than zOrderAudit on the uniform grid") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val h = Layout.hilbertAudit(grid, "x", "y", bits = 5, nFiles = 16)
      .collect()
    assert(h.length == 16)
    // every equal-count Hilbert range is a contiguous 8x8 box too
    h.foreach { r =>
      assert(r.getLong(1) == 64L)
      assert(r.getDouble(6) == 0.25 && r.getDouble(7) == 0.25)
    }
  }

  test("zOrderAudit: nulls dropped, empty buckets absent") {
    val sparse = Seq((Some(0L), Some(0L)), (Some(1L), Some(1L)),
      (None, Some(2L)), (Some(2L), None)).toDF("x", "y")
    val got = Layout.zOrderAudit(sparse, "x", "y", bits = 2, nFiles = 4)
      .orderBy("bucket").collect()
    // z(0,0) = 0, z(1,1) = 3 -> both in bucket 0 (width ceil(16/4) = 4)
    assert(got.length == 1 && got.head.getLong(1) == 2L)
  }
}
