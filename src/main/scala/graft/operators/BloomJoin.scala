package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered anti-join — exclude-list scrubbing at corpus scale.
  *
  * The 100 TB shape this exists for: `left` is the full corpus, `right` is a
  * large exclude list (seen-URLs, licensed-content IDs, prior-epoch
  * fingerprints) — too big to broadcast as a hash relation, so a plain
  * `left_anti` shuffles BOTH sides on the key. But an anti-join only needs
  * set membership, and approximate membership fits in a sketch: a bloom
  * filter over `right` (treeAggregate, one pass, driver holds only the
  * fixed-size bit array — ~1.2 MB per million keys at 1% fpp) broadcast to
  * every task classifies each left row:
  *
  *  - "definitely absent" -> emit immediately, NO shuffle for this row;
  *  - "maybe present"     -> exact `left_anti` verification on the residue.
  *
  * The result is EXACT — false positives only route extra rows through the
  * exact join, never change the answer (q80's oracle is the plain anti-join
  * SQL). Shuffled left volume drops from |left| to |matches| + fpp·|left|.
  *
  * Why a UDF at the probe: Spark's bloom expressions (`bloom_filter_agg` /
  * `might_contain`) are internal, unregistered, and expect their own
  * xxhash64 pre-hash; the public sketch probe is a primitive-long test
  * against broadcast bits. The UDF costs the codegen fusion of ONE boolean
  * predicate but removes a data-sized exchange — the right trade everywhere
  * the exchange is the bottleneck. The sketch ships once per executor
  * (broadcast), not per task, and deserializes lazily on first probe.
  */
object BloomJoin {

  /** Serializable carrier: bytes travel in the broadcast, the sketch
    * rebuilds lazily once per executor (BloomFilter itself is not
    * guaranteed serializable across Spark versions; its wire format is). */
  private class Probe(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val bf: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    def containsLong(v: Long): Boolean = bf.mightContainLong(v)
    def containsString(v: String): Boolean = bf.mightContainString(v)
  }

  private def sketchBytes(right: DataFrame, rightKey: String,
                          expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `left LEFT ANTI JOIN right ON left(leftKey) = right(rightKey)`, with a
    * bloom prefilter so only possible-members shuffle. Exact result.
    *
    * `expectedItems` sizes the sketch — overshooting wastes memory
    * linearly, undershooting inflates fpp (still correct, just less
    * pruning). Key column must be integral or string (the two shapes an
    * exclude list takes; integral keys probe as long).
    */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String,
               rightKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive: $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")
    require(!left.columns.contains("_bloom_rk"),
      "left must not contain reserved column _bloom_rk")
    val spark = left.sparkSession
    // The right side is consumed three times (emptiness probe, bloom build,
    // exact residue join) — when the exclude list is DERIVED (q84's
    // distinct-fingerprint ledger, not a plain table read), re-deriving it
    // per consumer tripled its cost. Materialize the slim key column once
    // (lazy local checkpoint: the probe's pass populates it, the bloom
    // build and residue join read cached blocks). The checkpoint carries
    // ONLY the key column — at exclude-list scale that is the same slim
    // table the exact join must shuffle anyway.
    val rightKeyed = right.select(col(rightKey).as("_bloom_rk"))
      .localCheckpoint(false)
    // stat.bloomFilter NPEs on a zero-row input, and an empty exclude list
    // excludes nothing anyway
    if (rightKeyed.isEmpty) return left
    val bytes = sketchBytes(rightKeyed, "_bloom_rk", expectedItems, fpp)
    val probe: Broadcast[Probe] = spark.sparkContext.broadcast(new Probe(bytes))

    val keyType = left.schema(leftKey).dataType
    val mightContain: Column = keyType match {
      case StringType =>
        val f = udf { (v: String) => v != null && probe.value.containsString(v) }
        f(col(leftKey))
      case _ =>
        // stat.bloomFilter puts integral keys as longs; probe the same way
        val f = udf { (v: java.lang.Long) => v != null && probe.value.containsLong(v) }
        f(col(leftKey).cast(LongType))
    }

    // null keys never match an equi-join key -> they are kept, like left_anti.
    // The right key is re-aliased so a SAME-NAMED key on both sides (the
    // common fingerprint-vs-fingerprint case) does not trip Spark's
    // ambiguous-reference check in the join condition.
    val definiteAbsent = left.filter(col(leftKey).isNull || !mightContain)
    val residue = left.filter(col(leftKey).isNotNull && mightContain)
      .join(rightKeyed, col(leftKey) === col("_bloom_rk"), "left_anti")
    definiteAbsent.unionByName(residue)
  }
}
