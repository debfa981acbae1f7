package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-capacity context
  * windows ("packs"), the step that turns a cleaned corpus into dense
  * training rows. Within each shard documents are visited in ascending id
  * order and appended to the current pack while they fit; a document that
  * would overflow starts the next pack. A document larger than the capacity
  * occupies a pack of its own (packing never splits a document — chunking
  * oversized ones is a separate upstream concern).
  *
  * Packing is sequential BY DESIGN — pack boundaries depend on a running
  * fill that resets greedily, which no prefix-sum rewrite expresses (the
  * reset is data-dependent, unlike `floor(cumsum/C)` chunking, which
  * over-fills after any non-exact boundary). The parallelism unit is the
  * shard: real pipelines pack per output shard anyway (document order
  * across shards is arbitrary), so the sequential scan is per-shard and
  * streams in O(1) memory.
  *
  * Scale shape: one shuffle keyed by the shard columns; within each task
  * `flatMapSortedGroups` streams the shard's rows in sorted order off the
  * shuffle's own sort — no per-group buffering, no driver state. Capacity
  * of a task = one shard's row stream, O(1) state; pick shard columns with
  * enough cardinality for the cluster (a single global shard serializes,
  * exactly like single-key sessionization).
  */
object Pack {

  /** Pack assignment per document: `(idCol, pack_id, pack_offset,
    * pack_fill)`. `pack_id` counts from 0 per shard; `pack_offset` is the
    * document's start position inside its pack; `pack_fill` the fill after
    * placing it. Shard columns are not echoed (join back on `idCol`; ids
    * must be globally unique longs). Token counts must be non-negative;
    * zero-length documents join the current pack without advancing it. */
  def greedyPack(df: DataFrame, idCol: String, tokCol: String,
                 shardCols: Seq[String], capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity ($capacity) must be >= 1")
    require(shardCols.nonEmpty, "at least one shard column is required")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(
        to_json(struct(shardCols.map(col): _*)).as("_shard"),
        col(idCol).cast("long").as("_id"),
        col(tokCol).cast("long").as("_tok"))
      .as[(String, Long, Long)]
    keyed
      .groupByKey(_._1)
      .flatMapSortedGroups(col("_id")) { (_, rows) =>
        var pack = -1L
        var fill = 0L
        rows.map { case (_, id, tok) =>
          if (tok < 0)
            throw new IllegalArgumentException(
              s"negative token count $tok for id $id")
          if (pack < 0 || fill + tok > capacity) { pack += 1; fill = tok }
          else fill += tok
          (id, pack, fill - tok, fill)
        }
      }
      .toDF(idCol, "pack_id", "pack_offset", "pack_fill")
  }

  /** Materialized packed corpus: ONE ROW PER PACK — `(shardCols…,
    * pack_id, text, n_docs, pack_fill)` with member texts joined by `sep`
    * in ascending id order. The same single streaming pass as
    * [[greedyPack]] (no join-back, no second aggregation): packs are
    * emitted as the shard's row stream crosses each boundary, so task
    * state is one in-flight pack (O(capacity) characters), never a shard.
    * Shard columns round-trip through the group key (JSON), so null shard
    * values survive. */
  def packCorpus(df: DataFrame, idCol: String, textCol: String,
                 tokCol: String, shardCols: Seq[String], capacity: Long,
                 sep: String = "\n"): DataFrame = {
    require(capacity >= 1, s"capacity ($capacity) must be >= 1")
    require(shardCols.nonEmpty, "at least one shard column is required")
    val spark = df.sparkSession
    import spark.implicits._
    val shardSchema = df.select(shardCols.map(col): _*).schema
    val keyed = df
      .select(
        to_json(struct(shardCols.map(col): _*)).as("_shard"),
        col(idCol).cast("long").as("_id"),
        col(tokCol).cast("long").as("_tok"),
        col(textCol).cast("string").as("_text"))
      .as[(String, Long, Long, String)]
    keyed
      .groupByKey(_._1)
      .flatMapSortedGroups(col("_id")) { (shard, rows) =>
        new Iterator[(String, Long, String, Long, Long)] {
          private val buf = rows.buffered
          private var pack = -1L
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Long, String, Long, Long) = {
            pack += 1
            val sb = new StringBuilder
            var fill = 0L
            var n = 0L
            var open = true
            while (open && buf.hasNext) {
              val (_, id, tok, text) = buf.head
              if (tok < 0)
                throw new IllegalArgumentException(
                  s"negative token count $tok for id $id")
              if (n > 0L && fill + tok > capacity) open = false
              else {
                buf.next()
                if (n > 0L) sb.append(sep)
                sb.append(if (text == null) "" else text)
                fill += tok
                n += 1
              }
            }
            (shard, pack, sb.toString, n, fill)
          }
        }
      }
      .toDF("_shard", "pack_id", "text", "n_docs", "pack_fill")
      .withColumn("_s", from_json(col("_shard"), shardSchema))
      .select(shardCols.map(c => col(s"_s.$c")) ++
        Seq(col("pack_id"), col("text"), col("n_docs"), col("pack_fill")): _*)
  }

  /** Padding-waste report for LENGTH-BUCKETED batching — the alternative
    * to packing where sequences are batched with same-length neighbors and
    * padded to the bucket's longest member. Per bucket of width
    * `bucketWidth` (bucket k covers token counts `[k·w, (k+1)·w)`):
    * document count, the observed max length, the token sum, the padded
    * token total (`max_tok · n_docs` — what the accelerator actually
    * processes), and `waste_frac` (fraction of processed tokens that are
    * pad). Drives the bucket-width choice: too wide wastes compute, too
    * narrow starves batches.
    *
    * One aggregation, map-side combinable, output rows = buckets — the
    * plan cannot be simpler. Arithmetic is integer-derived with a fixed
    * op order (`waste_frac` is an exact-operand double division), so the
    * report reproduces bit-identically in any engine. Null and
    * non-positive token counts are excluded. */
  def paddingReport(df: DataFrame, tokCol: String, bucketWidth: Int): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth ($bucketWidth) must be >= 1")
    df.filter(col(tokCol).isNotNull && col(tokCol) > 0)
      .groupBy(floor(col(tokCol).cast("double") / bucketWidth).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), max(col(tokCol).cast("long")).as("max_tok"),
        sum(col(tokCol).cast("long")).as("sum_tok"))
      .withColumn("padded_tok", col("max_tok") * col("n_docs"))
      .withColumn("waste_frac",
        (col("padded_tok") - col("sum_tok")).cast("double") /
          col("padded_tok").cast("double"))
  }
}
