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
}
