package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The counted-broadcast gate, shared by every operator that joins a
  * derived statistics table back into a corpus stream (the convention
  * `Dedup.ngramJaccardPairs` established): pin the table once
  * (lazy localCheckpoint — it usually has several consumers), COUNT it
  * (never guess), and broadcast it — and any table derived from it —
  * only below the caller's row cap, falling back to a shuffle join
  * above. Centralized so the pin/count/gate semantics can't drift
  * between operators. */
private[operators] final case class GatedSide(pinned: DataFrame,
                                              small: Boolean, rows: Long) {
  /** The pinned table itself, broadcast when the gate cleared. */
  def side: DataFrame = of(pinned)
  /** A table DERIVED from the pinned one (a projection, an aggregate of
    * comparable size), broadcast under the same gate decision. */
  def of(derived: DataFrame): DataFrame =
    if (small) broadcast(derived) else derived
}

private[operators] object Gates {
  /** Pin `df` and gate on its COUNTED size vs `maxRows`. The count also
    * materializes the checkpoint, so later consumers reuse the stored
    * rows instead of recomputing the plan. */
  def countedBroadcast(df: DataFrame, maxRows: Long): GatedSide = {
    val pinned = df.localCheckpoint(false)
    val rows = pinned.count()
    GatedSide(pinned, rows <= maxRows, rows)
  }
}
