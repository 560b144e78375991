package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert ("latest state wins") semantics — the load-bearing primitive of
  * the reference engine, where every table write is an insert-or-update by
  * primary key (reference: `engine/post_storage.py:68-71` and the same pattern
  * in all nine storages; SURVEY.md S6/S7/W6).
  *
  * Batch model: ingestion emits an append-only *upsert log* (rows tagged with a
  * monotonically increasing sequence and an op in {upsert, delete}); these
  * operators compact a log to current state. The formulation is one window
  * shuffle on the key columns — no driver-side state — so it scales linearly
  * with the log and parallelizes by key at any cluster size.
  */
object Upsert {

  /** Keep the newest row per key, ordering by `seq` descending (ties broken by
    * nothing — callers must pass a total order, e.g. (ts, event_id)).
    * Reference: every `table.upsert(row, pk)` replays to this.
    */
  def latestWins(df: DataFrame, keys: Seq[String], seq: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(seq.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Compact a sparse upsert log to current state with per-column merge.
    *
    * Reference semantics: upserts may carry a *subset* of columns (e.g.
    * score-only updates, `processors/engine_comments_contract_processor.py:107-115`);
    * a later sparse upsert must not null out untouched columns, so compaction is
    * "last non-null value per column", not "last whole row". Deletes
    * (`engine/post_storage.py:407-413`) reset the key: only rows after the last
    * delete contribute, and a trailing delete removes the key entirely.
    *
    * `log` columns: keys ++ data columns (null = untouched), `seqCol` (total
    * order within key), `opCol` ("upsert" | "delete").
    *
    * Distributed shape: all three windows share one partitioning on `keys`, so
    * Catalyst plans a single shuffle + sort; cost is O(log size), no state.
    */
  def compactLog(log: DataFrame, keys: Seq[String], seqCol: String,
                 opCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val ordered = Window.partitionBy(keyCols: _*).orderBy(col(seqCol))
    val full = Window.partitionBy(keyCols: _*)
      .orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dataCols = log.columns.filterNot(c =>
      keys.contains(c) || c == seqCol || c == opCol)

    // Generation = number of deletes seen so far (inclusive); only the final
    // generation's upserts survive, and a generation that *ends* in the delete
    // row itself means the key is currently deleted.
    val withGen = log
      .withColumn("__gen", sum(when(col(opCol) === "delete", 1).otherwise(0)).over(ordered))
      .withColumn("__maxgen", max(col("__gen")).over(full))
      .withColumn("__maxseq", max(col(seqCol)).over(full))

    val current = withGen
      .filter(col("__gen") === col("__maxgen"))
      .withColumn("__deleted",
        max(when(col(opCol) === "delete" && col(seqCol) === col("__maxseq"), 1)
          .otherwise(0)).over(full))
      .filter(col("__deleted") === 0 && col(opCol) =!= "delete")

    val merged = dataCols.foldLeft(current) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(
        Window.partitionBy(keyCols: _*).orderBy(col(seqCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }
    latestWins(merged, keys, Seq(col(seqCol)))
      .drop(opCol, seqCol, "__gen", "__maxgen", "__maxseq", "__deleted")
  }
}
