package graft.connector

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, max, struct}
import org.apache.spark.sql.streaming.StreamingQuery

/** APPLY CHANGES INTO — maintain a keyed replica table from a
  * change-data-feed stream (the `db.t.changes` metadata table, or any
  * frame with `_change_type` / `_commit_version` columns). The downstream
  * half of the CDC story: `t.changes` produces retractions, this folds
  * them back into state.
  *
  * Each micro-batch is reduced to ONE terminal change per key before it
  * touches the target — a batch routinely carries several versions of the
  * same key (a copy-on-write update retracts the old row and inserts the
  * new one; a replayed history may insert, delete, and re-insert). The
  * terminal change is the row with the greatest `(_commit_version,
  * _change_type)` — `"insert" > "delete"` lexically, so within one
  * version the insert half of a rewrite pair wins, which is exactly the
  * net effect. The reduced batch then MERGEs into the target: terminal
  * delete → DELETE, terminal insert → upsert. Out-of-order keys inside a
  * batch therefore cannot corrupt the replica, and restart-replayed
  * batches (foreachBatch's at-least-once) are idempotent because the
  * reduction is deterministic and the MERGE converges.
  *
  * Scale shape: the reduction is one hash aggregation over the batch
  * (max_by over a struct — no window, no sort), and the MERGE is the
  * catalog's dir-granular group-pruned rewrite (merge-on-read if the
  * target sets `graft.merge.mode`), so a small batch touching few keys
  * rewrites few dirs.
  */
object CdcApply {

  /** Start maintaining `targetTable` (an existing catalog table with the
    * feed's data columns) from `changes`. `keyCols` identify a row.
    */
  def applyChanges(changes: DataFrame, targetTable: String, keyCols: Seq[String],
                   checkpointLocation: String): StreamingQuery = {
    require(keyCols.nonEmpty, "APPLY CHANGES needs at least one key column")
    val dataCols = changes.columns.filterNot(c =>
      c == ChangeFeed.TypeCol || c == ChangeFeed.VersionCol ||
        c == ChangeFeed.TimestampCol).toSeq
    // resolve keys CASE-INSENSITIVELY, like Spark's own column resolution
    // (and the catalog's reserved-name / clusterBy checks) — a caller
    // passing "K" for column "k" must neither fail here nor silently have
    // the key treated as a data column downstream
    val resolvedKeys = keyCols.map { k =>
      dataCols.find(_.equalsIgnoreCase(k)).getOrElse(throw new IllegalArgumentException(
        s"key column $k is not a data column of the feed (${dataCols.mkString(",")})"))
    }
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, targetTable, resolvedKeys, dataCols); ()
      }
      .start()
  }

  /** One batch: reduce to terminal changes per key, MERGE into the target.
    * Public so a batch backfill (`ChangeFeed.between` output) can apply
    * the same way a stream does.
    */
  def applyBatch(batch: Dataset[Row], targetTable: String, keyCols0: Seq[String],
                 dataCols: Seq[String]): Unit = {
    if (batch.isEmpty) return
    // same case-insensitive key resolution as applyChanges (this entry is
    // public for batch backfills)
    val keyCols = keyCols0.map { k =>
      dataCols.find(_.equalsIgnoreCase(k)).getOrElse(throw new IllegalArgumentException(
        s"key column $k is not a data column of the feed (${dataCols.mkString(",")})"))
    }
    // the terminal-change reduction orders a struct of the data columns;
    // map columns are not orderable and would die inside the aggregate
    // with a cryptic analysis error — refuse them up front
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    batch.schema.fields.filter(f => dataCols.contains(f.name)).foreach { f =>
      require(!hasMap(f.dataType),
        s"APPLY CHANGES cannot reduce over map-typed column ${f.name}: " +
          "maps are not orderable (project it to a sorted array first)")
    }
    val spark = batch.sparkSession
    val terminal = batch
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        (Seq(ChangeFeed.VersionCol, ChangeFeed.TypeCol) ++
          dataCols.filterNot(keyCols.contains)).map(col): _*)).as("__last"))
      .select(keyCols.map(col) :+ col("__last.*"): _*)
    val view = s"__cdc_apply_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    terminal.createOrReplaceTempView(view)
    try {
      // null-SAFE key equality: with `=`, a feed row whose key is NULL never
      // matches, so its terminal insert would re-insert a duplicate on every
      // at-least-once foreachBatch replay — breaking the documented
      // idempotency. `<=>` matches the reduction's groupBy semantics (null
      // keys form one group) and keeps the MERGE convergent.
      val onClause = keyCols.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val setClause = dataCols.filterNot(keyCols.contains)
        .map(c => s"t.`$c` = s.`$c`").mkString(", ")
      val insertCols = dataCols.map(c => s"`$c`").mkString(", ")
      val insertVals = dataCols.map(c => s"s.`$c`").mkString(", ")
      spark.sql(
        s"""MERGE INTO $targetTable t USING $view s ON $onClause
           |WHEN MATCHED AND s.`${ChangeFeed.TypeCol}` = 'delete' THEN DELETE
           |${if (setClause.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $setClause" else ""}
           |WHEN NOT MATCHED AND s.`${ChangeFeed.TypeCol}` <> 'delete'
           |THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
    } finally spark.catalog.dropTempView(view)
  }
}
