package graft.connector

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lead, lit, max, min, struct, when}
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
  * type-rank)`, where the rank orders one version's change types by their
  * net effect: `update_preimage` < `delete` < `insert` <
  * `update_postimage` — so the insert half of a rewrite pair and the
  * post-image half of an update pair win their own version, which is
  * exactly the net effect (a plain lexical max would pick `update_preimage`
  * over `update_postimage` and apply the OLD row). The reduced batch then
  * MERGEs into the target: a terminal delete OR update_preimage →
  * DELETE (a pre-image survives the reduction only when the update moved
  * the row to a DIFFERENT key — the old key's row was retracted), anything
  * else → upsert. Out-of-order keys inside a batch therefore cannot corrupt the
  * replica, and restart-replayed batches (foreachBatch's at-least-once)
  * are idempotent because the reduction is deterministic and the MERGE
  * converges.
  *
  * SEQUENCE BY (`sequenceBy = Some(col)`): a multi-source or out-of-order
  * feed is ordered by a USER event-time/sequence column instead of commit
  * order alone — the terminal change is the max of `(seq,
  * _commit_version, type-rank)`, and the MERGE additionally refuses to
  * apply a change older than what the target already holds (`s.seq >=
  * t.seq`), so a late-arriving stale batch cannot roll the replica back.
  * Limits, both Delta's too: a DELETE removes the stored sequence with
  * the row, so a stale upsert arriving AFTER the delete re-inserts (no
  * tombstone store), and NULL sequence values never win over non-null.
  *
  * Scale shape: the reduction is one hash aggregation over the batch
  * (max_by over a struct — no window, no sort), and the MERGE is the
  * catalog's dir-granular group-pruned rewrite (merge-on-read if the
  * target sets `graft.merge.mode`), so a small batch touching few keys
  * rewrites few dirs.
  */
object CdcApply {

  /** SCD2 validity columns maintained by [[applyChangesScd2]]. */
  val StartCol = "__start_at"
  val EndCol = "__end_at"

  /** Case-insensitive resolution of caller-named columns against the
    * feed's data columns (Spark's own resolution rules — "K" for column
    * "k" must neither fail nor silently miss).
    */
  private def resolve(names: Seq[String], dataCols: Seq[String],
                      what: String): Seq[String] =
    names.map { k =>
      dataCols.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"$what column $k is not a data column of the feed " +
            s"(${dataCols.mkString(",")})"))
    }

  private def dataColsOf(changes: DataFrame): Seq[String] =
    changes.columns.filterNot(c =>
      c == ChangeFeed.TypeCol || c == ChangeFeed.VersionCol ||
        c == ChangeFeed.TimestampCol).toSeq

  /** Net-effect rank of one version's change types (see object doc). */
  private def typeRank: Column =
    when(col(ChangeFeed.TypeCol) === "update_postimage", 3)
      .when(col(ChangeFeed.TypeCol) === "insert", 2)
      .when(col(ChangeFeed.TypeCol) === "delete", 1)
      .otherwise(0)

  /** Start maintaining `targetTable` (an existing catalog table with the
    * feed's data columns) from `changes`. `keyCols` identify a row;
    * `sequenceBy` optionally names the user ordering column (see object
    * doc).
    */
  def applyChanges(changes: DataFrame, targetTable: String, keyCols: Seq[String],
                   checkpointLocation: String,
                   sequenceBy: Option[String] = None): StreamingQuery = {
    require(keyCols.nonEmpty, "APPLY CHANGES needs at least one key column")
    val dataCols = dataColsOf(changes)
    val resolvedKeys = resolve(keyCols, dataCols, "key")
    val resolvedSeq = sequenceBy.map(s => resolve(Seq(s), dataCols, "sequence").head)
    // misconfiguration fails at STREAM START, not inside the first
    // non-empty batch as an async StreamingQueryException
    resolvedSeq.foreach(s => require(!resolvedKeys.contains(s),
      s"sequence column $s cannot be a key column"))
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch, targetTable, resolvedKeys, dataCols, resolvedSeq); ()
      }
      .start()
  }

  /** One batch: reduce to terminal changes per key, MERGE into the target.
    * Public so a batch backfill (`ChangeFeed.between` output) can apply
    * the same way a stream does.
    */
  def applyBatch(batch: Dataset[Row], targetTable: String, keyCols0: Seq[String],
                 dataCols: Seq[String],
                 sequenceBy: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    // same case-insensitive resolution as applyChanges (this entry is
    // public for batch backfills)
    val keyCols = resolve(keyCols0, dataCols, "key")
    val seqCol = sequenceBy.map(s => resolve(Seq(s), dataCols, "sequence").head)
    seqCol.foreach(s => require(!keyCols.contains(s),
      s"sequence column $s cannot be a key column"))
    checkOrderable(batch, dataCols)
    val spark = batch.sparkSession
    // terminal order: user sequence first when given, then commit order,
    // then the net-effect type rank
    val orderCols: Seq[Column] =
      seqCol.map(col).toSeq ++ Seq(col(ChangeFeed.VersionCol), typeRank.as("__rank"))
    val rest = dataCols.filterNot(c => keyCols.contains(c) || seqCol.contains(c))
    val terminal = batch
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        (orderCols :+ col(ChangeFeed.TypeCol)) ++ rest.map(col): _*)).as("__last"))
      .select(keyCols.map(col) :+ col("__last.*"): _*)
      .drop("__rank")
    val view = s"__cdc_apply_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    terminal.createOrReplaceTempView(view)
    try {
      // null-SAFE key equality: with `=`, a feed row whose key is NULL never
      // matches, so its terminal insert would re-insert a duplicate on every
      // at-least-once foreachBatch replay — breaking the documented
      // idempotency. `<=>` matches the reduction's groupBy semantics (null
      // keys form one group) and keeps the MERGE convergent.
      val onClause = keyCols.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      // SEQUENCE BY staleness guard: never let an older event overwrite
      // newer target state (equal sequences re-apply — at-least-once
      // replays must converge)
      val guard = seqCol.fold("")(s =>
        s" AND (t.`$s` IS NULL OR s.`$s` >= t.`$s`)")
      val setClause = dataCols.filterNot(keyCols.contains)
        .map(c => s"t.`$c` = s.`$c`").mkString(", ")
      val insertCols = dataCols.map(c => s"`$c`").mkString(", ")
      val insertVals = dataCols.map(c => s"s.`$c`").mkString(", ")
      // a TERMINAL update_preimage is a retraction, exactly like a delete:
      // it survives the per-key reduction only when no post-image shares
      // its key — i.e. the update MOVED the row to another key (a
      // key-column UPDATE) — so the old key's row must be deleted, never
      // upserted with its stale pre-image values (and never re-inserted on
      // a mid-history bootstrap)
      val retract = s"s.`${ChangeFeed.TypeCol}` IN ('delete', 'update_preimage')"
      spark.sql(
        s"""MERGE INTO $targetTable t USING $view s ON $onClause
           |WHEN MATCHED AND $retract$guard THEN DELETE
           |${if (setClause.nonEmpty) s"WHEN MATCHED$guard THEN UPDATE SET $setClause" else ""}
           |WHEN NOT MATCHED AND NOT ($retract)
           |THEN INSERT ($insertCols) VALUES ($insertVals)""".stripMargin)
    } finally spark.catalog.dropTempView(view)
  }

  /** The terminal-change reduction orders a struct of the data columns;
    * map columns are not orderable and would die inside the aggregate
    * with a cryptic analysis error — refuse them up front.
    */
  private def checkOrderable(batch: Dataset[Row], dataCols: Seq[String]): Unit = {
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
  }

  /** APPLY CHANGES, SCD TYPE 2: history-preserving replica maintenance.
    * Instead of folding each key to its latest row, every change OPENS a
    * validity interval `[__start_at, __end_at)` in the sequence column's
    * domain and CLOSES the key's previous one — the slowly-changing-
    * dimension shape (`__end_at IS NULL` = the current row):
    *
    * `targetTable` must exist with schema: the feed's data columns MINUS
    * the sequence column, plus `__start_at`/`__end_at` of the sequence
    * column's type (`__end_at` nullable). `sequenceBy` is REQUIRED — an
    * interval needs a domain.
    *
    * Per batch: `update_preimage` rows drop (the post-image carries the
    * new state; a pre-image's OLD sequence value would fabricate an
    * interval), events reduce to one per (key, sequence) by
    * `(_commit_version, type-rank)`, and a per-key window orders them —
    * each non-delete event becomes a row `[seq, next event's seq)`, a
    * delete only closes. Two idempotent MERGEs apply it: one closes the
    * target's open row at the batch's first event, one upserts the
    * interval rows keyed on `(key, __start_at)` — together convergent
    * under replay (anything the close touches of this batch's own rows,
    * the upsert re-ends from the window). Ordering contract: within a
    * batch any order;
    * ACROSS batches each key's sequence must not decrease (the same
    * contract Delta's SCD2 APPLY CHANGES documents) — a violation leaves
    * the out-of-order interval un-spliced rather than corrupting closed
    * history. Keys must be STABLE (the standard CDC dimension contract):
    * a key-mutating update reads as the new key's insert, and the old
    * key's open interval closes only when its delete arrives. Sequence
    * values must be non-null — a null cannot place an interval and is
    * rejected loudly.
    *
    * Scale shape: one shuffle by key for the window (batch-sized, not
    * table-sized), then the same dir-granular MERGEs as type 1.
    */
  def applyChangesScd2(changes: DataFrame, targetTable: String,
                       keyCols: Seq[String], sequenceBy: String,
                       checkpointLocation: String): StreamingQuery = {
    require(keyCols.nonEmpty, "APPLY CHANGES needs at least one key column")
    val dataCols = dataColsOf(changes)
    val resolvedKeys = resolve(keyCols, dataCols, "key")
    val resolvedSeq = resolve(Seq(sequenceBy), dataCols, "sequence").head
    // fail at stream start, like applyChanges
    require(!resolvedKeys.contains(resolvedSeq),
      s"sequence column $resolvedSeq cannot be a key column")
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatchScd2(batch, targetTable, resolvedKeys, dataCols, resolvedSeq); ()
      }
      .start()
  }

  /** One SCD2 batch (see [[applyChangesScd2]]); public for batch backfill. */
  def applyBatchScd2(batch: Dataset[Row], targetTable: String,
                     keyCols0: Seq[String], dataCols: Seq[String],
                     sequenceBy: String): Unit = {
    if (batch.isEmpty) return
    val keyCols = resolve(keyCols0, dataCols, "key")
    val seqCol = resolve(Seq(sequenceBy), dataCols, "sequence").head
    require(!keyCols.contains(seqCol),
      s"sequence column $seqCol cannot be a key column")
    checkOrderable(batch, dataCols)
    val spark = batch.sparkSession
    val rest = dataCols.filterNot(c => keyCols.contains(c) || c == seqCol)

    // a NULL sequence value cannot place an interval: merge 2's
    // `t.__start_at = s.seq` would never match it, so every at-least-once
    // replay would insert another never-closable duplicate — reject
    // loudly, inline (raise_error rides the existing pass; no extra job)
    val seqChecked = batch.withColumn(seqCol,
      when(col(seqCol).isNotNull, col(seqCol)).otherwise(
        org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.lit(
            s"SCD2 APPLY CHANGES requires a non-null sequence column " +
              s"($seqCol): a null sequence cannot place a validity interval"))
          .cast(batch.schema(batch.schema.fieldIndex(seqCol)).dataType)))
    // one event per (key, seq): pre-images drop, rewrites/update pairs
    // reduce to their net row by (version, type-rank)
    val events = seqChecked
      .filter(col(ChangeFeed.TypeCol) =!= "update_preimage")
      .groupBy((keyCols :+ seqCol).map(col): _*)
      .agg(max(struct(
        (col(ChangeFeed.VersionCol) +: typeRank.as("__rank") +:
          col(ChangeFeed.TypeCol) +: rest.map(col)): _*)).as("__last"))
      .select((keyCols :+ seqCol).map(col) :+ col("__last.*"): _*)
      .drop("__rank", ChangeFeed.VersionCol)

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val shaped = events
      .withColumn(EndCol, lead(col(seqCol), 1).over(w))
      .withColumn("__min_start", min(col(seqCol)).over(wAll))
    // ONE MERGE per batch, not two (round-21: the per-MERGE fixed cost —
    // row-level-op planning + the copy-on-write group rewrite — is ~0.45 s
    // at sf0.1 REGARDLESS of source size, so halving the statement count
    // halves the batch's dominant term). The close half rides along as one
    // synthetic CLOSER row per key (the first event's (key, __min_start),
    // flagged `__closer`); the event rows are unchanged. Equivalence to the
    // old close-then-upsert pair, case by case:
    //  - closer matches the key's open row STRICTLY BELOW the batch
    //    (`__start_at < __min_start`) and closes it at __min_start — old
    //    merge 1's `<=` differs only at equality, where old merge 2
    //    immediately re-set that row from the window; here the equality
    //    case never routes through the closer at all: the first EVENT row
    //    matches it via `__start_at = seq` and applies that same final
    //    state (non-delete: data + window end; delete: the degenerate
    //    [s, s) close via the third clause).
    //  - event rows upsert exactly as old merge 2 did; deletes stay in the
    //    source (they close, never insert).
    //  - a source row matching NO target row inserts only when it is a
    //    non-closer non-delete — a closer with no open row (first batch)
    //    and an unmatched delete are no-ops, as before.
    // Cardinality is safe: a target row matches at most one source row
    // (events are unique per (key, seq); at most one closer per key; a row
    // matching both would need __start_at = seq < __min_start <= seq).
    val snap = shaped.localCheckpoint(true)
    val closerSel: Seq[Column] = (snap.columns.toSeq.map {
      case c if keyCols.contains(c) || c == "__min_start" => col(c)
      case c if c == seqCol => col("__min_start").as(seqCol)
      case c => lit(null).cast(snap.schema(c).dataType).as(c)
    }) :+ lit(true).as("__closer")
    // the first event per key IS unique (events are reduced per (key, seq)),
    // so the closer derivation is a narrow filter — no distinct exchange
    val source = snap.withColumn("__closer", lit(false))
      .unionByName(snap.filter(col(seqCol) === col("__min_start"))
        .select(closerSel: _*))
    val view = s"__scd2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    source.createOrReplaceTempView(view)
    try {
      val on = keyCols.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
      val dataSet = (rest.map(c => s"t.`$c` = s.`$c`") :+
        s"t.`$EndCol` = s.`$EndCol`").mkString(", ")
      val insCols = (keyCols ++ rest ++ Seq(StartCol, EndCol))
        .map(c => s"`$c`").mkString(", ")
      val insVals = (keyCols.map(k => s"s.`$k`") ++ rest.map(c => s"s.`$c`") ++
        Seq(s"s.`$seqCol`", s"s.`$EndCol`")).mkString(", ")
      spark.sql(
        s"""MERGE INTO $targetTable t USING $view s
           |ON $on AND ((NOT s.`__closer` AND t.`$StartCol` = s.`$seqCol`)
           |  OR (s.`__closer` AND t.`$EndCol` IS NULL
           |      AND t.`$StartCol` < s.`__min_start`))
           |WHEN MATCHED AND s.`__closer`
           |  THEN UPDATE SET t.`$EndCol` = s.`__min_start`
           |WHEN MATCHED AND NOT s.`__closer`
           |  AND s.`${ChangeFeed.TypeCol}` <> 'delete'
           |  THEN UPDATE SET $dataSet
           |WHEN MATCHED AND NOT s.`__closer`
           |  AND s.`${ChangeFeed.TypeCol}` = 'delete' AND t.`$EndCol` IS NULL
           |  AND s.`$seqCol` = s.`__min_start`
           |  THEN UPDATE SET t.`$EndCol` = s.`__min_start`
           |WHEN NOT MATCHED AND NOT s.`__closer`
           |  AND s.`${ChangeFeed.TypeCol}` <> 'delete'
           |  THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
    } finally spark.catalog.dropTempView(view)
  }
}
