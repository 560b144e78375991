package graft.connector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, TimestampType}

/** Batch change-data-feed over a catalog table's version range — Delta's
  * `table_changes(t, s, e)` contract, computed from the manifest log
  * instead of materialized change files. Where the STREAMING changefeed
  * ([[GraftMicroBatchStream]]) is append-only by contract (a rewrite or a
  * merge-on-read DELETE in its range fails the stream loudly), the CDF
  * reconstructs those versions as retractions, so every commit kind is
  * readable:
  *
  *  - a dir ADDED at version v emits its rows as `_change_type='insert'`;
  *  - a dir whose deletion vector GREW emits exactly the newly-deleted
  *    positions as `'delete'`, attributed to the first chain vector
  *    containing them (probed executor-side against the immutable vector
  *    files);
  *  - a dir REMOVED at v emits its then-live rows (old vector applied) as
  *    `'delete'` — metadata-only DELETE, copy-on-write rewrites, and
  *    compaction all land here.
  *
  * Every emitted row carries `_commit_version` and `_commit_timestamp`
  * (manifest mtime — the rename is the commit).
  *
  * Merge-on-read UPDATE and MERGE commits emit Delta's update change
  * types instead — exact row-matched `update_preimage`/`update_postimage`
  * pairs, paired by the shared `_commit_version`: an UPDATE's writer
  * stages nothing but reinserts (the op marker suffices), and a MERGE
  * records per-commit row-lineage markers (`#cdcpre`/`#cdcpost` pre/post
  * vectors, [[TableLog.cdcAt]]) that split its rows per POSITION into
  * update pairs vs plain WHEN-MATCHED deletes and NOT-MATCHED inserts.
  * Copy-on-write rewrites stay NET-EFFECT retraction: a cow UPDATE
  * appears as delete(old dir's live rows) + insert(new dir's rows)
  * (unmatched rows are re-inserted verbatim — no row lineage to pair),
  * and a pure-layout compaction appears as equal-volume delete+insert
  * churn that nets to zero — the documented price of computing changes
  * from the log instead of writing Delta's `_change_data` files on every
  * update.
  *
  * There is ONE emit implementation: the DSv2 partition/reader pipeline
  * in [[ChangeTableRead]] (shared with the streaming face of
  * `db.t.changes`). `between` is the programmatic entry — it reads the
  * same [[GraftChangesTable]] through an unregistered relation, so the
  * API face and the SQL face cannot drift. Scale shape, retention
  * contract, and column pruning are documented on [[GraftChangesTable]].
  */
object ChangeFeed {

  val TypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  /** The change columns appended to a table's data schema. */
  def changeFields: Seq[StructField] = Seq(
    StructField(TypeCol, StringType, nullable = false),
    StructField(VersionCol, LongType, nullable = false),
    StructField(TimestampCol, TimestampType, nullable = false))

  /** Parse a `columns` read-schema override against the table's data
    * schema: fields in the requested order, names resolved
    * case-insensitively, unknowns AND duplicates rejected loudly (a
    * duplicate would build a table schema with the field twice and die
    * later as an opaque ambiguous-column analysis error). One parser for
    * both faces (catalog scan option and format-face table construction),
    * so they cannot drift.
    */
  private[connector] def parseColumnsOption(raw: String,
                                            dataSchema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    val names = raw.split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "columns option must name at least one column")
    val fields = names.map { n =>
      dataSchema.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"columns option names unknown column '$n' " +
            s"(data columns: ${dataSchema.fieldNames.mkString(", ")})"))
    }
    require(fields.map(_.name.toLowerCase).distinct.length == fields.length,
      s"columns option names duplicate columns: '$raw'")
    org.apache.spark.sql.types.StructType(fields.toSeq)
  }

  /** The manifest-diff of a version range, attributed per commit:
    *  - `added`: (dir, vector-at-add, version) — dirs that appeared;
    *  - `removed`: (dir, vector-just-before, version) — dirs that vanished
    *    (their then-live rows are the retraction);
    *  - `grown`: (dir, old-vector, new-vector, version) — surviving dirs
    *    whose deletion vector changed (the new-minus-old positions are the
    *    exact deleted rows).
    */
  final case class ChangeSet(added: Seq[(String, Option[String], Long)],
                             removed: Seq[(String, Option[String], Long)],
                             grown: Seq[(String, Option[String], String, Long)])

  /** Walk the range pairwise (endpoint diffs would mis-attribute — or miss
    * entirely — a dir added and removed mid-range) and classify every
    * entry-level change. Fails loudly on a vacuumed-away version.
    */
  private[connector] def diff(log: TableLog,
                              startVersion: Long, endVersion: Long): ChangeSet = {
    def stateAt(v: Long): Map[String, DirEntry] =
      if (v == 0) Map.empty
      else log.entriesAt(v).map(e => e.dir -> e).toMap
    val added = Seq.newBuilder[(String, Option[String], Long)]
    val removed = Seq.newBuilder[(String, Option[String], Long)]
    val grown = Seq.newBuilder[(String, Option[String], String, Long)]
    var prev = stateAt(startVersion)
    (startVersion + 1 to endVersion).foreach { v =>
      val cur = stateAt(v)
      cur.valuesIterator.filterNot(e => prev.contains(e.dir)).foreach(e =>
        added += ((e.dir, e.dv, v)))
      prev.valuesIterator.filterNot(e => cur.contains(e.dir)).foreach(e =>
        removed += ((e.dir, e.dv, v)))
      cur.valuesIterator.foreach { e =>
        prev.get(e.dir).filter(_.dv != e.dv).foreach { old =>
          // vectors only grow on a surviving dir (shrink = purge = rewrite
          // = dir replacement); a vanishing vector would mean resurrection
          require(e.dv.isDefined,
            s"vector of ${e.dir} vanished at version $v without a rewrite")
          grown += ((e.dir, old.dv, e.dv.get, v))
        }
      }
      prev = cur
    }
    ChangeSet(added.result(), removed.result(), grown.result())
  }

  /** Changes committed in versions `(startVersion, endVersion]` — exclusive
    * start, like the streaming offsets: `between(spark, log, v, v)` is
    * empty, `between(spark, log, 0, latest)` replays the table from
    * nothing (its inserts minus deletes are exactly the live snapshot).
    */
  def between(spark: SparkSession, log: TableLog,
              startVersion: Long, endVersion: Long): DataFrame = {
    val latest = log.latestVersion.getOrElse(
      throw new IllegalArgumentException(s"${log.tableDir} has no committed version"))
    require(0 <= startVersion && startVersion <= endVersion && endVersion <= latest,
      s"need 0 <= start <= end <= $latest (latest), got ($startVersion, $endVersion]")
    org.apache.spark.sql.GraftSqlBridge.readTable(spark,
      new GraftChangesTable(s"changes(${log.tableDir})", log),
      Map("startVersion" -> startVersion.toString,
        "endVersion" -> endVersion.toString))
  }
}
