package graft.connector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.write.LogicalWriteInfo
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Column mapping for the mini-lakehouse — Delta's public "column mapping"
  * design (name mode with id-style fresh names on re-add), which is what
  * unlocks RENAME COLUMN and DROP COLUMN without rewriting a single parquet
  * byte:
  *
  *  - every field's PHYSICAL name (the column name stored in parquet files)
  *    is its logical name unless the field's metadata carries
  *    [[PhysicalKey]] — so tables that never rename/drop have no mapping at
  *    all and take exactly the pre-mapping code paths;
  *  - RENAME changes only the logical name, pinning the original physical
  *    name in metadata; existing files read unchanged;
  *  - DROP removes the field from the logical schema; the physical column
  *    simply stops being read (parquet read-by-name ignores extras);
  *  - once any rename/drop happened (table property [[ModeProp]]), ADD
  *    COLUMN assigns a FRESH physical name — re-adding a dropped/renamed
  *    name must NOT resurrect the old physical column's bytes.
  *
  * The mapping is versioned with the schema through the manifest meta
  * header (StructField metadata survives `StructType.json`), so time
  * travel reads every snapshot under its own logical->physical mapping.
  *
  * Translation points, all conditional on [[needed]] so unmapped tables
  * pay nothing: the delegated parquet tables get the PHYSICAL schema
  * (reads match by file column name; writes stamp file column names),
  * pushed filters and pruned schemas translate logical->physical on the
  * way in, scan `readSchema` reports logical on the way out (row DATA is
  * positional and never touched), and [[DirStats]] probes — which are
  * keyed by the footer's physical names — translate their filters.
  */
object ColumnMapping {

  /** StructField metadata key holding the field's physical name. */
  val PhysicalKey = "graft.physical"

  /** Table property marking that mapping-relevant DDL has happened; ADD
    * COLUMN assigns fresh physical names from then on.
    */
  val ModeProp = "graft.columnMapping"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** A fresh physical name for logical column `logical`, guaranteed outside
    * `used` (every physical name the table can still read — current AND
    * historical schemas plus live file footers). The 8-hex tag alone has a
    * ~2^-32 birthday risk per re-add of the SAME logical name; a silent hit
    * would make the new column read the dropped column's stale bytes, so
    * collisions regenerate instead. `gen` is injectable for the forced-
    * collision spec; the production default is the random tag.
    */
  def freshPhysicalName(logical: String, used: Set[String],
      gen: () => String =
        () => java.util.UUID.randomUUID().toString.take(8)): String = {
    var attempts = 0
    var candidate = s"col-${gen()}-$logical"
    while (used.contains(candidate)) {
      attempts += 1
      require(attempts <= 100,
        s"could not generate a fresh physical name for column $logical " +
          s"after $attempts attempts (generator exhausted?)")
      candidate = s"col-${gen()}-$logical"
    }
    candidate
  }

  /** True when any field's physical name differs from its logical name. */
  def needed(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** logical -> physical for the fields that differ (empty = no mapping). */
  def nameMap(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .map(f => f.name -> physicalName(f))
      .filter { case (l, p) => l != p }
      .toMap

  /** The schema as stored in parquet files: fields renamed to their
    * physical names, the mapping metadata stripped (files carry no
    * catalog bookkeeping). Identity when no mapping is needed.
    */
  def toPhysical(schema: StructType): StructType =
    if (!needed(schema)) schema
    else StructType(schema.fields.map { f =>
      f.copy(name = physicalName(f),
        metadata = new MetadataBuilder().withMetadata(f.metadata)
          .remove(PhysicalKey).build())
    })

  /** Rename fields per `map` (logical->physical or the inverse), keeping
    * order, types, and unmapped fields untouched.
    */
  def rename(schema: StructType, map: Map[String, String]): StructType =
    if (map.isEmpty) schema
    else StructType(schema.fields.map(f =>
      map.get(f.name).fold(f)(n => f.copy(name = n))))

  /** Translate attribute names inside a catalyst expression. */
  def translate(e: Expression, map: Map[String, String]): Expression =
    if (map.isEmpty) e
    else e.transform {
      case a: AttributeReference if map.contains(a.name) =>
        a.withName(map(a.name))
    }

  /** Translate attribute names inside a V1 source filter (the form
    * [[DirStats]] probes take; stats are keyed by physical column name).
    * Unknown filter shapes pass through untouched — DirStats treats an
    * unrecognized/unknown-column filter conservatively (never prunes), so
    * a missed translation costs IO, never rows.
    */
  def translateV1(f: sources.Filter, map: Map[String, String]): sources.Filter = {
    if (map.isEmpty) return f
    def n(a: String): String = map.getOrElse(a, a)
    f match {
      case sources.EqualTo(a, v) => sources.EqualTo(n(a), v)
      case sources.EqualNullSafe(a, v) => sources.EqualNullSafe(n(a), v)
      case sources.GreaterThan(a, v) => sources.GreaterThan(n(a), v)
      case sources.GreaterThanOrEqual(a, v) => sources.GreaterThanOrEqual(n(a), v)
      case sources.LessThan(a, v) => sources.LessThan(n(a), v)
      case sources.LessThanOrEqual(a, v) => sources.LessThanOrEqual(n(a), v)
      case sources.In(a, vs) => sources.In(n(a), vs)
      case sources.IsNull(a) => sources.IsNull(n(a))
      case sources.IsNotNull(a) => sources.IsNotNull(n(a))
      case sources.StringStartsWith(a, v) => sources.StringStartsWith(n(a), v)
      case sources.StringEndsWith(a, v) => sources.StringEndsWith(n(a), v)
      case sources.StringContains(a, v) => sources.StringContains(n(a), v)
      case sources.And(l, r) => sources.And(translateV1(l, map), translateV1(r, map))
      case sources.Or(l, r) => sources.Or(translateV1(l, map), translateV1(r, map))
      case sources.Not(c) => sources.Not(translateV1(c, map))
      case other => other
    }
  }

  /** The write-side face: a [[LogicalWriteInfo]] whose schema carries the
    * table's physical names, so the delegated parquet writer stamps file
    * column names the mapped READ path expects. Identity when unmapped.
    */
  def physicalWriteInfo(info: LogicalWriteInfo, tableSchema: StructType): LogicalWriteInfo = {
    val map = nameMap(tableSchema)
    if (map.isEmpty) info
    else new LogicalWriteInfo {
      override def queryId(): String = info.queryId()
      override def schema(): StructType = rename(info.schema(), map)
      override def options(): CaseInsensitiveStringMap = info.options()
      override def rowIdSchema(): java.util.Optional[StructType] = info.rowIdSchema()
      override def metadataSchema(): java.util.Optional[StructType] = info.metadataSchema()
    }
  }

  /** Rename a DataFrame's columns between name domains (used by the V1
    * read/write paths — compaction, the upsert merge store). SIMULTANEOUS
    * (positional toDF), never a sequential fold: chained renames produce
    * maps like {b->a, c->b}, where renaming one column at a time collides
    * with a still-unrenamed sibling and yields duplicate columns. Columns
    * outside the map (e.g. the z-order tile column) pass through.
    */
  def renameDf(df: DataFrame, map: Map[String, String]): DataFrame =
    if (map.isEmpty) df
    else df.toDF(df.columns.map(c => map.getOrElse(c, c)).toIndexedSeq: _*)

  /** Inverse of [[nameMap]]: physical -> logical. */
  def inverseMap(schema: StructType): Map[String, String] =
    nameMap(schema).map(_.swap)
}
