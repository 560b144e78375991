package graft.connector

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The mini-lakehouse catalog: directory-per-namespace, directory-per-table,
  * each table a [[TableLog]]-versioned set of immutable parquet dirs (see
  * [[GraftTable]] for the transaction and MERGE semantics). Register with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.lake.root", "/warehouse/lake")
  * spark.sql("CREATE TABLE lake.db.t (k BIGINT, v STRING)")
  * spark.sql("MERGE INTO lake.db.t t USING updates s ON t.k = s.k " +
  *   "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  * spark.sql("SELECT * FROM lake.db.t VERSION AS OF 1")   // time travel
  * }}}
  *
  * This is the engine's durable-state face (reference: the per-block
  * transactional upsert, stream_blocks.py:108-115) expressed as a Spark
  * catalog, so MERGE/UPDATE/DELETE run as plain SQL instead of through a
  * bespoke sink API.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  private def conf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  private def fs = new Path(root).getFileSystem(conf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  /** No path metacharacters in identifiers — each part is one dir name. */
  private def checkPart(part: String): String = {
    require(part.nonEmpty && !part.contains("/") && !part.contains("\\") &&
      part != "." && part != "..", s"illegal identifier part: '$part'")
    part
  }

  /** Data columns may not shadow the engine's internal names: the
    * merge-on-read scan strips [[GraftDvRead.MetaColNames]] from the
    * parquet read schema unconditionally (a real column so named would be
    * silently served the file path / row index instead of its data), and
    * z-order compaction refuses its internal columns only at OPTIMIZE time
    * — far too late for a committed table. The CDC output names are
    * reserved too: `db.t.changes` appends them to the data schema and maps
    * output fields BY NAME, so a real column so named would be silently
    * served the computed change value (and APPLY CHANGES would misclassify
    * it as a change column). Mirror of ZOrder's reserved-name check,
    * case-insensitive like column resolution.
    */
  private def checkColumnName(name: String): Unit = {
    val reserved = GraftDvRead.MetaColNames ++ Seq(ZOrder.ZCol, ZOrder.TileCol) ++
      Seq(ChangeFeed.TypeCol, ChangeFeed.VersionCol, ChangeFeed.TimestampCol)
    require(!reserved.exists(_.equalsIgnoreCase(name)),
      s"column name '$name' is reserved for graft-lake internal use " +
        s"(reserved: ${reserved.mkString(", ")})")
  }

  /** No path nested inside a table's own directory: a nested table or
    * namespace dir would pollute the parent's manifest/data layout, and a
    * nested table named like a metadata suffix would shadow
    * `t.changes`/`t.history`. Enforced at CREATE TABLE, RENAME TABLE
    * (the rename target), and CREATE NAMESPACE.
    */
  private def checkNotNestedUnderTable(parts: Seq[String]): Unit =
    (1 until parts.length).foreach { i =>
      val ancestor = parts.take(i).mkString(s"$root/", "/", "")
      require(!new TableLog(ancestor, conf).exists,
        s"cannot create ${parts.mkString(".")}: ${parts.take(i).mkString(".")} " +
          "is a table, not a namespace")
    }

  private def tableDir(ident: Identifier): String =
    ((ident.namespace :+ ident.name).map(checkPart)).mkString(s"$root/", "/", "")

  private def log(ident: Identifier) = new TableLog(tableDir(ident), conf)

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  // ---- tables --------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((namespace.map(checkPart)).mkString(s"$root/", "/", ""))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, "table.json")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  // metadata tables exist too: tableExists must agree with loadTable
  // (tooling that checks before reading would see contradictory answers)
  override def tableExists(ident: Identifier): Boolean =
    log(ident).exists || isMetadataIdent(ident)

  /** True when `ident` addresses a derived metadata table of an existing
    * parent (`db.t.changes` / `db.t.history` / `db.t.files`) — without
    * building it.
    */
  private def isMetadataIdent(ident: Identifier): Boolean =
    ident.namespace.nonEmpty &&
      Seq("changes", "history", "files").contains(ident.name) &&
      log(Identifier.of(ident.namespace.init, ident.namespace.last)).exists

  override def loadTable(ident: Identifier): Table = {
    val l = log(ident)
    if (!l.exists)
      return metadataTable(ident).getOrElse(
        throw new NoSuchTableException(catalogName +: ident.namespace.toSeq :+ ident.name))
    new GraftTable(fullName(ident), l)
  }

  // ---- maintenance procedures (`CALL lake.system.optimize/vacuum`) ------

  // an unknown procedure is an ANALYSIS 'not found', not an internal
  // failure: throw Spark's ROUTINE_NOT_FOUND condition (sqlState 42883) so
  // analyzer paths / tooling that distinguish the two see the right kind
  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, resolveTableArg, resolveNewTableArg,
        () => catalogName).getOrElse(
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "ROUTINE_NOT_FOUND",
        messageParameters = Map("routineName" ->
          (catalogName +: ident.namespace.toSeq :+ ident.name)
            .map(p => s"`$p`").mkString("."))))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq(GraftProcedures.Namespace))
      GraftProcedures.list()
    else Array.empty

  /** A procedure's `table` argument ('db.t' relative to this catalog). */
  private def resolveTableArg(name: String): TableLog = {
    val parts = name.split('.').toSeq
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"bad table argument '$name': expected 'namespace.table'")
    val l = log(Identifier.of(parts.init.toArray, parts.last))
    require(l.exists, s"no such table $catalogName.$name")
    l
  }

  /** Like [[resolveTableArg]] but for procedures that CREATE the table
    * (import_delta): the log handle is built without the existence check.
    */
  private def resolveNewTableArg(name: String): TableLog = {
    val parts = name.split('.').toSeq
    // >= 2 parts enforced HERE (resolveTableArg's exists-check masks its
    // lax parse): a bare 'name' would otherwise create a table directly
    // under the warehouse root that no db.t identifier addresses
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"bad table argument '$name': expected 'namespace.table'")
    log(Identifier.of(parts.init.toArray, parts.last))
  }

  /** Iceberg-style derived metadata tables, addressed by an extra
    * identifier part: `db.t.changes` (the change-data-feed as a
    * batch/streaming table), `db.t.history` (DESCRIBE HISTORY), and
    * `db.t.files` (the live manifest entries with their pruning stats).
    * Routed only when the full identifier resolves to no real table —
    * which it never can, because a table dir is not a namespace.
    */
  private def metadataTable(ident: Identifier): Option[Table] = {
    if (!isMetadataIdent(ident)) return None
    val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
    val pl = log(parent)
    ident.name match {
      case "changes" => Some(new GraftChangesTable(s"${fullName(parent)}.changes", pl))
      case "history" => Some(new GraftHistoryTable(s"${fullName(parent)}.history", pl))
      case "files" => Some(new GraftFilesTable(s"${fullName(parent)}.files", pl))
      case _ => None
    }
  }

  /** `VERSION AS OF v` — pin the table at manifest version `v`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val l = log(ident)
    if (!l.exists) throw new NoSuchTableException(catalogName +: ident.namespace.toSeq :+ ident.name)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"version must be a manifest number, got '$version'")
    }
    new GraftTable(fullName(ident), l, pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF t` — the newest version committed at or before `t`
    * (micros since epoch), resolved from manifest file mtimes.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val l = log(ident)
    if (!l.exists) throw new NoSuchTableException(catalogName +: ident.namespace.toSeq :+ ident.name)
    val v = l.versionAtTimestamp(timestampMicros / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no version of ${fullName(ident)} as of timestamp $timestampMicros"))
    new GraftTable(fullName(ident), l, pinnedVersion = Some(v))
  }

  /** `PARTITIONED BY` takes IDENTITY (plain-column) transforms only, and
    * maps them onto this catalog's native layout rather than hive-style
    * value directories: partition columns become the leading write-cluster
    * keys (every append sorts on them within tasks, so parquet row groups
    * carry tight min/max from the first write) and the committed per-dir
    * [[DirStats]] prune whole dirs on partition-column predicates exactly
    * as they already do for every other column. Dir-per-value layout is
    * deliberately NOT created — at high key cardinality it is the
    * small-files/manifest-bloat anti-pattern the stats design exists to
    * avoid (PLANS.md round-16 records the decision). Derived transforms
    * (bucket/days/...) are refused loudly: their layout role is served by
    * clusterBy/z-order.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val idParts: Seq[String] = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1,
        s"graft-lake PARTITIONED BY takes only plain top-level columns " +
          s"(identity transforms); got '$t'. Derived layout (bucket/days/" +
          s"truncate) is spelled as clustering instead: the " +
          s"'${GraftTable.WriteClusterByProp}' table property, or CALL " +
          "compact(..., zorder_by)")
      t.references.head.fieldNames.head
    }
    schema.fieldNames.foreach(checkColumnName)
    checkNotNestedUnderTable(ident.namespace.toSeq :+ ident.name)
    val l = log(ident)
    if (l.exists) throw new TableAlreadyExistsException(catalogName +: ident.namespace.toSeq :+ ident.name)
    val props = properties.asScala.toMap -- Seq(TableCatalog.PROP_OWNER,
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION)
    require(!props.contains(GraftTable.PartitionByProp),
      s"${GraftTable.PartitionByProp} is derived from PARTITIONED BY; " +
        "spell the partitioning there instead of setting the property")
    // canonicalize to the schema's declared spelling; refuse unknown or
    // non-atomic columns up front (a map-typed partition key would only
    // explode later, at write planning)
    val partCols = idParts.map { c =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"PARTITIONED BY column $c is not a column of ${fullName(ident)}"))
      val atomic = f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType |
             org.apache.spark.sql.types.BinaryType => false
        case _ => true
      }
      require(atomic,
        s"PARTITIONED BY column $c has unsupported type ${f.dataType.simpleString}")
      f.name
    }
    require(partCols.map(_.toLowerCase).distinct.size == partCols.size,
      s"duplicate PARTITIONED BY column in ${fullName(ident)}")
    val propsAll =
      if (partCols.isEmpty) props
      else props + (GraftTable.PartitionByProp -> partCols.mkString(","))
    GraftTable.validateProps(propsAll, fullName(ident))
    l.create(schema, propsAll)
    new GraftTable(fullName(ident), l)
  }

  /** Schema evolution on immutable parquet dirs. Additive changes are the
    * always-safe base: `ADD COLUMNS` (nullable, appended — existing dirs
    * read the new column as NULL, the standard parquet missing-column
    * semantics) and `SET/UNSET TBLPROPERTIES`. `RENAME COLUMN` and `DROP
    * COLUMN` ride on column mapping ([[ColumnMapping]] — Delta's public
    * field-indirection design): a rename changes only the LOGICAL name,
    * pinning the original physical (file) name in field metadata; a drop
    * removes the field from the logical schema and the physical column
    * simply stops being read — no parquet byte is ever rewritten. Once
    * either has happened (property [[ColumnMapping.ModeProp]]), ADD
    * COLUMN assigns a fresh unique physical name, so re-adding a dropped
    * or renamed name cannot resurrect the old physical column's bytes.
    * The new schema/properties commit as a manifest meta header through
    * the same CAS as data commits, so an ALTER serializes with concurrent
    * writes and time travel reads every snapshot under its own schema
    * (and its own mapping). `ALTER COLUMN TYPE` is accepted only for the
    * lossless parquet WIDENINGS (byte/short/int -> wider integral,
    * float -> double — the reader upcasts, no bytes rewritten); any other
    * type change is refused, it would reinterpret already-written bytes.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val l = log(ident)
    if (!l.exists) throw new NoSuchTableException(catalogName +: ident.namespace.toSeq :+ ident.name)
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      if (attempts > 100)
        throw new java.io.IOException(s"ALTER of ${fullName(ident)} failed after $attempts attempts")
      val expected = l.latestVersion
      val (sch0, props0) = expected.map(l.metaAt).getOrElse(l.baseMetaPublic)
      var sch = sch0
      var props = props0
      // graft.* validation scope: only the keys THIS statement sets — an
      // unrelated ALTER (e.g. ADD COLUMNS) on a table carrying a pre-gate
      // invalid property value must not fail until someone touches that
      // property (legacy values are correctable via SET TBLPROPERTIES)
      val touchedProps = scala.collection.mutable.Set[String]()
      // rewrite column references inside the column-list properties
      // (clusterBy, partitionBy) so layout maintenance keeps working
      // across renames/drops
      def patchColsProp(prop: String)(f: String => Option[String]): Unit =
        props.get(prop).foreach { v =>
          val cols = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap(c => f(c))
          props =
            if (cols.isEmpty) props - prop
            else props + (prop -> cols.mkString(","))
        }
      def patchClusterBy(f: String => Option[String]): Unit =
        patchColsProp(GraftTable.WriteClusterByProp)(f)
      def isPartitionCol(name: String): Boolean =
        GraftTable.partitionColumns(props).exists(_.equalsIgnoreCase(name))
      // one avoid-set per attempt, shared by every AddColumn in the
      // statement (usedPhysicalNames walks the surviving manifest headers;
      // per-column recomputation would repeat that walk), lazily so
      // mapping-inactive ALTERs never pay it
      lazy val avoid = l.usedPhysicalNames()
      changes.foreach {
        case a: TableChange.AddColumn =>
          require(a.fieldNames.length == 1,
            s"cannot add nested column ${a.fieldNames.mkString(".")}: top-level adds only")
          val name = a.fieldNames.head
          require(a.isNullable,
            s"added column $name must be nullable: rows in existing dirs read it as NULL")
          require(a.position == null,
            s"added column $name must append at the end (FIRST/AFTER would shift ordinals)")
          require(!sch.fieldNames.exists(_.equalsIgnoreCase(name)),
            s"column $name already exists in ${fullName(ident)}")
          checkColumnName(name)
          val field0 = org.apache.spark.sql.types.StructField(name, a.dataType, nullable = true)
          // mapping active => a FRESH physical name: the logical name may
          // have been a physical name in some older file (dropped or
          // renamed away), whose stale bytes must read as NULL, not data
          val field =
            if (!props.get(ColumnMapping.ModeProp).contains("id")) field0
            else field0.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .putString(ColumnMapping.PhysicalKey,
                ColumnMapping.freshPhysicalName(name,
                  avoid ++ sch.fields.map(ColumnMapping.physicalName)))
              .build())
          sch = org.apache.spark.sql.types.StructType(
            sch.fields :+ Option(a.comment).map(field.withComment).getOrElse(field))
        case r: TableChange.RenameColumn =>
          require(r.fieldNames.length == 1,
            s"cannot rename nested column ${r.fieldNames.mkString(".")}: top-level renames only")
          val from = r.fieldNames.head
          val to = r.newName
          val idx = sch.fieldNames.indexWhere(_.equalsIgnoreCase(from))
          require(idx >= 0, s"column $from does not exist in ${fullName(ident)}")
          require(!sch.fieldNames.exists(_.equalsIgnoreCase(to)),
            s"column $to already exists in ${fullName(ident)}")
          checkColumnName(to)
          val f = sch.fields(idx)
          val phys = ColumnMapping.physicalName(f)
          sch = org.apache.spark.sql.types.StructType(sch.fields.updated(idx,
            f.copy(name = to, metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putString(ColumnMapping.PhysicalKey, phys).build())))
          props = props + (ColumnMapping.ModeProp -> "id")
          patchClusterBy(c => Some(if (c.equalsIgnoreCase(from)) to else c))
          patchColsProp(GraftTable.PartitionByProp)(c =>
            Some(if (c.equalsIgnoreCase(from)) to else c))
        case d: TableChange.DeleteColumn =>
          require(d.fieldNames.length == 1,
            s"cannot drop nested column ${d.fieldNames.mkString(".")}: top-level drops only")
          val name = d.fieldNames.head
          val idx = sch.fieldNames.indexWhere(_.equalsIgnoreCase(name))
          require(idx >= 0 || d.ifExists,
            s"column $name does not exist in ${fullName(ident)}")
          if (idx >= 0) {
            require(sch.length > 1,
              s"cannot drop $name: it is the last column of ${fullName(ident)}")
            require(!isPartitionCol(name),
              s"cannot drop $name: it is a PARTITIONED BY column of ${fullName(ident)}")
            sch = org.apache.spark.sql.types.StructType(sch.fields.patch(idx, Nil, 1))
            props = props + (ColumnMapping.ModeProp -> "id")
            patchClusterBy(c => if (c.equalsIgnoreCase(name)) None else Some(c))
          }
        case u: TableChange.UpdateColumnType =>
          require(u.fieldNames.length == 1,
            s"cannot retype nested column ${u.fieldNames.mkString(".")}: top-level only")
          val name = u.fieldNames.head
          val idx = sch.fieldNames.indexWhere(_.equalsIgnoreCase(name))
          require(idx >= 0, s"column $name does not exist in ${fullName(ident)}")
          val f = sch.fields(idx)
          // WIDENING only — the conversions Spark 4's parquet readers apply
          // losslessly when the requested type is wider than the file type
          // (and which the committed stats absorb for free: int32/int64
          // footers both canonicalize to the "long" stats domain, float and
          // double to "double", so dir pruning is unaffected). Anything
          // else would reinterpret already-written bytes.
          import org.apache.spark.sql.types._
          val widens = (f.dataType, u.newDataType) match {
            case (a, b) if a == b => true   // identity: replayed DDL no-ops
            case (ByteType, ShortType | IntegerType | LongType) => true
            case (ShortType, IntegerType | LongType) => true
            case (IntegerType, LongType) => true
            case (FloatType, DoubleType) => true
            case _ => false
          }
          require(widens,
            s"ALTER COLUMN TYPE only widens (byte/short/int -> wider integral, " +
              s"float -> double): ${f.dataType.simpleString} -> " +
              s"${u.newDataType.simpleString} would reinterpret written bytes")
          sch = StructType(sch.fields.updated(idx, f.copy(dataType = u.newDataType)))
        case p: TableChange.SetProperty =>
          require(p.property != GraftTable.PartitionByProp,
            s"${GraftTable.PartitionByProp} is fixed by CREATE TABLE's " +
              "PARTITIONED BY and cannot be altered (existing dirs were " +
              "laid out under it)")
          props = props + (p.property -> p.value)
          touchedProps += p.property
        case p: TableChange.RemoveProperty =>
          require(p.property != GraftTable.PartitionByProp,
            s"${GraftTable.PartitionByProp} is fixed by CREATE TABLE's " +
              "PARTITIONED BY and cannot be unset")
          props = props - p.property
        case other => throw new UnsupportedOperationException(
          s"ALTER TABLE change not supported on graft-lake tables: $other " +
            "(ADD COLUMNS of nullable appended columns, RENAME COLUMN, " +
            "DROP COLUMN, widening ALTER COLUMN TYPE, and SET/UNSET TBLPROPERTIES)")
      }
      GraftTable.validateProps(
        props.view.filterKeys(touchedProps).toMap, fullName(ident))
      val entries = expected.map(l.entriesAt).getOrElse(Nil)
      done = l.tryCommitEntriesMeta(expected, entries, Some((sch, props)),
        op = Some("ALTER TABLE"))
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val l = log(ident)
    l.exists && l.drop()
  }

  override def renameTable(oldIdent: Identifier, newIdent0: Identifier): Unit = {
    // Spark passes RENAME TO's target through VERBATIM — `ALTER TABLE
    // lake.db.t RENAME TO lake.db.u` arrives with namespace [lake, db],
    // unlike every other command (where the catalog part is resolved
    // away). Unstripped, the rename would silently relocate the table
    // into a `root/lake/...` subtree. Strip the redundant prefix when it
    // names this catalog and no real namespace shadows that name.
    val newIdent =
      if (newIdent0.namespace.headOption.contains(catalogName) &&
          !fs.exists(nsDir(Array(catalogName))))
        Identifier.of(newIdent0.namespace.tail, newIdent0.name)
      else newIdent0
    if (!log(oldIdent).exists)
      throw new NoSuchTableException(catalogName +: oldIdent.namespace.toSeq :+ oldIdent.name)
    if (log(newIdent).exists || isMetadataIdent(newIdent))
      throw new TableAlreadyExistsException(catalogName +: newIdent.namespace.toSeq :+ newIdent.name)
    // same invariant as createTable: a rename must not move a table inside
    // another table's directory (where it would pollute that table's
    // layout and shadow its metadata suffixes) — and it must not invent
    // its target namespace (hadoop's local rename silently creates
    // parents, burying the table in a path no identifier resolves)
    checkNotNestedUnderTable(newIdent.namespace.toSeq :+ newIdent.name)
    require(namespaceExists(newIdent.namespace),
      s"cannot rename to ${fullName(newIdent)}: namespace " +
        s"${newIdent.namespace.mkString(".")} does not exist")
    if (!fs.rename(new Path(tableDir(oldIdent)), new Path(tableDir(newIdent))))
      throw new java.io.IOException(s"rename failed: $oldIdent -> $newIdent")
  }

  // ---- namespaces (one directory level each) -------------------------------

  private def nsDir(namespace: Array[String]): Path =
    new Path((namespace.map(checkPart)).mkString(s"$root/", "/", ""))

  private def isTableDir(p: Path): Boolean = fs.exists(new Path(p, "table.json"))

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    if (!fs.exists(r)) return Array.empty
    fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => namespace :+ s.getPath.getName).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (fs.exists(nsDir(namespace)) && !isTableDir(nsDir(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException((catalogName +: namespace.toSeq).toArray)
    checkNotNestedUnderTable(namespace.toSeq)
    fs.mkdirs(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft-lake namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(dir, true)
  }
}
