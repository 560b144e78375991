package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.sources._

/** Per-data-dir column statistics for the mini-lakehouse manifest — the same
  * role Delta's per-file `stats` JSON plays in its add actions: recorded once
  * at commit time (from the parquet footers of the freshly-written dir, so no
  * data is re-read), carried forward verbatim while the dir lives, and used
  * by [[GraftRowLevelOperation]] to prune entire dirs out of a copy-on-write
  * MERGE/UPDATE/DELETE rewrite. Pruning is strictly conservative: a dir is
  * kept whenever its stats cannot PROVE no row matches, and any column,
  * type, or filter shape this module does not understand simply never
  * prunes. The stats are advisory for reads and never consulted for row
  * filtering, so a stale or lost stats entry costs performance, not
  * correctness.
  *
  * Value domains are normalized at collection time so the may-match check is
  * a plain comparison: integral columns to Long (dates to epoch days),
  * floating to Double (any NaN in a footer poisons that column's stats —
  * parquet writers disagree on NaN ordering), timestamps to micros, UTF8
  * binary to String, booleans to Boolean. Everything else (decimals, INT96,
  * nested) is recorded as statless and never prunes.
  */
final case class ColStats(typ: String, min: Any, max: Any, nulls: Long)

final case class DirStats(rows: Long, cols: Map[String, ColStats])

object DirStats {

  // ---- collection from parquet footers ------------------------------------

  /** Top-level field names of one dir's parquet schema, from the FIRST
    * file's footer (a dir is written by one job, so its files share a
    * schema). Best-effort: the caller ([[TableLog.usedPhysicalNames]])
    * uses it to widen a collision-avoid set for dirs with no committed
    * stats — an unreadable footer falls back to the other sources.
    */
  def footerFieldNames(dir: String, conf: Configuration): Set[String] =
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return Set.empty
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName).headOption match {
        case None => Set.empty
        case Some(st) =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
          try {
            val names = Set.newBuilder[String]
            reader.getFooter.getFileMetaData.getSchema.getFields
              .forEach(f => names += f.getName)
            names.result()
          } finally reader.close()
      }
    } catch {
      case scala.util.control.NonFatal(_) => Set.empty
    }

  /** Per-file physical row counts of a dir's parquet files, (file name,
    * rows) sorted by name — footer reads only. The mor MERGE commit
    * resolves task-local staged-row indexes against these to build its
    * post-image vector; unlike [[collect]], a read failure here must fail
    * LOUDLY (a silently-missing count would misattribute every later row).
    */
  def fileRowCounts(dir: String, conf: Configuration): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .map { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try {
          var rows = 0L
          reader.getFooter.getBlocks.forEach(b => rows += b.getRowCount)
          st.getPath.getName -> rows
        } finally reader.close()
      }
  }

  /** Footer-derived stats of every parquet file under `dir` (non-recursive);
    * a missing or file-less dir is committed-empty (0 rows), and None means
    * a footer failed to read — the dir commits statless and never prunes.
    */
  def collect(dir: String, conf: Configuration): Option[DirStats] =
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      // a rewrite with zero output tasks may never create its staging dir:
      // that is a committed-empty dir, not a stats failure
      if (!fs.exists(p)) return Some(DirStats(0L, Map.empty))
      val files = fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (files.isEmpty) return Some(DirStats(0L, Map.empty))
      var rows = 0L
      // name -> accumulator; None value = column seen but unusable
      val acc = scala.collection.mutable.LinkedHashMap[String, Option[ColAcc]]()
      files.foreach { st =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
        try {
          val blocks = reader.getFooter.getBlocks
          blocks.forEach { block =>
            rows += block.getRowCount
            block.getColumns.forEach { chunk =>
              val pathParts = chunk.getPath.toArray
              if (pathParts.length == 1) {
                val name = pathParts(0)
                val cur = acc.getOrElseUpdate(name, Some(new ColAcc))
                cur.foreach { a =>
                  if (!a.absorb(chunk)) acc(name) = None
                }
              }
            }
          }
        } finally reader.close()
      }
      Some(DirStats(rows, acc.collect {
        case (name, Some(a)) if a.usable => name -> a.result
      }.toMap))
    } catch {
      case e: Exception =>
        System.err.println(s"[graft-lake] stats collection failed for $dir " +
          s"(dir stays unprunable): ${e.getClass.getName}: ${e.getMessage}")
        None
    }

  /** Accumulates one column's min/max/nulls across chunks; any chunk it
    * cannot interpret invalidates the whole column (conservative).
    */
  private final class ColAcc {
    private var typ: String = _
    private var min: Any = _
    private var max: Any = _
    private var nulls = 0L
    private var any = false   // any non-null value absorbed

    def absorb(chunk: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
      val st = chunk.getStatistics
      if (st == null || !st.isNumNullsSet) return false
      nulls += st.getNumNulls
      if (!st.hasNonNullValue) return true   // all-null chunk: nothing to widen
      val prim = chunk.getPrimitiveType
      val t = typeTag(prim)
      if (t == null) return false
      val (lo, hi) = normalize(prim, t, st) match {
        case Some(b) => b
        case None => return false
      }
      // millis/nanos chunks land in the micros domain after normalize()
      val canon = if (t.endsWith("->micros")) "micros" else t
      if (!any) { typ = canon; min = lo; max = hi; any = true }
      else if (typ != canon) return false
      else {
        if (lt(t, lo, min)) min = lo
        if (lt(t, max, hi)) max = hi
      }
      true
    }

    def usable: Boolean = any || nulls > 0
    def result: ColStats =
      if (any) ColStats(typ, min, max, nulls)
      else ColStats("null", null, null, nulls)   // all-null column
  }

  /** Stored-domain tag for a parquet primitive, or null when unsupported. */
  private def typeTag(prim: org.apache.parquet.schema.PrimitiveType): String = {
    val logical = prim.getLogicalTypeAnnotation
    prim.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => "boolean"
      case PrimitiveTypeName.INT32 => logical match {
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => "days"
        case null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation => "long"
        case _ => null   // decimal-as-int32 etc.
      }
      case PrimitiveTypeName.INT64 => logical match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS => "millis->micros"
            case LogicalTypeAnnotation.TimeUnit.MICROS => "micros"
            case LogicalTypeAnnotation.TimeUnit.NANOS => "nanos->micros"
          }
        case null | _: LogicalTypeAnnotation.IntLogicalTypeAnnotation => "long"
        case _ => null
      }
      case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE => "double"
      case PrimitiveTypeName.BINARY => logical match {
        case _: LogicalTypeAnnotation.StringLogicalTypeAnnotation => "string"
        case _ => null
      }
      case _ => null
    }
  }

  /** Normalized (min, max) of a chunk in the tag's domain; None = refuse. */
  private def normalize(prim: org.apache.parquet.schema.PrimitiveType,
                        tag: String,
                        st: org.apache.parquet.column.statistics.Statistics[_]): Option[(Any, Any)] = {
    def num(v: Any): Long = v match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
    }
    tag match {
      case "boolean" =>
        Some((st.genericGetMin.asInstanceOf[java.lang.Boolean].booleanValue,
          st.genericGetMax.asInstanceOf[java.lang.Boolean].booleanValue))
      case "long" | "days" => Some((num(st.genericGetMin), num(st.genericGetMax)))
      case "micros" => Some((num(st.genericGetMin), num(st.genericGetMax)))
      case "millis->micros" =>
        Some((num(st.genericGetMin) * 1000L, num(st.genericGetMax) * 1000L))
      case "nanos->micros" =>
        // floor both ends: micros(min) <= any value, micros(max) >= floor of any
        Some((Math.floorDiv(num(st.genericGetMin), 1000L),
          Math.floorDiv(num(st.genericGetMax), 1000L)))
      case "double" =>
        val lo = st.genericGetMin match {
          case f: java.lang.Float => f.doubleValue
          case d: java.lang.Double => d.doubleValue
        }
        val hi = st.genericGetMax match {
          case f: java.lang.Float => f.doubleValue
          case d: java.lang.Double => d.doubleValue
        }
        if (lo.isNaN || hi.isNaN) None else Some((lo, hi))
      case "string" =>
        Some((st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
          .toStringUsingUTF8,
          st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
            .toStringUsingUTF8))
      case _ => None
    }
  }

  /** Total order within one stored domain ("millis->micros" etc. collapse to
    * "micros" at absorb time, so only the four base domains appear here).
    */
  private def lt(tag: String, a: Any, b: Any): Boolean = cmpIn(tag, a, b) < 0

  /** Unsigned-byte comparison — the order parquet computes UTF8 string
    * min/max in. Java's String.compareTo (UTF-16 code units) DISAGREES with
    * it whenever supplementary characters (surrogate pairs, e.g. emoji) mix
    * with chars in U+E000..U+FFFF, and a wrong order here turns conservative
    * pruning into silent row loss — so every string comparison in this
    * module goes through UTF-8 bytes.
    */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return Integer.signum(d)
      i += 1
    }
    Integer.signum(a.length - b.length)
  }

  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // ---- may-match against pushed V1 filters --------------------------------

  /** Can any row of a dir with these stats satisfy ALL of `filters`?
    * Missing stats, unknown columns, and unhandled filter shapes answer
    * "yes" — pruning must never be load-bearing for correctness.
    */
  def mayMatch(stats: Option[DirStats], filters: Seq[Filter]): Boolean =
    stats match {
      case None => true
      case Some(s) => filters.forall(f => mayMatchOne(s, f))
    }

  private def mayMatchOne(s: DirStats, f: Filter): Boolean = f match {
    case And(l, r) => mayMatchOne(s, l) && mayMatchOne(s, r)
    case Or(l, r) => mayMatchOne(s, l) || mayMatchOne(s, r)
    case AlwaysTrue() => true
    case AlwaysFalse() => false
    case EqualTo(a, v) => cmp(s, a, v).forall(_.contains0)
    case EqualNullSafe(a, null) => s.cols.get(a).forall(_.nulls > 0)
    case EqualNullSafe(a, v) => cmp(s, a, v).forall(_.contains0)
    case GreaterThan(a, v) => cmp(s, a, v).forall(_.maxAbove0)
    case GreaterThanOrEqual(a, v) => cmp(s, a, v).forall(_.maxAtOrAbove0)
    case LessThan(a, v) => cmp(s, a, v).forall(_.minBelow0)
    case LessThanOrEqual(a, v) => cmp(s, a, v).forall(_.minAtOrBelow0)
    case In(a, vs) =>
      // null elements never equal anything; an all-null (or empty) IN list
      // matches no row at all
      val nonNull = vs.filter(_ != null)
      nonNull.nonEmpty && nonNull.exists(v => cmp(s, a, v).forall(_.contains0))
    case IsNull(a) => s.cols.get(a).forall(_.nulls > 0)
    case IsNotNull(a) => s.cols.get(a).forall(c => c.nulls < s.rows)
    case StringStartsWith(a, p) => s.cols.get(a) match {
      case Some(c) if c.typ == "string" =>
        // strings with UTF-8 byte-prefix p occupy [p, incrBytes(p)) in the
        // byte order the stats are kept in; all-0xFF prefix has no upper bound
        val pb = utf8(p)
        val min = utf8(c.min.asInstanceOf[String])
        val max = utf8(c.max.asInstanceOf[String])
        cmpBytes(max, pb) >= 0 && (incrBytes(pb) match {
          case Some(hi) => cmpBytes(min, hi) < 0
          case None => true
        })
      case _ => true
    }
    case _ => true   // Not, Contains, EndsWith, unknown: conservative
  }

  /** Does EVERY row of the dir provably satisfy all of `filters`? The dual
    * of [[mayMatch]], used for metadata-only operations (a DELETE that
    * drops whole dirs from the manifest without reading them), so the
    * conservative direction flips: anything unprovable answers "no" and
    * the caller falls back to the copy-on-write path. A committed-empty
    * dir satisfies anything vacuously.
    */
  def mustMatchAll(stats: Option[DirStats], filters: Seq[Filter]): Boolean =
    stats.exists(s => s.rows == 0 || filters.forall(f => mustMatchOne(s, f)))

  private def mustMatchOne(s: DirStats, f: Filter): Boolean = f match {
    case And(l, r) => mustMatchOne(s, l) && mustMatchOne(s, r)
    // all rows satisfying l OR all satisfying r is sufficient (not necessary)
    case Or(l, r) => mustMatchOne(s, l) || mustMatchOne(s, r)
    case AlwaysTrue() => true
    case EqualTo(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c =>
      !c.empty && c.minC == 0 && c.maxC == 0)
    // null-safe equality (what a static PARTITION (col = v) spec compiles
    // to): provable exactly like EqualTo for a non-null constant, and like
    // IsNull for the null literal
    case EqualNullSafe(a, null) => s.cols.get(a).exists(_.nulls == s.rows)
    case EqualNullSafe(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c =>
      !c.empty && c.minC == 0 && c.maxC == 0)
    case GreaterThan(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c => !c.empty && c.minC > 0)
    case GreaterThanOrEqual(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c => !c.empty && c.minC >= 0)
    case LessThan(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c => !c.empty && c.maxC < 0)
    case LessThanOrEqual(a, v) => noNulls(s, a) && cmp(s, a, v).exists(c => !c.empty && c.maxC <= 0)
    case In(a, vs) =>
      // provable only when the column is constant and that constant is listed
      noNulls(s, a) && vs.filter(_ != null).exists(v =>
        cmp(s, a, v).exists(c => !c.empty && c.minC == 0 && c.maxC == 0))
    case IsNull(a) => s.cols.get(a).exists(_.nulls == s.rows)
    case IsNotNull(a) => noNulls(s, a)
    case _ => false   // Not, string prefix ops, unknown shapes: unprovable
  }

  private def noNulls(s: DirStats, attr: String): Boolean =
    s.cols.get(attr).exists(c => c.typ != "null" && c.nulls == 0)

  private def incrBytes(p: Array[Byte]): Option[Array[Byte]] = {
    var end = p.length
    while (end > 0 && p(end - 1) == -1) end -= 1   // drop trailing 0xFF
    if (end == 0) None
    else {
      val out = java.util.Arrays.copyOf(p, end)
      out(end - 1) = (out(end - 1) + 1).toByte
      Some(out)
    }
  }

  /** Relation of the column's [min, max] to predicate value `v`, as the
    * signs of compare(min, v) and compare(max, v); None = not comparable
    * (no stats, domain mismatch) = never prunes. An all-null column ("null"
    * domain) has no value in any range, so every comparison is vacuously
    * prunable — modeled as an empty range below everything.
    */
  private final case class Rel(minC: Int, maxC: Int, empty: Boolean) {
    def contains0: Boolean = !empty && minC <= 0 && maxC >= 0
    def maxAbove0: Boolean = !empty && maxC > 0
    def maxAtOrAbove0: Boolean = !empty && maxC >= 0
    def minBelow0: Boolean = !empty && minC < 0
    def minAtOrBelow0: Boolean = !empty && minC <= 0
  }

  private def cmp(s: DirStats, attr: String, v: Any): Option[Rel] =
    s.cols.get(attr).flatMap { c =>
      if (c.typ == "null") Some(Rel(0, 0, empty = true))
      else toDomain(c.typ, v).map { dv =>
        Rel(cmpIn(c.typ, c.min, dv), cmpIn(c.typ, c.max, dv), empty = false)
      }
    }

  private[connector] def cmpIn(tag: String, a: Any, b: Any): Int = tag match {
    case "boolean" => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case "string" => cmpBytes(utf8(a.asInstanceOf[String]), utf8(b.asInstanceOf[String]))
    case "double" => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _ => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
  }

  /** Predicate value -> stored domain; None = incompatible, never prunes. */
  private def toDomain(tag: String, v: Any): Option[Any] = (tag, v) match {
    case (_, null) => None
    case ("boolean", b: java.lang.Boolean) => Some(b.booleanValue)
    case ("string", s: String) => Some(s)
    case ("long", n: java.lang.Number) => v match {
      case _: java.lang.Double | _: java.lang.Float =>
        val d = n.doubleValue
        if (d == Math.rint(d) && math.abs(d) < 9.007199254740992e15)
          Some(d.toLong)
        else None
      case _ => Some(n.longValue)
    }
    case ("double", n: java.lang.Number) => Some(n.doubleValue)
    case ("days", d: java.sql.Date) => Some(d.toLocalDate.toEpochDay)
    case ("days", d: java.time.LocalDate) => Some(d.toEpochDay)
    case ("micros", t: java.sql.Timestamp) =>
      // getTime already folds in the whole-millis part of nanos; strip it
      // before re-adding the full micros-precision fraction
      Some((t.getTime - t.getNanos / 1000000L) * 1000L + t.getNanos / 1000L)
    case ("micros", i: java.time.Instant) =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case _ => None
  }

  // ---- JSON codec (Jackson, already on the Spark classpath) ---------------

  /** One shared mapper for the per-manifest-line JSON: ObjectMapper is
    * thread-safe once constructed, and a fresh instance per entry was the
    * dominant cost of parsing a wide manifest (32k entries paid ~0.5 s of
    * mapper construction per cold table load — ManifestScaleProbe).
    */
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  def encode(s: DirStats): String = {
    val root = om.createObjectNode()
    root.put("rows", s.rows)
    val cols = root.putObject("cols")
    s.cols.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val o = cols.putObject(name)
      o.put("t", c.typ)
      o.put("nulls", c.nulls)
      if (c.typ != "null") {
        c.typ match {
          case "boolean" =>
            o.put("min", c.min.asInstanceOf[Boolean])
            o.put("max", c.max.asInstanceOf[Boolean])
          case "string" =>
            o.put("min", c.min.asInstanceOf[String])
            o.put("max", c.max.asInstanceOf[String])
          case "double" =>
            o.put("min", c.min.asInstanceOf[Double])
            o.put("max", c.max.asInstanceOf[Double])
          case _ =>
            o.put("min", c.min.asInstanceOf[Long])
            o.put("max", c.max.asInstanceOf[Long])
        }
      }
    }
    om.writeValueAsString(root)
  }

  def decode(json: String): Option[DirStats] =
    try {
      val root = om.readTree(json)
      val cols = scala.collection.mutable.LinkedHashMap[String, ColStats]()
      val co = root.get("cols")
      if (co != null) co.fields().forEachRemaining { e =>
        val o = e.getValue
        val t = o.get("t").asText()
        val nulls = o.get("nulls").asLong()
        if (t == "null") cols(e.getKey) = ColStats(t, null, null, nulls)
        else {
          val (mn, mx) = t match {
            case "boolean" => (o.get("min").asBoolean(): Any, o.get("max").asBoolean(): Any)
            case "string" => (o.get("min").asText(): Any, o.get("max").asText(): Any)
            case "double" => (o.get("min").asDouble(): Any, o.get("max").asDouble(): Any)
            case _ => (o.get("min").asLong(): Any, o.get("max").asLong(): Any)
          }
          cols(e.getKey) = ColStats(t, mn, mx, nulls)
        }
      }
      Some(DirStats(root.get("rows").asLong(), cols.toMap))
    } catch {
      case _: Exception => None   // unreadable stats = statless dir
    }
}
