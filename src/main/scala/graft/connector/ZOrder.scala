package graft.connector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for compaction output — Delta's
  * `OPTIMIZE ... ZORDER BY` contract, built from plain Catalyst
  * expressions: each z column is coded into an 8-bit cell index over its
  * observed [min, max] range, the per-column codes are bit-interleaved
  * through a 256-entry bit-spread lookup literal (codegen-friendly
  * `element_at`, no UDF), and rows are RANGE-partitioned then sorted by
  * the interleaved value. Every output dir therefore covers a small tile
  * of the multi-column space, so the committed per-dir [[DirStats]] —
  * and the parquet row-group stats inside each dir — become selective
  * for point/range predicates on ANY of the z columns, where a linear
  * `clusterBy` only serves its leading column.
  *
  * Costs and caveats, stated rather than hidden: unlike plain
  * compaction's narrow `coalesce`, z-ordering SHUFFLES the rewritten
  * rows once (range partition — the price Delta's OPTIMIZE ZORDER pays
  * too), and the 8-bit cells are UNIFORM over [min, max], so a heavily
  * skewed column wastes cell resolution (Delta's range-id variant
  * resists skew better; uniform cells keep the whole layout
  * expression-only). NULLs code to cell 0 and sort first.
  */
private[connector] object ZOrder {

  /** Write-partition column each range partition is tagged with, so the
    * compaction write splits tiles into subdirs without a second shuffle
    * (each task holds exactly one tile id).
    */
  val TileCol = "__graft_ztile"

  /** The interleaved z-value column the layout sorts on (internal). */
  val ZCol = "__graft_z"

  private val Bits = 8
  private val Cells = 1 << Bits   // 256 cells per column

  /** `spread(b)` = the 8 bits of `b` spaced `step` apart (step = number of
    * z columns), as a literal lookup table — `element_at` is 1-indexed.
    */
  private def spreadTable(step: Int): Array[Long] =
    Array.tabulate(Cells) { b =>
      var v = 0L
      var i = 0
      while (i < Bits) { v |= ((b >> i) & 1L) << (i * step); i += 1 }
      v
    }

  /** The interleaved z-value column for `cols`, given each column's
    * observed numeric [min, max] (cast through DOUBLE — ordering, not
    * exactness, is what a layout needs).
    */
  private def zvalue(cols: Seq[String], mins: Seq[Double], maxs: Seq[Double]): Column = {
    val step = cols.size
    val lookup = typedLit(spreadTable(step).toSeq)
    cols.zipWithIndex.map { case (c, i) =>
      val lo = mins(i)
      val hi = maxs(i)
      val cell =
        if (hi <= lo) lit(0L)   // constant or unobserved column: one cell
        else least(lit(Cells - 1L), greatest(lit(0L),
          floor((col(c).cast("double") - lit(lo)) / lit((hi - lo) / Cells))))
      // NULL -> cell 0 (sorts first), then spread and shift into lane i
      shiftleft(element_at(lookup, coalesce(cell, lit(0L)).cast("int") + 1), i)
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Lay `df` out z-ordered by `cols` into ~`nOut` range-partitioned,
    * internally sorted output partitions (one parquet file each under the
    * compaction write).
    */
  /** `bounds` may carry stats-derived [min, max] per column (wider than
    * observed costs only cell resolution, never correctness); columns not
    * covered are measured with one aggregation pass over `df`.
    */
  def layout(spark: SparkSession, df: DataFrame, cols: Seq[String], nOut: Int,
             bounds: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    require(cols.nonEmpty && cols.size <= 7,
      s"zorderBy takes 1..7 columns, got ${cols.size}")
    cols.foreach { c =>
      val f = df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"zorderBy column $c not in ${df.schema.fieldNames.mkString(",")}"))
      f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => ()
        case org.apache.spark.sql.types.BooleanType | org.apache.spark.sql.types.DateType => ()
        case org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.TimestampNTZType => ()
        case dt => throw new IllegalArgumentException(
          s"zorderBy column $c has unsupported type $dt: numeric/date/" +
            "timestamp/boolean only (a string column would need range-id " +
            "coding; under ANSI mode the cast would abort mid-job)")
      }
    }
    Seq(ZCol, TileCol).foreach(r => require(!df.columns.exists(_.equalsIgnoreCase(r)),
      s"table column $r collides with the z-order layout's internal column"))
    val missing = cols.filterNot(bounds.contains)
    val measured: Map[String, (Double, Double)] =
      if (missing.isEmpty) Map.empty
      else {
        // one pass for the observed ranges (driver-side: 2 doubles/column)
        val aggs = missing.flatMap(c =>
          Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        missing.zipWithIndex.map { case (c, i) =>
          c -> (Option(row.get(2 * i)).map(_.toString.toDouble).getOrElse(0.0),
            Option(row.get(2 * i + 1)).map(_.toString.toDouble).getOrElse(0.0))
        }.toMap
      }
    val all = bounds ++ measured
    val mins = cols.map(all(_)._1)
    val maxs = cols.map(all(_)._2)
    val zCol = ZCol
    // the (TileCol, zCol) sort prefix-satisfies the parquet writer's
    // required partitionBy ordering, so no writer-inserted sort (which
    // breaks ties arbitrarily across spill runs) can scramble the z order
    // inside a tile
    df.withColumn(zCol, zvalue(cols, mins, maxs))
      .repartitionByRange(math.max(1, nOut), col(zCol))
      .withColumn(TileCol, spark_partition_id())
      .sortWithinPartitions(col(TileCol), col(zCol))
      .drop(zCol)
  }
}
