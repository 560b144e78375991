package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: as-of (latest-state-at-time)
  * and bounded range (events-within-window). Both are expressed as
  * single-shuffle equi-join plans — never a per-row range probe or a
  * broadcast-nested-loop — so they keep working when each side is billions
  * of rows.
  *
  * The reference resolves "state as of an event" by point lookups against
  * mutable tables during replay (e.g. the vote fold reads the post row the
  * event touches, engine_comments_contract_processor.py:96-115); in a
  * columnar replay the same semantics is an as-of join of the event stream
  * against the state-change log.
  */
object TemporalJoin {

  /** For each left row, attach the single latest right row whose time is
    * <= the left row's time, matching per `keyCols` (DuckDB/kdb "ASOF
    * JOIN"; inclusive). Left rows with no prior right row keep nulls.
    *
    * Shape: union both sides tagged, ONE shuffle on the key, then a
    * running last-non-null window carry — O(n log n) per key partition,
    * no range join, no per-left-row probe. The right side must be unique
    * per (key, time): equal-time duplicates have no deterministic "latest"
    * (pre-aggregate to enforce it — the query layer does).
    *
    * `payloadCols` are the right-side columns carried onto left rows.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftCols = left.columns.filterNot(keyCols.contains)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).as("__t"), lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(payloadType).as("__p")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"), lit(0).as("__side"),
        lit(null).cast(l.schema("__l").dataType).as("__l"),
        payloadStruct.as("__p")): _*)
    // right sorts before left at equal time (__side 0 < 1) → inclusive <=
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keyCols.map(col) ++
          leftCols.map(c => col(s"__l.$c").as(c)) ++
          payloadCols.map(c => col(s"__carry.$c").as(c)): _*)
  }

  /** Pairs (left, right) where right's time falls in
    * [left time, left time + windowMicros), matching per `keyCols`.
    *
    * Scale shape: both sides bucket by floor(time / window); a left row's
    * window spans at most two buckets, so the left side explodes into 2
    * probe rows and the join is a plain equi-join on (keys, bucket) with
    * an exact residual filter — per-key skew aside, work is linear in
    * matches, never |left|×|right| per key the way a raw
    * `ON l.ts <= r.ts AND r.ts < l.ts + w` theta-join plans (Spark turns
    * that into broadcast-nested-loop or a cartesian per key).
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                        leftTimeCol: String, rightTimeCol: String,
                        windowMicros: Long): DataFrame = {
    val lb = left
      .withColumn("__lt", unix_micros(col(leftTimeCol)))
      .withColumn("__bucket",
        explode(array(floor(col("__lt") / windowMicros),
          floor(col("__lt") / windowMicros) + 1)))
    val rb = right
      .withColumn("__rt", unix_micros(col(rightTimeCol)))
      .withColumn("__bucket", floor(col("__rt") / windowMicros))
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col("__rt") >= col("__lt") &&
        col("__rt") < col("__lt") + windowMicros)
      .drop("__lt", "__rt", "__bucket")
  }
}
