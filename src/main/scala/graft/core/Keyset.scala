package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyset (cursor) pagination — the reference's pagination scheme for every
  * feed: no OFFSET, instead an anchor value from the last row of the previous
  * page, `col <= anchor` filter, re-sort, skip rows up to and including the
  * anchor row, take limit (reference: `server/app.py:570-584`, anchor-skip scan
  * `server/app.py:391-398`; score variant `engine/post_storage.py:376-401`).
  *
  * This is the scalable pagination: the filter pushes to the scan (partition /
  * row-group pruning on the sort column) and the top-k is a
  * `TakeOrderedAndProject` — no global sort, no offset scan.
  */
object Keyset {

  /** One page ordered by `sortCol` DESC with unique tie-break `tieCol` ASC.
    *
    * `anchor`: value of (sortCol, tieCol) for the last row already delivered;
    * None = first page. Anchor-inclusive filter + strict skip reproduces the
    * reference's "scan past the anchor row" semantics while staying set-based.
    */
  def pageDesc(df: DataFrame, sortCol: Column, tieCol: Column,
               anchor: Option[(Column, Column)], limit: Int): DataFrame = {
    val filtered = anchor match {
      case Some((av, at)) =>
        // strictly after the anchor row in (sortCol DESC, tieCol ASC) order
        df.filter(sortCol < av || (sortCol === av && tieCol > at))
      case None => df
    }
    filtered.orderBy(sortCol.desc, tieCol.asc).limit(limit)
  }

  /** OFFSET emulation with a cap, as the reference's history endpoints do
    * client-side (`engine/account_history_storage.py:76-121`): fetch
    * limit+offset ordered rows, drop the first offset. Top-k bounded by cap.
    */
  def offsetPage(df: DataFrame, order: Seq[Column], limit: Int, offset: Int,
                 cap: Int = 1000): DataFrame = {
    // native OFFSET: plans as GlobalLimit over the top-k — no global window
    val effective = math.max(0, math.min(limit, cap - offset))
    df.orderBy(order: _*).offset(offset).limit(effective)
  }
}
