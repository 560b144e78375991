package graft.connector


import org.apache.spark.sql.{Dataset, Row}

/** Self-referencing MERGE (the source plan reads the merge target) against
  * the runtime-group-filtering scan — the CatalogMergeStore shape.
  *
  * Spark 4.1's lazy analysis re-lazifies a relation that appears both as
  * the merge target and inside the source (DeduplicateRelations turns the
  * duplicate into a `V2TableReference`), and the copy of the source captured
  * in `ReplaceData.groupFilterCondition` is never re-resolved. The condition
  * is only ever PLANNED when the connector's scan advertises runtime filter
  * attributes, at which point physical planning dies with
  * "No plan for TableReference" — loudly, before any write.
  *
  * Two contracts pinned here:
  *  1. the engine's own pattern — source built from the snapshot's immutable
  *     parquet dirs instead of the catalog table — works with runtime group
  *     filtering active (this is why CatalogMergeStore.read goes
  *     parquet-direct);
  *  2. the lazy self-referencing form fails LOUDLY (internal error), never
  *     silently. If a Spark upgrade fixes the re-resolution, this test
  *     fails and the parquet-direct workaround can be dropped.
  */
class SelfRefMergeSpec extends LakeSpec {
  protected def catalogName = "srlake"

  private def mergeInBatch(table: String, selfRefViaCatalog: Boolean): Either[Throwable, Unit] = {
    sql(s"CREATE TABLE srlake.$table (k BIGINT, v STRING)")
    // two dirs: a single-dir snapshot would skip runtime group filtering
    // entirely (the <=1-kept optimization) and never plan the condition
    sql(s"INSERT INTO srlake.$table VALUES (1, 'a')")
    sql(s"INSERT INTO srlake.$table VALUES (2, 'b')")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tableLog = log(table)
    var failure: Option[Throwable] = None
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDS().toDF("k", "v").writeStream
      .outputMode("append")
      .option("checkpointLocation", tmp("selfref-ckpt"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val ss = b.sparkSession
        ss.conf.set("spark.sql.catalog.srlake", classOf[GraftCatalog].getName)
        ss.conf.set("spark.sql.catalog.srlake.root", root)
        val prior =
          if (selfRefViaCatalog) ss.table(s"srlake.$table")
          else ss.read.schema(tableLog.schema).parquet(tableLog.currentDirs(): _*)
        prior.union(b).groupBy("k")
          .agg(org.apache.spark.sql.functions.max("v").as("v"))
          .createOrReplaceTempView("selfref_src")
        try ss.sql(
          s"""MERGE INTO srlake.$table t USING selfref_src s ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET v = s.v
             |WHEN NOT MATCHED THEN INSERT *
             |""".stripMargin)
        catch { case e: Throwable => failure = Some(e); throw e }
        ()
      }
      .start()
    val out =
      try { mem.addData((2L, "x2"), (3L, "x3")); q.processAllAvailable(); Right(()) }
      catch { case e: Throwable => Left(failure.getOrElse(e)) }
    q.stop()
    out
  }

  test("snapshot-dir source: self-referencing upsert MERGE works under runtime group filtering") {
    assert(mergeInBatch("ok", selfRefViaCatalog = false).isRight)
    assert(sql("SELECT v FROM srlake.ok ORDER BY k").collect().map(_.getString(0)).toSeq ===
      Seq("a", "x2", "x3"))
  }

  test("catalog-table source: the Spark 4.1 lazy self-reference fails loudly, not silently") {
    mergeInBatch("boom", selfRefViaCatalog = true) match {
      case Right(_) =>
        fail("Spark now resolves V2TableReference inside groupFilterCondition — " +
          "the parquet-direct workaround in CatalogMergeStore.read can be dropped")
      case Left(e) =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => String.valueOf(t.getMessage)).mkString(" | ")
        assert(msgs.contains("TableReference") || msgs.contains("INTERNAL_ERROR"),
          s"expected the pinned loud failure, got: $msgs")
        // and nothing was corrupted: the table still holds its original rows
        assert(sql("SELECT v FROM srlake.boom ORDER BY k").collect()
          .map(_.getString(0)).toSeq === Seq("a", "b"))
    }
  }
}
