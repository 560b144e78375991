package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — trailing names (dev-only)
    // restrict the run to a subset; the driver always passes exactly two
    // args, so its full-registry manifest contract is unchanged.
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
        "a typo here would otherwise produce an empty run that exits 0")
    // local[4] is the measured-optimal thread count for this suite's data
    // sizes (see Bench.scala thread-count sweep note); results are
    // partition-count invariant — the full 128-query oracle sweep was
    // re-verified green at local[32] before keeping 4 (2026-08-14)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = e.getClass.getSimpleName
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape shared with Bench's record (graft.Jsons): a tab
    // or CR in builder-authored SQL would otherwise make the driver's
    // json.load fail and silently zero the round's correctness.
    def q(s: String): String = Jsons.quote(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full registry manifest + per-query failures, so tools/oracle_check.py
    // can detect survivorship: a correctness report that silently omits a
    // registered query (round-6: 21 of them) must be flagged, not trusted.
    // ALWAYS the full registry — a dev subset run must not shrink the
    // manifest to its own subset, or the survivorship guard would certify
    // exactly the omissions it exists to catch. Subset runs additionally
    // write a subset_run.json marker so oracle_check refuses to certify
    // them (it restricts its reconcile to the subset and exits nonzero).
    Files.writeString(Paths.get(s"$outDir/registry_keys.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    if (only.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/subset_run.json"),
        only.toSeq.sorted.map(q).mkString("[", ",", "]"))
    else // a reused dev outDir must not carry a stale marker into a full run
      Files.deleteIfExists(Paths.get(s"$outDir/subset_run.json"))
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} queries FAILED: ${failed.keys.mkString(", ")}")
    spark.stop()
  }
}
