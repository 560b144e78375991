package graft.queries

import graft.SparkSpec

/** Every registered query must at least ANALYZE against the CURRENT testdata
  * fixtures — `df.schema` forces analysis without triggering execution for
  * lazy plans. Round-6 lesson: the driver regenerated events.parquet with a
  * different physical type and 21 queries started throwing DATATYPE_MISMATCH
  * at analysis, visible only as silent absences in the driver's correctness
  * report. This spec makes any fixture-format drift fail in seconds, named
  * per query.
  *
  * Note a handful of query builders are eager by construction (scalar-anchor
  * collects, k-means refinement loops, checkpointed pipelines); at sf0.001
  * that cost is negligible and the analysis guarantee is what matters.
  */
class RegistryAnalysisSpec extends SparkSpec {
  Registry.all.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"analyzes: $name") {
      val schema = q.fn(spark, sf()).schema
      assert(schema.nonEmpty, s"$name produced an empty schema")
    }
  }
}
