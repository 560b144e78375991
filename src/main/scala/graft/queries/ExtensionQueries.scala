package graft.queries

/** LLM-data-pipeline extensions (dedup/similarity/text/multimodal) — filled in M6. */
object ExtensionQueries {
  val qs: Map[String, Q] = Map()
}
