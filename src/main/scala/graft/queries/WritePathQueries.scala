package graft.queries

/** Write-path replay operators (SURVEY.md §2.9 batch forms) — filled in M3. */
object WritePathQueries {
  val qs: Map[String, Q] = Map()
}
