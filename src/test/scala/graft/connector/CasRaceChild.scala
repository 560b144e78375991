package graft.connector

/** Child-process half of [[CasRaceTwoJvmSpec]]: appends `n` uniquely-named
  * entries to the shared table through the normal read-CAS-retry loop, one
  * entry per successful commit, from a SEPARATE JVM (plain Hadoop local FS
  * — TableLog needs no SparkSession, so the child starts in well under a
  * second). Prints `committed=<n>` and exits 0 on success; any silent lost
  * commit shows up in the parent's manifest assertions instead.
  */
object CasRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(tableDir, writerId, nStr) = args
    val n = nStr.toInt   // n < 0: commit forever (KillMidCommitSpec SIGKILLs us)
    val log = new TableLog(tableDir, new org.apache.hadoop.conf.Configuration())
    var committed = 0
    var attempts = 0
    while (n < 0 || committed < n) {
      attempts += 1
      require(n < 0 || attempts < n * 1000, s"CAS starvation in $writerId")
      val expected = log.latestVersion
      val entries = log.currentEntries() :+
        DirEntry(s"$tableDir/data/$writerId-$committed", None)
      if (log.tryCommitEntries(expected, entries)) committed += 1
    }
    println(s"committed=$committed attempts=$attempts")
  }
}
