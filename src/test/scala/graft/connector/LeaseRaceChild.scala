package graft.connector

/** Child-process half of [[LeaseLockTwoJvmSpec]]: the same read-CAS-retry
  * append loop as [[CasRaceChild]], but over the `cdrename` copy+delete
  * scheme — so every publish runs under the DEFAULT in-tree
  * [[LeaseFileCommitLock]], and cross-PROCESS mutual exclusion has to come
  * from the lease file alone (the in-process stripe monitor covers only
  * this JVM's threads). An optional 4th arg widens the publish window via
  * the shim's manifest-rename delay.
  */
object LeaseRaceChild {
  def main(args: Array[String]): Unit = {
    val tableDir = args(0)
    val writerId = args(1)
    val n = args(2).toInt
    if (args.length > 3) CopyDeleteRenameFileSystem.manifestRenameDelayMs = args(3).toLong
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.cdrename.impl", classOf[CopyDeleteRenameFileSystem].getName)
    val log = new TableLog(tableDir, conf)
    var committed = 0
    var attempts = 0
    while (committed < n) {
      attempts += 1
      require(attempts < n * 1000, s"CAS starvation in $writerId")
      val expected = log.latestVersion
      val entries = log.currentEntries() :+
        DirEntry(s"$tableDir/data/$writerId-$committed", None)
      if (log.tryCommitEntries(expected, entries)) committed += 1
    }
    println(s"committed=$committed attempts=$attempts")
  }
}
