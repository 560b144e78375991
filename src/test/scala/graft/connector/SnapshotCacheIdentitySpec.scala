package graft.connector

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 advice regressions for the process-wide snapshot cache:
  *
  *  1. [[TableLog.dirKey]] must not collapse distinct non-local tables to
  *     one cache key — the old key stripped scheme and authority, so
  *     `s3a://bucketA/warehouse/t` and `s3a://bucketB/warehouse/t` (or
  *     `hdfs://nn/x/t` vs `file:/x/t`) shared an entry and `entriesAt`
  *     could silently return another table's dir list;
  *  2. a shared-cache hit must be validated against the on-disk manifest
  *     identity — in-process invalidation cannot reach other JVMs, so a
  *     drop+re-create (version numbers restart at 1) or a vacuum performed
  *     elsewhere would otherwise keep serving the dropped history's dirs
  *     from (path, version) alone.
  */
class SnapshotCacheIdentitySpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("k", LongType)))

  test("dirKey keeps scheme and authority for non-local tables") {
    val a = TableLog.dirKey("s3a://bucketA/warehouse/t")
    val b = TableLog.dirKey("s3a://bucketB/warehouse/t")
    assert(a !== b, "two buckets' same-named tables must not share a cache key")
    val h = TableLog.dirKey("hdfs://nn/x/t")
    val f = TableLog.dirKey("file:/x/t")
    assert(h !== f, "an hdfs table must not collide with a local path")
    assert(TableLog.dirKey("s3a://bucketA/warehouse/t/") === a,
      "trailing slash is still normalized away")
    assert(TableLog.dirKey("s3a://bucketA/warehouse//t") === a,
      "redundant separators are still normalized away")
  }

  test("dirKey still unifies local spellings of one directory") {
    val dir = Files.createTempDirectory("graft-dirkey").toString
    val bare = TableLog.dirKey(dir)
    assert(TableLog.dirKey(s"file:$dir") === bare)
    assert(TableLog.dirKey(s"$dir/") === bare)
  }

  test("a drop+re-create performed outside this process's hooks is detected") {
    val conf = new Configuration()
    val tableDir = Files.createTempDirectory("graft-ident").toString + "/t"

    val log1 = new TableLog(tableDir, conf)
    log1.create(schema, Map.empty)
    assert(log1.tryCommit(None, Seq(s"$tableDir/data/d-old-history")))
    // populate the process-wide cache for (dir, 1)
    assert(new TableLog(tableDir, conf).entriesAt(1L).map(e =>
      new Path(e.dir).getName) === Seq("d-old-history"))

    // simulate ANOTHER JVM dropping and re-creating the table: raw
    // filesystem delete, deliberately NOT TableLog.drop() (whose in-process
    // invalidateCache would mask the staleness under test)
    val fs = new Path(tableDir).getFileSystem(conf)
    assert(fs.delete(new Path(tableDir), true))
    Thread.sleep(5) // ensure a distinct manifest mtime even on coarse clocks
    val log2 = new TableLog(tableDir, conf)
    log2.create(schema, Map.empty)
    assert(log2.tryCommit(None, Seq(s"$tableDir/data/d-new")))

    // a FRESH handle (cold per-instance cache) must see the NEW history,
    // not the cached (path, version=1) state of the dropped table
    assert(new TableLog(tableDir, conf).entriesAt(1L).map(e =>
      new Path(e.dir).getName) === Seq("d-new"))
  }

  test("warm hits with an unchanged manifest still serve the cached state") {
    val conf = new Configuration()
    val tableDir = Files.createTempDirectory("graft-ident2").toString + "/t"
    val log = new TableLog(tableDir, conf)
    log.create(schema, Map.empty)
    assert(log.tryCommit(None, Seq(s"$tableDir/data/d-a")))
    val first = new TableLog(tableDir, conf).entriesAt(1L)
    val second = new TableLog(tableDir, conf).entriesAt(1L)
    assert(second === first)
  }
}
