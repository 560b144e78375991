package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The foreachBatch merge sink maintains a current-state table with
  * latest-wins semantics across micro-batches, and re-merging a batch is a
  * no-op (idempotence under replay). The fold semantics must hold under
  * EVERY storage backend; the layout-specific properties (bounded in-place
  * rewrite, swap crash recovery, snapshot isolation, vacuum) are tested
  * per store.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.KeyedEvent

  private val backends = Seq[(String, UpsertSink.Backend)](
    "bucket-swap" -> UpsertSink.BucketSwap,
    "snapshot" -> UpsertSink.Snapshot,
    "catalog-merge" -> UpsertSink.CatalogMerge,
    "catalog-mor" -> UpsertSink.CatalogMergeMor)

  for ((bname, backend) <- backends) {

    test(s"[$bname] streamed upserts fold into the state table; replay is idempotent") {
      implicit val sq = spark.sqlContext
      val dir = Files.createTempDirectory(s"graft-sink-$bname").toString
      val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op", backend = backend)
      val mem = MemoryStream[KeyedEvent]
      val q = sink.attach(mem.toDS()).outputMode("append").start()

      mem.addData(KeyedEvent("a", 1, "upsert", "v1"),
                  KeyedEvent("b", 2, "upsert", "w1"))
      q.processAllAvailable()
      mem.addData(KeyedEvent("a", 3, "upsert", "v2"),
                  KeyedEvent("b", 4, "delete", null),
                  KeyedEvent("c", 5, "upsert", "x1"))
      q.processAllAvailable()
      q.stop()

      val state = sink.state().orderBy("key").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
      assert(state == List(("a", "v2"), ("c", "x1")))

      // replay the second batch manually — merging the same rows again must
      // leave the state unchanged
      sink.merge(Seq(
        ("a", 3L, "upsert", "v2"), ("b", 4L, "delete", null), ("c", 5L, "upsert", "x1"))
        .toDF("key", "seq", "op", "payload"), batchId = 99L)
      val replayed = sink.state().orderBy("key").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
      assert(replayed == state)
    }

    test(s"[$bname] late cross-batch events: older upserts neither regress state nor resurrect deletes") {
      val dir = Files.createTempDirectory(s"graft-sink-late-$bname").toString
      val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op", backend = backend)
      sink.merge(Seq(
        ("a", 2L, "upsert", "new"), ("b", 5L, "delete", null))
        .toDF("key", "seq", "op", "payload"), batchId = 0L)
      // batch 2 delivers LATE events: a@seq1 (older than a's seq 2) and
      // b@seq3 (older than b's delete at seq 5)
      sink.merge(Seq(
        ("a", 1L, "upsert", "old"), ("b", 3L, "upsert", "zombie"))
        .toDF("key", "seq", "op", "payload"), batchId = 1L)
      val state = sink.state().orderBy("key").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
      // full-log compaction of the same four events gives exactly this
      assert(state == List(("a", "new")))
      // a late upsert NEWER than the delete revives the key (delete resets)
      sink.merge(Seq(("b", 7L, "upsert", "reborn"))
        .toDF("key", "seq", "op", "payload"), batchId = 2L)
      val revived = sink.state().orderBy("key").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
      assert(revived == List(("a", "new"), ("b", "reborn")))
    }
  }

  test("bounded rewrite: a merge leaves untouched key buckets byte-identical") {
    val dir = Files.createTempDirectory("graft-sink-bounded").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op", numBuckets = 8)
    // seed state with keys spread across many buckets
    sink.merge((1 to 64).map(i => (s"k$i", i.toLong, "upsert", s"v$i"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)

    def snapshot(): Map[String, String] = {
      val cur = new java.io.File(s"$dir/current")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(cur).filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        f.getAbsolutePath -> md5.map("%02x".format(_)).mkString
      }.toMap
    }

    val before = snapshot()
    assert(before.nonEmpty)
    // single-key merge: only that key's bucket may change
    sink.merge(Seq(("k1", 100L, "upsert", "v1b"))
      .toDF("key", "seq", "op", "payload"), batchId = 1L)
    val after = snapshot()

    val changedDirs = (before.keySet ++ after.keySet)
      .filter(p => before.get(p) != after.get(p))
      .map(p => new java.io.File(p).getParentFile.getName)
    assert(changedDirs.size == 1, s"expected exactly one rewritten bucket, got $changedDirs")
    // every file outside the touched bucket is byte-identical (same path, same md5)
    val untouched = before.filter { case (p, _) =>
      new java.io.File(p).getParentFile.getName != changedDirs.head }
    assert(untouched.forall { case (p, h) => after.get(p).contains(h) })
    // and the merge itself is correct
    val got = sink.state().filter(col("key") === "k1").collect()
      .map(_.getAs[String]("payload")).toList
    assert(got == List("v1b"))
  }

  test("crash between moving a bucket aside and installing the staged copy is recovered") {
    val dir = Files.createTempDirectory("graft-sink-crash").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op", numBuckets = 4)
    sink.merge((1 to 16).map(i => (s"k$i", i.toLong, "upsert", s"v$i"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    val before = sink.state().collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toMap

    // simulate the worst-case crash point: the current bucket dir was moved
    // aside to old-<batch>-<k> but the staged replacement never landed
    val cur = new java.io.File(s"$dir/current")
    val part = Option(cur.listFiles()).toSeq.flatten
      .find(_.getName.startsWith("__bucket=")).get
    val k = part.getName.stripPrefix("__bucket=")
    assert(part.renameTo(new java.io.File(s"$dir/old-7-$k")))

    // the next read (or merge) must heal the half-done swap: no key lost
    val recovered = sink.state().collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toMap
    assert(recovered == before, "keys lost across simulated crash")
    assert(!new java.io.File(s"$dir/old-7-$k").exists())

    // completed-install crash shape: old copy left behind AFTER the staged
    // dir was installed — recovery must keep the new data and drop the old
    val stale = new java.io.File(s"$dir/old-8-$k")
    stale.mkdirs()
    val healed = sink.state().collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toMap
    assert(healed == before)
    assert(!stale.exists())
  }

  test("snapshot store: a concurrent reader keeps its pinned version across a merge") {
    val dir = Files.createTempDirectory("graft-sink-iso").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 4, backend = UpsertSink.Snapshot)
    sink.merge(Seq(("a", 1L, "upsert", "v1"), ("b", 2L, "upsert", "w1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    // the reader resolves the manifest pointer NOW — its file list is pinned
    // to this version's immutable data dirs
    val reader = sink.state()
    // a writer commits a new version underneath it
    sink.merge(Seq(("a", 3L, "upsert", "v2"), ("b", 4L, "delete", null))
      .toDF("key", "seq", "op", "payload"), batchId = 1L)
    // the pinned reader still sees its snapshot (old dirs are immutable and
    // retained until vacuum) — the property the in-place swap cannot give
    val pinned = reader.orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(pinned == List(("a", "v1"), ("b", "w1")))
    // while a fresh reader sees the new version
    val fresh = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(fresh == List(("a", "v2")))
  }

  test("snapshot store: crashed-attempt orphan data dir is ignored on replay and reclaimed by vacuum") {
    val dir = Files.createTempDirectory("graft-sink-orphan").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 1, backend = UpsertSink.Snapshot)
    sink.merge(Seq(("a", 1L, "upsert", "v1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    // a crashed attempt of batch 5 left its (attempt-suffixed) data dir
    // installed but never published a manifest — the replay writes under a
    // FRESH attempt name (never renames onto or deletes an existing path),
    // so the junk is simply unreferenced until vacuum reclaims it
    val orphan = new java.io.File(s"$dir/data/b0-5-deadbeef")
    orphan.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "junk.parquet").toPath, "not parquet")
    sink.merge(Seq(("a", 5L, "upsert", "v5"))
      .toDF("key", "seq", "op", "payload"), batchId = 5L)
    val state = sink.state().collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(state == List(("a", "v5")))
    new SnapshotStore(spark, dir).vacuum(keepVersions = 1)
    assert(!orphan.exists(), "unreferenced crashed-attempt dir survived vacuum")
    val after = sink.state().collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(after == state)
  }

  test("snapshot store: replaying an already-published batch never unlinks the published snapshot") {
    val dir = Files.createTempDirectory("graft-sink-replay-iso").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 1, backend = UpsertSink.Snapshot)
    sink.merge(Seq(("a", 1L, "upsert", "v1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    val b1 = Seq(("a", 2L, "upsert", "v2"), ("b", 3L, "upsert", "w1"))
      .toDF("key", "seq", "op", "payload")
    sink.merge(b1, batchId = 1L)
    // a reader pins the published version's file list now; the process then
    // dies BEFORE the streaming checkpoint records batch 1, so the batch
    // replays with the same id — its previous attempt's dirs are referenced
    // by the live manifest and must not be deleted out from under the reader
    val pinned = sink.state()
    sink.merge(b1, batchId = 1L)
    val seen = pinned.orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(seen == List(("a", "v2"), ("b", "w1")),
      "replay destroyed the snapshot a pinned reader was scanning")
    // and the replay itself is an idempotent no-op on fresh state
    val fresh = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(fresh == seen)
  }

  test("catalog-merge store: state is a queryable SQL table with version history") {
    val dir = Files.createTempDirectory("graft-sink-cat").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 2, backend = UpsertSink.CatalogMerge)
    sink.merge(Seq(("a", 1L, "upsert", "v1"), ("b", 2L, "upsert", "w1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    sink.merge(Seq(("b", 3L, "delete", null))
      .toDF("key", "seq", "op", "payload"), batchId = 1L)
    // the state table is plain SQL — any session sharing the conf can query
    // it, including the bookkeeping columns and time travel
    val cat = new CatalogMergeStore(spark, dir, Seq("key")).catalogName
    val live = spark.sql(s"SELECT key, payload FROM $cat.state WHERE NOT __deleted ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(live == List(("a", "v1")))
    // version 1 (the CREATE TABLE leaves no manifest; first merge = v1)
    val v1 = spark.sql(s"SELECT key FROM $cat.state VERSION AS OF 1 WHERE NOT __deleted ORDER BY key")
      .collect().map(_.getString(0)).toList
    assert(v1 == List("a", "b"))
    // the delete survives as a fencing tombstone with its seq
    val tomb = spark.sql(s"SELECT __seq FROM $cat.state WHERE key = 'b' AND __deleted")
      .collect().map(_.getLong(0)).toList
    assert(tomb == List(3L))
  }

  test("catalog-merge store: a concurrent reader keeps its pinned snapshot across a merge; vacuum reclaims") {
    val dir = Files.createTempDirectory("graft-sink-cat-iso").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 2, backend = UpsertSink.CatalogMerge)
    sink.merge(Seq(("a", 1L, "upsert", "v1"), ("b", 2L, "upsert", "w1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    val reader = sink.state()   // analysis pins the current manifest version
    sink.merge(Seq(("a", 3L, "upsert", "v2"), ("b", 4L, "delete", null))
      .toDF("key", "seq", "op", "payload"), batchId = 1L)
    val pinned = reader.orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(pinned == List(("a", "v1"), ("b", "w1")))
    val fresh = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(fresh == List(("a", "v2")))
    // vacuum drops the superseded snapshot, keeps the live one
    new CatalogMergeStore(spark, dir, Seq("key")).vacuum(keepVersions = 1)
    val after = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(after == fresh)
    val manifests = Option(new java.io.File(s"$dir/state").listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("manifest-")).map(_.getName)
    assert(manifests == Seq("manifest-2"))
  }

  test("catalog-merge store: compact folds per-batch dirs; state and late-event fencing intact") {
    val dir = Files.createTempDirectory("graft-sink-cat-compact").toString
    // 16 buckets so per-batch keys land in (mostly) disjoint buckets: the
    // MERGE's __bucket group gate then prunes the other batches' dirs out
    // of each rewrite and per-batch dirs ACCUMULATE bucket-clustered —
    // the layout compact() exists to maintain
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 16, backend = UpsertSink.CatalogMerge)
    (0 until 5).foreach { i =>
      sink.merge(Seq((s"k$i", 10L + i, "upsert", s"v$i"))
        .toDF("key", "seq", "op", "payload"), batchId = i.toLong)
    }
    val store = new CatalogMergeStore(spark, dir, Seq("key"))
    val log = new graft.connector.TableLog(s"$dir/state",
      spark.sparkContext.hadoopConfiguration)
    val dirsBefore = log.currentDirs().size
    assert(dirsBefore >= 2, s"bucket-pruned merges should accumulate dirs, got $dirsBefore")
    assert(store.compact())
    assert(log.currentDirs().size < dirsBefore)
    val live = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(live == List("k0" -> "v0", "k1" -> "v1",
      "k2" -> "v2", "k3" -> "v3", "k4" -> "v4"))
    // late-event fencing still works against the compacted layout: an older
    // seq for 'k0' must not regress state
    sink.merge(Seq(("k0", 20L, "upsert", "h0")).toDF("key", "seq", "op", "payload"),
      batchId = 5L)
    sink.merge(Seq(("k0", 19L, "upsert", "stale"), ("k9", 99L, "upsert", "v9"))
      .toDF("key", "seq", "op", "payload"), batchId = 6L)
    val after = sink.state().filter(col("key").isin("k0", "k9")).orderBy("key")
      .collect().map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(after == List("k0" -> "h0", "k9" -> "v9"))
  }

  test("catalog-mor store: batches append + vector instead of rewriting; compact purges") {
    val dir = Files.createTempDirectory("graft-sink-cat-mor").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 4, backend = UpsertSink.CatalogMergeMor)
    // batch 0 seeds keys; batches 1..3 overwrite the SAME keys, which under
    // copy-on-write would rewrite the touched dirs each time
    sink.merge(Seq(("a", 0L, "upsert", "a0"), ("b", 0L, "upsert", "b0"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    val log = new graft.connector.TableLog(s"$dir/state",
      spark.sparkContext.hadoopConfiguration)
    val seedDirs = log.currentDirs()
    // update only 'a' each batch: the seed dir keeps 'b' alive, so its
    // shadowed 'a' row must be VECTORED out, not collapse the whole dir
    (1 to 3).foreach { i =>
      sink.merge(Seq(("a", i.toLong, "upsert", s"a$i"))
        .toDF("key", "seq", "op", "payload"), batchId = i.toLong)
    }
    val entries = log.currentEntries()
    // merge-on-read: dirs only ever accumulate (appends + vectors); a
    // fully-shadowed dir may collapse, but nothing is rewritten in place
    assert(entries.exists(_.dv.isDefined),
      "the partially-shadowed seed dir must carry a deletion vector")
    assert(seedDirs.toSet.subsetOf(entries.map(_.dir).toSet),
      "mor merges must keep the partially-live seed dirs")
    val live = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(live == List("a" -> "a3", "b" -> "b0"))
    // maintenance: compact purges vectors and folds the per-batch dirs
    val store = new CatalogMergeStore(spark, dir, Seq("key"), mergeOnRead = true)
    assert(store.compact())
    assert(log.currentEntries().forall(_.dv.isEmpty))
    assert(sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList ==
      List("a" -> "a3", "b" -> "b0"))
    // fencing after purge: stale seq never regresses
    sink.merge(Seq(("a", 2L, "upsert", "stale")).toDF("key", "seq", "op", "payload"),
      batchId = 4L)
    assert(sink.state().filter(col("key") === "a").collect()
      .head.getAs[String]("payload") == "a3")
  }

  test("catalog-mor backend pointed at an existing cow state table aligns its mode") {
    val dir = Files.createTempDirectory("graft-sink-mode-flip").toString
    // seed the table through the copy-on-write backend
    val cow = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 4, backend = UpsertSink.CatalogMerge)
    cow.merge(Seq(("a", 1L, "upsert", "v1"), ("b", 1L, "upsert", "w1"))
      .toDF("key", "seq", "op", "payload"), batchId = 0L)
    val log = new graft.connector.TableLog(s"$dir/state",
      spark.sparkContext.hadoopConfiguration)
    assert(log.properties.get("graft.merge.mode").isEmpty)
    // switching the backend must flip the table property, not silently
    // keep rewriting (review finding: the property was CREATE-only)
    val mor = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 4, backend = UpsertSink.CatalogMergeMor)
    val seedDirs = log.currentDirs()
    mor.merge(Seq(("a", 2L, "upsert", "v2")).toDF("key", "seq", "op", "payload"),
      batchId = 1L)
    val fresh = new graft.connector.TableLog(s"$dir/state",
      spark.sparkContext.hadoopConfiguration)
    assert(fresh.properties.get("graft.merge.mode").contains("merge-on-read"))
    assert(seedDirs.toSet.subsetOf(fresh.currentEntries().map(_.dir).toSet),
      "the mor batch must keep the seed dirs (vector, not rewrite)")
    assert(mor.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList ==
      List("a" -> "v2", "b" -> "w1"))
  }

  test("snapshot store: vacuum drops superseded versions, keeps the live snapshot") {
    val dir = Files.createTempDirectory("graft-sink-vacuum").toString
    val sink = new UpsertSink(spark, dir, Seq("key"), "seq", "op",
      numBuckets = 2, backend = UpsertSink.Snapshot)
    for (i <- 0 to 2)
      sink.merge(Seq(("a", i.toLong, "upsert", s"v$i"), ("b", i.toLong, "upsert", s"w$i"))
        .toDF("key", "seq", "op", "payload"), batchId = i.toLong)
    new SnapshotStore(spark, dir).vacuum(keepVersions = 1)
    // only the live version's data dirs survive (b<k>-<batch>-<attempt>)
    val dataDirs = Option(new java.io.File(s"$dir/data").listFiles()).toSeq.flatten
    assert(dataDirs.nonEmpty && dataDirs.forall(_.getName.matches("b\\d+-2-[0-9a-f]{8}")),
      s"stale data dirs survived vacuum: ${dataDirs.map(_.getName).toList}")
    val manifests = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("manifest-")).map(_.getName)
    assert(manifests == Seq("manifest-3"))
    val state = sink.state().orderBy("key").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"))).toList
    assert(state == List(("a", "v2"), ("b", "w2")))
  }
}
