package graft.connector

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** In-tree cross-writer commit lock for stores whose rename is not an
  * atomic non-overwriting publish — the role Delta Lake's
  * S3DynamoDBLogStore plays for S3 multi-writer, re-derived without the
  * DynamoDB dependency: the coordination state is a per-table lease FILE
  * (`_commitlock`) living next to the manifests on the same store.
  *
  * Acquisition, two layers:
  *
  *  1. IN-PROCESS: one striped monitor per normalized table dir — threads
  *     of one JVM serialize locally and never burn store round-trips
  *     contending with each other.
  *  2. CROSS-PROCESS: create the lease with overwrite=false, carrying a
  *     random fencing token; then read it back (twice, separated by a
  *     settle delay) and require the on-disk token to be OURS. On a store
  *     whose create-no-overwrite is atomic (HDFS, S3 conditional PUT, GCS
  *     preconditions, ABFS) the create alone decides and the read-backs
  *     are confirmation; on a last-write-wins store (where two creates can
  *     both "succeed", the second truncating the first) the read-back
  *     demotes a double-create to at most one perceived winner — each
  *     racer sees either its own token (proceed) or the other's (lost,
  *     retry). The residual window — a second writer's create landing
  *     after the first's final read-back — is bounded by the settle delay
  *     and closes entirely on any store with atomic conditional create.
  *
  * Liveness: a holder that dies leaves the lease in place; waiters treat a
  * lease older than `ttlMs` (store mtime, so one clock for all writers) as
  * abandoned, delete it, and re-race. `ttlMs` must exceed the longest
  * publish (a few small-file ops — seconds, not minutes); a GC pause
  * longer than the TTL can let a steal overlap the stalled holder, the
  * same documented envelope every TTL-based lock has. Release deletes the
  * lease only while it still carries this acquisition's token, so a
  * post-steal release never destroys the stealer's lease.
  *
  * Registered automatically by [[TableLog]] for schemes outside its
  * atomic-rename set, and usable explicitly via
  * `TableLog.setCommitLock(new LeaseFileCommitLock(conf))`.
  */
final class LeaseFileCommitLock(conf: Configuration,
                                ttlMs: Long = 60000L,
                                acquireTimeoutMs: Long = 120000L,
                                pollMs: Long = 25L,
                                settleMs: Long = 8L) extends TableLog.CommitLock {

  def withLock[T](tableDir: String)(body: => T): T = {
    val monitor = LeaseFileCommitLock.stripes
      .computeIfAbsent(TableLog.dirKey(tableDir), _ => new Object)
    monitor.synchronized {
      val token = acquire(tableDir)
      try body
      finally release(tableDir, token)
    }
  }

  private def leasePath(tableDir: String) = new Path(tableDir, "_commitlock")

  private def fs(tableDir: String) =
    new Path(tableDir).getFileSystem(conf)

  private def acquire(tableDir: String): String = {
    val f = fs(tableDir)
    val lease = leasePath(tableDir)
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    while (System.currentTimeMillis() < deadline) {
      val token = java.util.UUID.randomUUID().toString
      val created =
        try {
          val out = f.create(lease, false)
          try out.write(token.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      if (created) {
        // read-back confirmation (see class doc): the token on disk must
        // be ours at two instants a settle apart, or a last-write-wins
        // double-create happened and this racer lost
        var mine = true
        var i = 0
        while (mine && i < 2) {
          Thread.sleep(settleMs)
          mine = readToken(tableDir).contains(token)
          i += 1
        }
        if (mine) return token
      } else {
        // lease exists (or the store refused the conditional create):
        // abandoned-holder check via store mtime, one clock for everyone.
        // The steal re-stats IMMEDIATELY before deleting and only deletes
        // the exact lease it judged expired (same mtime): two waiters that
        // both observed the dead lease would otherwise race the delete,
        // and the slower one — delayed between its stat and its delete —
        // could destroy the faster one's FRESH lease, re-opening the
        // two-holders hole the lock exists to close. With the re-check,
        // deleting a live lease requires the delay to fit between two
        // adjacent calls (microseconds), the same envelope class as the
        // documented GC-pause-past-TTL caveat rather than a plain
        // scheduling hiccup.
        try {
          val st = f.getFileStatus(lease)
          if (System.currentTimeMillis() - st.getModificationTime > ttlMs) {
            val st2 = f.getFileStatus(lease)
            if (st2.getModificationTime == st.getModificationTime)
              f.delete(lease, false)   // expired: reclaim and re-race
          }
        } catch { case _: java.io.FileNotFoundException => () }  // freed: re-race
      }
      Thread.sleep(pollMs)
    }
    throw new java.io.IOException(
      s"could not acquire commit lease $lease within ${acquireTimeoutMs} ms " +
        s"(held and renewed by another writer, or an abandoned lease younger " +
        s"than ttl=${ttlMs} ms); commit aborted rather than risking a lost write")
  }

  private def release(tableDir: String, token: String): Unit =
    try {
      // only delete a lease that is still OURS — after a TTL steal the
      // file carries the stealer's token and must survive this release
      if (readToken(tableDir).contains(token))
        fs(tableDir).delete(leasePath(tableDir), false)
    } catch { case scala.util.control.NonFatal(_) => () }

  private def readToken(tableDir: String): Option[String] =
    try {
      val in = fs(tableDir).open(leasePath(tableDir))
      try {
        // read to EOF: a single read() may legally return a short chunk
        // (object-store streams often do), and a prefix of our own token
        // would make release() strand the lease for a full TTL
        val buf = new java.io.ByteArrayOutputStream(64)
        val chunk = new Array[Byte](64)
        var n = in.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        if (buf.size == 0) None else Some(buf.toString("UTF-8"))
      } finally in.close()
    } catch { case _: java.io.IOException => None }
}

private[connector] object LeaseFileCommitLock {
  /** Process-wide per-table-dir monitors (layer 1 of acquisition). */
  private val stripes =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
