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
  * abandoned, delete it, and re-race. While held, a daemon HEARTBEAT
  * re-writes the lease (token re-PUT — refreshing its store mtime on
  * every store, where a bare setTimes is a no-op on object stores) every
  * `ttlMs / 3`, so a publish slower than the TTL (a stalled object-store
  * PUT, a wide rewrite) is not stolen
  * mid-flight — only a holder whose whole PROCESS stops renewing (crash,
  * or a GC pause past the TTL, the envelope every TTL lock documents)
  * loses the lease to a steal. Release deletes the lease only while it
  * still carries this acquisition's token — re-checked immediately before
  * the delete, mirroring the steal path's re-stat — so a post-steal
  * release destroying the stealer's fresh lease requires the steal to
  * land between two adjacent calls (microseconds), the same envelope
  * class as the steal path's own residual, not a plain scheduling hiccup.
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

  /** Advisory probe: is an unexpired lease present at `tableDir` right
    * now? Callers that prefer refusing FAST over parking behind a
    * long-running holder (in-process, the stripe monitor has no
    * timeout) check this before `withLock`. The answer is racy by
    * nature — two callers probing simultaneously both see false and one
    * still parks — so the real exclusion always comes from the lock
    * itself; this only shrinks the park window from the holder's whole
    * critical section to the probe-to-acquire gap.
    */
  private[connector] def isHeld(tableDir: String): Boolean =
    try {
      val st = fs(tableDir).getFileStatus(leasePath(tableDir))
      System.currentTimeMillis() - st.getModificationTime < ttlMs
    } catch { case _: java.io.IOException => false }

  private def leasePath(tableDir: String) = new Path(tableDir, "_commitlock")

  private def fs(tableDir: String) =
    new Path(tableDir).getFileSystem(conf)

  private[connector] def acquire(tableDir: String): String = {
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
        var foreign = false
        var i = 0
        while (mine && i < 2) {
          Thread.sleep(settleMs)
          val t = readToken(tableDir)
          mine = t.contains(token)
          foreign = t.exists(_ != token)
          i += 1
        }
        if (mine) { startHeartbeat(tableDir, token); return token }
        // a FOREIGN token means a double-create happened and we lost —
        // the lease is the winner's, leave it. But a read-back that
        // merely FAILED (None: transient IO blip) after our own create
        // succeeded most likely left OUR token stranded on disk; without
        // this best-effort delete every writer (including us) would
        // block a full TTL before reclaiming it. release()'s
        // check-then-delete pattern keeps a racer's lease safe.
        if (!foreign) release(tableDir, token)
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

  private[connector] def release(tableDir: String, token: String): Unit = {
    val monitor = stopHeartbeat(tableDir)
    monitor.synchronized {
      try {
        // only delete a lease that is still OURS — after a TTL steal the
        // file carries the stealer's token and must survive this release.
        // Checked TWICE, the second immediately before the delete (the
        // steal path's re-stat pattern): with a single read, a steal
        // landing in the read→delete gap would have our release destroy
        // the stealer's fresh lease; with the paired reads that requires
        // the steal to fit between two adjacent calls (see class doc).
        // The heartbeat monitor is held, so a cancelled-but-running beat
        // cannot re-PUT the lease after this delete.
        if (readToken(tableDir).contains(token) &&
            readToken(tableDir).contains(token))
          fs(tableDir).delete(leasePath(tableDir), false)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  // ---- heartbeat: renew the lease while held -------------------------------

  private case class Heartbeat(future: java.util.concurrent.ScheduledFuture[_],
                               monitor: Object)

  private val heartbeats =
    new java.util.concurrent.ConcurrentHashMap[String, Heartbeat]()

  private def startHeartbeat(tableDir: String, token: String): Unit = {
    val period = math.max(25L, ttlMs / 3)
    val monitor = new Object
    val task: Runnable = () => monitor.synchronized {
      try {
        // renew only while the lease still carries OUR token: after a
        // steal (GC pause past the TTL) the file is the stealer's and a
        // blind renewal would extend a lease we no longer hold. Renewal
        // RE-WRITES the token (create overwrite=true): FileSystem.setTimes
        // is a silent no-op on the object-store implementations this lock
        // exists for (the base-class default does nothing, S3A/ABFS do
        // not implement it), so an mtime touch would leave the on-store
        // lease stale and the slower-than-TTL publish stealable — the
        // re-PUT refreshes the store mtime everywhere. The beat and
        // release() share this monitor, so a release can never interleave
        // with a half-finished re-PUT of the same acquisition.
        // Mtime SANDWICH around the token read: the stat after the read
        // must match the stat before it, or a TTL steal landed while this
        // beat was in flight (e.g. the beat itself stalled past the TTL on
        // a slow store call) and the file is the stealer's — the blind
        // overwrite would silently clobber the stealer's lease with our
        // stale token, after which OUR release deletes it and the stealer
        // publishes unprotected. A mismatched sandwich just skips this
        // beat; the residual shrinks to a steal landing between the second
        // stat and the create — two adjacent calls, the same envelope
        // class as the steal/release paths' own re-stat residuals.
        val f = fs(tableDir)
        val lp = leasePath(tableDir)
        val before = f.getFileStatus(lp).getModificationTime
        if (readToken(tableDir).contains(token) &&
            f.getFileStatus(lp).getModificationTime == before) {
          val out = f.create(lp, true)
          try out.write(token.getBytes("UTF-8")) finally out.close()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    val f = LeaseFileCommitLock.scheduler
      .scheduleAtFixedRate(task, period, period,
        java.util.concurrent.TimeUnit.MILLISECONDS)
    Option(heartbeats.put(TableLog.dirKey(tableDir), Heartbeat(f, monitor)))
      .foreach(_.future.cancel(false))
  }

  /** Cancel the heartbeat and return the monitor release() must hold while
    * deleting, so no in-flight beat can re-create the lease after it.
    */
  private def stopHeartbeat(tableDir: String): Object =
    Option(heartbeats.remove(TableLog.dirKey(tableDir))) match {
      case Some(hb) => hb.future.cancel(false); hb.monitor
      case None => new Object
    }

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

  /** One shared daemon scheduler for every lock's heartbeats. FOUR threads,
    * not one: a beat is two blocking store calls (read + re-PUT), and with
    * a single thread one stalled store request would queue every other
    * held lease's renewal behind it until its TTL expired — the mid-flight
    * steal the heartbeat exists to prevent. Leases held at any instant are
    * few (one per in-flight table publish), so four threads keep beats
    * independent without real cost.
    */
  private val scheduler = {
    val s = new java.util.concurrent.ScheduledThreadPoolExecutor(4, (r: Runnable) => {
      val t = new Thread(r, "graft-lease-heartbeat")
      t.setDaemon(true)
      t
    })
    s.setRemoveOnCancelPolicy(true)
    s
  }
}
