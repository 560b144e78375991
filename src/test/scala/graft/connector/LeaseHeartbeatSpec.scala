package graft.connector

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The lease lock's held-lease behaviors, driven through the
  * package-private acquire/release so the in-process stripe monitor (which
  * would serialize two same-JVM writers before the lease file ever gets a
  * vote) is out of the picture — the cross-process view, single-JVM:
  *
  *  1. HEARTBEAT: a publish slower than the TTL keeps its lease — the
  *     renewal thread touches the lease mtime every ttl/3, so a waiter
  *     polling for the whole window never sees it expire (round-17 verdict
  *     item 6: without renewal, a slow publish was stolen mid-flight);
  *  2. release only ever deletes a lease still carrying ITS token — a
  *     stolen/foreign lease survives.
  */
class LeaseHeartbeatSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("graft-hb").toString

  test("heartbeat keeps a slower-than-TTL publish from being stolen") {
    val conf = new Configuration()
    val dir = tmp()
    val holder = new LeaseFileCommitLock(conf, ttlMs = 500L,
      acquireTimeoutMs = 5000L, pollMs = 10L, settleMs = 1L)
    val waiter = new LeaseFileCommitLock(conf, ttlMs = 500L,
      acquireTimeoutMs = 1600L, pollMs = 10L, settleMs = 1L)
    val token = holder.acquire(dir)
    try {
      // the waiter polls for >3x the TTL; every poll must find a lease
      // younger than the TTL (renewed every ttl/3), so it times out
      // instead of stealing — without the heartbeat it would be in
      // within ~520 ms
      val t0 = System.currentTimeMillis()
      val ex = intercept[java.io.IOException] { waiter.acquire(dir) }
      assert(ex.getMessage.contains("could not acquire"))
      assert(System.currentTimeMillis() - t0 >= 1500L,
        "waiter gave up early instead of timing out")
    } finally holder.release(dir, token)
    // released: the next acquire succeeds immediately
    val t2 = waiter.acquire(dir)
    waiter.release(dir, t2)
  }

  test("isHeld: live lease true, released false, expired-stale false") {
    val conf = new Configuration()
    val dir = tmp()
    val lock = new LeaseFileCommitLock(conf, ttlMs = 60000L,
      acquireTimeoutMs = 5000L, pollMs = 10L, settleMs = 1L)
    assert(!lock.isHeld(dir), "no lease yet")
    val token = lock.acquire(dir)
    // a SECOND instance (the refresh-procedure shape: fresh lock object
    // per call) must see the holder
    assert(new LeaseFileCommitLock(conf, ttlMs = 60000L).isHeld(dir))
    lock.release(dir, token)
    assert(!lock.isHeld(dir), "released lease still reads held")
    // a CRASHED holder's stale file past the TTL is NOT held — the next
    // caller proceeds to withLock and steals it there. (A live holder's
    // heartbeat renews mtime every ttl/3, so simulate the crash by
    // writing the lease file directly with an aged mtime.)
    val lease = new Path(dir, "_commitlock")
    val fs = lease.getFileSystem(conf)
    val out = fs.create(lease, true)
    try out.write("crashed-holder-token".getBytes("UTF-8")) finally out.close()
    fs.setTimes(lease, System.currentTimeMillis() - 120000L, -1L)
    assert(!lock.isHeld(dir), "expired lease must not read held")
    fs.delete(lease, false)
  }

  test("release leaves a foreign (stolen) lease intact") {
    val conf = new Configuration()
    val dir = tmp()
    val lock = new LeaseFileCommitLock(conf, ttlMs = 60000L,
      acquireTimeoutMs = 5000L, pollMs = 10L, settleMs = 1L)
    val token = lock.acquire(dir)
    val lease = new Path(dir, "_commitlock")
    val fs = lease.getFileSystem(conf)
    // simulate a steal: the lease now carries another writer's token
    val out = fs.create(lease, true)
    try out.write("someone-elses-token".getBytes("UTF-8")) finally out.close()
    lock.release(dir, token)
    assert(fs.exists(lease),
      "release must not delete a lease it no longer owns")
    fs.delete(lease, false)
  }
}
