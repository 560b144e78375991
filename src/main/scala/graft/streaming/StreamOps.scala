package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicReference
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's stateful folds (SURVEY.md §2.9).
  *
  * Batch replay and these streams are the SAME semantics in two execution
  * shapes: the batch form is a window/groupBy over the whole log; the stream
  * form keeps per-key state in the state store and emits updates per
  * micro-batch. StreamingSpec asserts their equivalence on shared fixtures.
  *
  * State is hash-partitioned by key across executors (state store), so a
  * 1000-executor cluster shards the keyed state linearly — no single-node
  * state bottleneck; checkpointing gives exactly-once per micro-batch (T3/T4).
  */
object StreamOps {

  /** A keyed upsert event: op = "upsert" | "delete" (S6/S7 streaming form). */
  case class KeyedEvent(key: String, seq: Long, op: String, payload: String)

  /** Current state row emitted downstream after each change. */
  case class KeyedState(key: String, seq: Long, payload: String)

  /** Latest-wins keyed state (W6 streaming form): out-of-order events within
    * a micro-batch are resolved by seq; deletes clear state. Emits the new
    * current row (or nothing if the key was deleted).
    *
    * A delete keeps a TOMBSTONE (payload = null) carrying its seq instead of
    * removing the state entry: with the entry removed, a late out-of-order
    * upsert in a LATER micro-batch would resurrect the deleted key — the
    * same events inside one micro-batch correctly leave it dead, and batch
    * `compactLog` agrees. Tombstone state is bounded by deleted-key
    * cardinality (the reference likewise keeps the deleted row's absence
    * durable in PostgreSQL).
    */
  def latestWinsStream(events: Dataset[KeyedEvent]): Dataset[KeyedState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[KeyedEvent], state: GroupState[KeyedState]) => {
          val sorted = it.toSeq.sortBy(_.seq)
          var cur = state.getOption
          sorted.foreach { e =>
            if (cur.forall(_.seq <= e.seq)) {
              cur = if (e.op == "delete") Some(KeyedState(key, e.seq, null))
                    else Some(KeyedState(key, e.seq, e.payload))
            }
          }
          cur match {
            case Some(s) if s.payload != null => state.update(s); Iterator.single(s)
            case Some(t) => state.update(t); Iterator.empty   // tombstone
            case None    => Iterator.empty
          }
        })
  }

  /** One vote event for the streaming vote-delta fold (A6 streaming form). */
  case class VoteEvent(authorperm: String, token: String, voter: String,
                       seq: Long, ts: Timestamp, rshares: Double, reset: Boolean)

  /** Per-post running state: voter -> current rshares, plus the running sum —
    * the reference's `vote_rshares += new - old` fold
    * (engine_comments_contract_processor.py:96-115), kept in the state store
    * keyed by (authorperm, token).
    *
    * An event with `reset = true` marks the post's payout (authorReward).
    * The persisted total is never zeroed (the reference's zeroing is a
    * dict-only dead store — see ContractReplay), but the payout EVICTS the
    * post's keyed state: votes stop at cashout on-chain, so a 100 TB replay
    * holds state only for live posts instead of growing forever. A vote that
    * nonetheless arrived after eviction would rebuild from an empty voter
    * map — a documented divergence for events the chain does not produce.
    */
  case class PostVoteState(authorperm: String, token: String,
                           voterMap: Map[String, Double],
                           totalRshares: Double, lastTs: Timestamp)

  def voteFoldStream(events: Dataset[VoteEvent]): Dataset[PostVoteState] = {
    import events.sparkSession.implicits._
    events.groupByKey(e => (e.authorperm, e.token))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[VoteEvent], state: GroupState[PostVoteState]) => {
          var s = state.getOption.getOrElse(
            PostVoteState(key._1, key._2, Map.empty, 0.0, null))
          var live = state.exists
          // a micro-batch spans many blocks, so a vote and the payout that
          // follows it can land in ONE invocation; the vote's contribution
          // must still be published (batch ContractReplay includes it), so
          // each reset that was preceded by unpublished votes emits the
          // pre-reset state before clearing it
          val out = scala.collection.mutable.ArrayBuffer.empty[PostVoteState]
          var unpublishedVotes = false
          it.toSeq.sortBy(_.seq).foreach { e =>
            if (e.reset) {
              if (unpublishedVotes) out += s
              unpublishedVotes = false
              s = PostVoteState(key._1, key._2, Map.empty, 0.0, s.lastTs)
              live = false
            } else {
              val old = s.voterMap.getOrElse(e.voter, 0.0)
              s = s.copy(
                voterMap = s.voterMap + (e.voter -> e.rshares),
                totalRshares = s.totalRshares + e.rshares - old,
                lastTs = e.ts)
              live = true
              unpublishedVotes = true
            }
          }
          if (live) {
            state.update(s)
            out += s
          } else {
            // payout: drop the keyed state; the pre-reset emission above (if
            // any) is the last row the sink keeps, matching the persisted
            // reference total
            if (state.exists) state.remove()
          }
          out.iterator
        })
  }

  /** A document arriving on the ingest stream, keyed by content fingerprint
    * (md5/xxhash of the normalized text — computed upstream so the state
    * key is narrow).
    */
  case class IngestDoc(docId: Long, fingerprint: String, ts: Timestamp)

  case class SeenFingerprint(keepId: Long)

  /** Streaming exact dedup at ingest (LLM-pipeline extension): only the
    * FIRST document per content fingerprint passes; later arrivals — in the
    * same micro-batch or any later one — are dropped. The streaming
    * equivalent of `Dedup.exact`'s keep-set, as keyed state sharded across
    * executors by fingerprint.
    *
    * State holds one narrow row per distinct fingerprint. For bounded-window
    * dedup (e.g. "drop repeats within a day") add a processing-time timeout;
    * corpus-lifetime dedup at 100 TB belongs to the batch `Dedup.exact`
    * compaction with this stream handling the intra-day increment.
    */
  def dedupStream(docs: Dataset[IngestDoc]): Dataset[IngestDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (fp: String, it: Iterator[IngestDoc], state: GroupState[SeenFingerprint]) => {
          if (state.exists) Iterator.empty
          else {
            val first = it.toSeq.minBy(d => (d.ts.getTime, d.docId))
            state.update(SeenFingerprint(first.docId))
            Iterator.single(first)
          }
        })
  }

  /** Watermarked tumbling-window aggregation — the canonical Structured
    * Streaming windowed count. Epoch-aligned windows of `windowDur`; events
    * later than `watermarkDelay` behind the max seen event time are dropped,
    * and in append mode a window emits exactly once, when the watermark
    * passes its end.
    *
    * The same plan runs in BATCH mode (window + groupBy over the full log)
    * and produces the same (window, key, n) rows — the streaming form is
    * the incremental execution of the batch query, which is what lets the
    * DuckDB oracle (time_bucket, also epoch-aligned) gate the window math
    * while StreamBatchEquivalenceSpec gates the incremental path.
    */
  def windowedCounts(events: org.apache.spark.sql.DataFrame, tsCol: String,
                     keyCol: String, windowDur: String,
                     watermarkDelay: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, window}
    val base = if (events.isStreaming) events.withWatermark(tsCol, watermarkDelay)
               else events
    base.groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n"))
  }

  /** T1/T2: the reference's two stream gates.
    *
    * T1 (freshness): an op younger than `minAgeSec` must not be processed yet
    * (`stream_blocks.py:80-84`). T2 (alignment): an L1 op must wait until the
    * sidechain stream's event time has passed it (`stream_blocks.py:86-93`).
    * Spark has no cross-query primitive for T2, so the gate is a shared
    * progress cell updated by the sidechain query's foreachBatch and read by
    * the L1 stream's stateful buffer: events beyond the gate stay in keyed
    * state and are released on a later trigger (processing-time timeout).
    *
    * With `persistDir` set, progress is durably published to a
    * configuration-table file exactly like the reference's persisted
    * `configuration` row (stream_blocks.py:86-93, sql/engine.sql:31-48):
    * `advance` writes the new watermark via atomic tmp-file rename, and
    * `current` folds in the persisted value — so a restarted query (or a
    * different JVM sharing the filesystem, e.g. executors on a shared store)
    * resumes at the surviving watermark instead of Long.MinValue. Without
    * `persistDir` the gate is purely in-memory (tests / single-process).
    */
  class AlignmentGate(persistDir: Option[String] = None) extends Serializable {
    // non-transient: each micro-batch re-serializes the driver's closure, so
    // the in-memory cell travels with it (local/test mode); the persisted
    // watermark below is the cross-process source of truth
    private val progress = new AtomicReference[Long](Long.MinValue)

    // All persistence goes through the Hadoop FileSystem API so the gate is
    // durable on HDFS (and any FS with atomic file rename), not just the
    // local disk. FileSystem handles are not serializable — resolve per call
    // from the active session's Hadoop conf (driver) or the classpath
    // defaults (executor-side deserialized copies).
    private def hadoopConf =
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())

    private def cfgPath: Option[Path] =
      persistDir.map(d => new Path(d, "alignment_progress"))

    private def loadPersisted(): Long = cfgPath.map { p =>
      // no checksum verification on this read: ChecksumFileSystem renames
      // the data file and its .crc sidecar non-atomically, so a concurrent
      // publish can briefly mismatch them. The value self-validates (it
      // must parse as a long), and the DATA file rename is atomic.
      // setVerifyChecksum mutates the FileSystem instance, and FileSystem.get
      // returns a JVM-cached instance shared with every other reader in the
      // process — so this read gets a PRIVATE instance, leaving checksum
      // verification on for state parquet and everything else.
      val fs = FileSystem.newInstance(p.toUri, hadoopConf)
      try {
      fs.setVerifyChecksum(false)
      if (!fs.exists(p)) Long.MinValue
      else {
        val in = fs.open(p)
        try {
          // read to EOF: a single InputStream.read may short-read on HDFS,
          // and a truncated '1754955600000' would parse as a LOWER value
          // that the max-fold below then treats as authoritative
          val buf = new java.io.ByteArrayOutputStream(32)
          val bytes = new Array[Byte](32)
          var n = in.read(bytes)
          while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
          new String(buf.toByteArray, "UTF-8").trim.toLong
        } catch { case _: NumberFormatException => Long.MinValue }
        finally in.close()
      }
      } finally fs.close()
    }.getOrElse(Long.MinValue)

    def advance(toEpochMs: Long): Unit = {
      val v = progress.updateAndGet(p => math.max(p, toEpochMs))
      cfgPath.foreach { p =>
        val fs = p.getFileSystem(hadoopConf)
        fs.mkdirs(p.getParent)
        // fold the persisted watermark into the write: a writer whose
        // in-memory cell lags (another process advanced further) must not
        // regress the durable value with a last-writer-wins overwrite
        val publish = math.max(v, loadPersisted())
        // per-writer tmp name: concurrent publishers must not share a tmp
        // file (on HDFS the second create(overwrite) on a leased file
        // throws; on a local FS a racing rename could publish a torn
        // write). The max-fold above makes concurrent publishes converge
        // upward; true compare-and-swap needs a coordination service and
        // is out of scope (the reference serializes through one process).
        val tmp = new Path(p.getParent,
          p.getName + ".tmp." + java.util.UUID.randomUUID().toString)
        val out = fs.create(tmp, true)
        try out.write(publish.toString.getBytes("UTF-8")) finally out.close()
        // atomic publish via FileContext overwrite-rename (plain
        // FileSystem.rename refuses an existing destination on HDFS);
        // readers see either the previous or the new watermark, never torn
        org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, hadoopConf)
          .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    }

    /** Monotonic max of the in-memory cell and the persisted watermark (the
      * reference re-reads the configuration row per poll; one stat+read per
      * micro-batch group is the same cost shape).
      */
    def current: Long =
      if (persistDir.isEmpty) progress.get()
      else progress.updateAndGet(p => math.max(p, loadPersisted()))
  }

  case class GatedOp(key: String, seq: Long, tsMs: Long, payload: String)

  /** Buffer-and-release: emit ops whose event time has been passed by the
    * gate; hold the rest in state and re-check on timeout ticks. Construct
    * the gate with `persistDir` on a shared filesystem for cluster mode /
    * restart durability (the configuration-table pattern above).
    */
  /** timeoutMs > 0: held ops are re-checked on processing-time timeouts (use
    * with an explicit trigger interval — timeouts with the default ASAP
    * trigger degenerate into a busy batch loop). timeoutMs <= 0: release is
    * arrival-driven only (each new micro-batch re-evaluates the buffer),
    * which matches the reference's poll loop and is fully deterministic.
    */
  def alignedStream(ops: Dataset[GatedOp], gate: AlignmentGate,
                    timeoutMs: Long = 3000): Dataset[GatedOp] = {
    import ops.sparkSession.implicits._
    implicit val bufEnc: Encoder[Seq[GatedOp]] = Encoders.kryo[Seq[GatedOp]]
    val timeoutConf = if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    ops.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: String, it: Iterator[GatedOp], state: GroupState[Seq[GatedOp]]) => {
          val incoming = it.toSeq
          val buffered = state.getOption.getOrElse(Seq.empty)
          val all = (buffered ++ incoming).sortBy(_.seq)
          val cut = gate.current
          val (release, hold) = all.partition(_.tsMs <= cut)
          if (hold.nonEmpty) {
            state.update(hold)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
          } else if (state.exists) {
            state.remove()
          }
          release.iterator
        })
  }
}
