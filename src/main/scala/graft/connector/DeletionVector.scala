package graft.connector

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** A deletion vector for one data dir of the mini-lakehouse: the set of
  * row positions deleted from each parquet file, keyed by file NAME (files
  * sit directly under their dir, so the name is unique within it). This is
  * the merge-on-read half of the catalog's row-level operations — the same
  * role Delta's deletion vectors / Iceberg's position-delete files play:
  * a `DELETE` that touches a handful of rows in a multi-GB dir writes a
  * few-KB vector instead of rewriting the dir, and readers subtract the
  * deleted positions at scan time. Positions are the parquet GLOBAL row
  * indexes within a file (what Spark's row-index machinery generates —
  * stable across splits and row-group pruning because they are derived
  * from the footer's row-group offsets).
  *
  * Encoding: `GDV1` magic, then per file the name, the count, and the
  * sorted positions as delta varints — adjacent deleted rows cost one byte
  * each, and a million scattered deletes stay in the low MB. The file is
  * immutable once written (like data dirs, its NAME is committed into a
  * manifest and the content never changes); a new DELETE on the same dir
  * writes the UNION as a fresh file and the manifest swap is the commit.
  */
final case class DeletionVector(files: Map[String, Array[Long]]) {

  def cardinality: Long = files.valuesIterator.map(_.length.toLong).sum

  def isEmpty: Boolean = files.valuesIterator.forall(_.isEmpty)

  /** Union with another vector (both sides sorted and distinct → merged
    * sorted and distinct). Used when a second DELETE lands on an already
    * vectored dir: the new scan only ever saw live rows, so the union is
    * exactly "old deletes + new deletes".
    */
  def union(other: DeletionVector): DeletionVector = {
    val names = files.keySet ++ other.files.keySet
    DeletionVector(names.iterator.map { n =>
      val a = files.getOrElse(n, Array.emptyLongArray)
      val b = other.files.getOrElse(n, Array.emptyLongArray)
      n -> DeletionVector.mergeSorted(a, b)
    }.toMap)
  }

  /** Every position of `other` is also deleted here (superset test). The
    * commit-conflict probe uses it to verify a dir's current vector still
    * EXTENDS the pinned one — a shrink or divergence means the dir was
    * rewritten, not merely deleted-from, and no merge is safe.
    */
  def containsAll(other: DeletionVector): Boolean =
    other.files.forall { case (n, b) =>
      val a = files.getOrElse(n, Array.emptyLongArray)
      // both sorted+distinct: one linear sweep
      var i = 0; var j = 0
      var diverged = false
      while (!diverged && i < a.length && j < b.length) {
        if (a(i) == b(j)) { i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else diverged = true
      }
      !diverged && j == b.length
    }

  /** Some position is deleted by BOTH vectors (sorted-sweep intersection
    * test) — two rewrites of one dir conflict exactly when this is true of
    * (their fresh deletions, the other writer's additions).
    */
  def intersects(other: DeletionVector): Boolean =
    other.files.exists { case (n, b) =>
      val a = files.getOrElse(n, Array.emptyLongArray)
      var i = 0; var j = 0
      var hit = false
      while (!hit && i < a.length && j < b.length) {
        if (a(i) == b(j)) hit = true
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      hit
    }
}

object DeletionVector {

  val empty: DeletionVector = DeletionVector(Map.empty)

  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  /** Forward-only membership cursor over one file's sorted positions —
    * O(1) amortized because scan rows arrive in increasing row-index order
    * (row groups are read in footer order within a split, and partitions
    * order their splits by file offset).
    */
  final class Skipper(positions: Array[Long]) {
    private var i = 0
    def deleted(pos: Long): Boolean = {
      while (i < positions.length && positions(i) < pos) i += 1
      i < positions.length && positions(i) == pos
    }
  }

  def skipper(dv: DeletionVector, fileName: String): Skipper =
    new Skipper(dv.files.getOrElse(fileName, Array.emptyLongArray))

  /** Sort + dedup positions collected in arrival order (shuffled plans —
    * a sort-merge-join MERGE, an IN-subquery DELETE — deliver matched rows
    * ordered by join key, NOT by row index).
    */
  private[connector] def normalize(pos: Array[Long]): Array[Long] = {
    if (pos.length <= 1) return pos
    val sorted = pos.clone()
    java.util.Arrays.sort(sorted)
    var n = 1
    var i = 1
    while (i < sorted.length) {
      if (sorted(i) != sorted(n - 1)) { sorted(n) = sorted(i); n += 1 }
      i += 1
    }
    if (n == sorted.length) sorted else java.util.Arrays.copyOf(sorted, n)
  }

  private[connector] def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    out.sizeHint(a.length + b.length)
    var i = 0; var j = 0; var last = Long.MinValue; var any = false
    def push(v: Long): Unit =
      if (!any || v != last) { out += v; last = v; any = true }
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { push(a(i)); i += 1 } else { push(b(j)); j += 1 }
    }
    while (i < a.length) { push(a(i)); i += 1 }
    while (j < b.length) { push(b(j)); j += 1 }
    out.result()
  }

  // ---- binary codec --------------------------------------------------------

  private def writeVarLong(out: DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.writeByte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.writeByte(v.toInt)
  }

  private def readVarLong(in: DataInputStream): Long = {
    var v = 0L; var shift = 0; var b = 0
    do {
      b = in.readUnsignedByte()
      v |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    v
  }

  def encode(dv: DeletionVector): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val out = new DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(dv.files.size)
    dv.files.toSeq.sortBy(_._1).foreach { case (name, pos) =>
      var i = 1
      while (i < pos.length) {
        require(pos(i - 1) < pos(i),
          s"deletion vector positions for $name must be sorted distinct")
        i += 1
      }
      out.writeUTF(name)
      out.writeInt(pos.length)
      var prev = 0L
      var first = true
      pos.foreach { p =>
        writeVarLong(out, if (first) p else p - prev - 1)
        prev = p; first = false
      }
    }
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): DeletionVector = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic),
      "not a graft deletion vector (bad magic)")
    val nFiles = in.readInt()
    val files = (0 until nFiles).map { _ =>
      val name = in.readUTF()
      val n = in.readInt()
      val pos = new Array[Long](n)
      var prev = -1L
      var i = 0
      while (i < n) {
        prev = if (i == 0) readVarLong(in) else prev + 1 + readVarLong(in)
        pos(i) = prev
        i += 1
      }
      name -> pos
    }.toMap
    DeletionVector(files)
  }

  // ---- filesystem IO -------------------------------------------------------

  def write(path: String, conf: Configuration, dv: DeletionVector): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, false)
    try out.write(encode(dv)) finally out.close()
  }

  def read(path: String, conf: Configuration): DeletionVector = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len)
      in.readFully(0, bytes)
      decode(bytes)
    } finally in.close()
  }
}

/** Per-JVM cache of decoded deletion vectors, keyed by file path — safe
  * because vector files are immutable once a manifest references them.
  * Scans ship the vector's PATH in each task (Delta's model) rather than
  * serializing position arrays into every partition, so an executor reads
  * and decodes each vector once however many file splits it processes;
  * LRU-bounded so long-lived executors don't accumulate every vector a
  * streaming job ever referenced.
  */
private[connector] object DeletionVectorCache {
  private val MaxEntries = 64
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, DeletionVector](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, DeletionVector]): Boolean =
        size() > MaxEntries
    })

  def get(path: String, conf: Configuration): DeletionVector = {
    val hit = cache.get(path)
    if (hit != null) hit
    else {
      val v = DeletionVector.read(path, conf)
      cache.put(path, v)
      v
    }
  }
}

/** Minimal serializable Hadoop `Configuration` carrier for reader
  * factories (the Spark-internal equivalent is `private[spark]`).
  */
private[connector] final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
