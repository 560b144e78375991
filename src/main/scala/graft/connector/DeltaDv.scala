package graft.connector

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Delta Lake's PUBLISHED deletion-vector reader format (delta-io
  * PROTOCOL.md §"Deletion Vectors" — re-derived from the spec; the Delta
  * jars are deliberately absent from this build), mapped onto the same
  * position-set semantics as the engine's own [[DeletionVector]]: the set
  * of row indexes deleted from one data file.
  *
  *  - DESCRIPTOR (the `deletionVector` struct on an `add` action):
  *    `storageType` 'u' (file named by a Z85-coded UUID relative to the
  *    table root, with an optional random directory prefix), 'i' (the
  *    vector bytes inline, Z85-coded), or 'p' (absolute file path);
  *    `offset` locates the vector inside a shared `.bin` file (many
  *    vectors pack into one file); `sizeInBytes` / `cardinality` are
  *    validated, not trusted.
  *  - FILE LAYOUT: a 1-byte format version (1), then each vector as
  *    `[size: int32 BE][data: size bytes][CRC-32 of data: int32 BE]`
  *    starting at its descriptor's `offset`.
  *  - VECTOR DATA: a "RoaringBitmapArray" in the portable format — magic
  *    `1681511377` (int32 LE), bitmap count (int64 LE), then per 32-bit
  *    bitmap its key (int32 LE; position = key·2³² + value) and a
  *    standard portable 32-bit RoaringBitmap (RoaringFormatSpec: cookie
  *    12346/12347, descriptive + offset headers, array / bitmap / run
  *    containers). The reader accepts all three container kinds; the
  *    writer (used by the import spec/oracle fixtures and available to a
  *    Delta-compatible export) emits array and bitmap containers.
  *
  * Scale shape: vectors decode EXECUTOR-side ([[positions]] is called
  * from the distributed anti-join in [[DeltaImport.readSnapshot]]); the
  * driver only ever holds descriptors — the same bounded envelope as the
  * file list itself.
  */
object DeltaDv {

  /** The `add.deletionVector` struct, verbatim. `offset` is absent for
    * inline vectors.
    */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Int], sizeInBytes: Int,
                              cardinality: Long)

  // ---- Z85 (ZeroMQ base-85; the alphabet Delta's spec pins) ---------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Driver-side twin of Spark's `xxhash64(string_col)` (seed 42) — lets
    * [[DeltaImport.readSnapshot]] verify up front that the 8-byte file-path
    * keys its DV anti-join will exchange are collision-free for THIS file
    * set.
    */
  private[connector] def pathHash(path: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(path),
      org.apache.spark.sql.types.StringType, 42L)

  private[connector] def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"Z85 encodes 4-byte groups, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  private[connector] def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 decodes 5-char groups, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Rev(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(i / 5 * 4 + (3 - k)) = ((v >>> (k * 8)) & 0xff).toByte; k -= 1 }
      i += 5
    }
    out
  }

  private[connector] def encodeUuid(u: java.util.UUID): String = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(b.array())
  }

  private[connector] def decodeUuid(s: String): java.util.UUID = {
    val b = java.nio.ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(b.getLong, b.getLong)
  }

  // ---- RoaringBitmapArray, portable format ---------------------------------

  private val Magic = 1681511377

  /** Serialize sorted-distinct non-negative positions. Emits array
    * containers at cardinality <= 4096 and bitmap containers above — the
    * same size rule the published format's writers follow.
    */
  def serializeRoaring(positions: Array[Long]): Array[Byte] = {
    var i = 1
    while (i < positions.length) {
      require(positions(i - 1) < positions(i), "positions must be sorted distinct")
      i += 1
    }
    require(positions.isEmpty || positions(0) >= 0, "positions must be non-negative")
    val bos = new ByteArrayOutputStream(64)
    val out = new DataOutputStream(bos)
    def le16(v: Int): Unit = { out.writeByte(v & 0xff); out.writeByte((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def le64(v: Long): Unit = { le32((v & 0xffffffffL).toInt); le32((v >>> 32).toInt) }
    // split by 32-bit bitmap key (position >>> 32)
    val byKey = positions.toSeq.groupBy(p => (p >>> 32).toInt).toSeq.sortBy(_._1)
    le32(Magic)
    le64(byKey.size.toLong)
    byKey.foreach { case (key, vals32) =>
      le32(key)
      // one standard portable 32-bit roaring bitmap
      val containers = vals32.map(v => (v & 0xffffffffL).toInt)
        .groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
        .map { case (hi, vs) => (hi.toInt, vs.map(_ & 0xffff).sorted.toArray) }
      le32(12346)                       // SERIAL_COOKIE_NO_RUNCONTAINER
      le32(containers.size)
      containers.foreach { case (hi, vs) => le16(hi); le16(vs.length - 1) }
      // offset header: byte offsets of each container from the bitmap start
      var off = 4 + 4 + containers.size * 4 + containers.size * 4
      containers.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) vs.length * 2 else 8192)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(le16)
        else {
          val words = new Array[Long](1024)
          vs.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
          words.foreach(le64)
        }
      }
    }
    out.flush()
    bos.toByteArray
  }

  /** Decode to sorted positions. Accepts array, bitmap, AND run containers
    * (a real Delta writer run-compresses dense deletes).
    */
  def deserializeRoaring(bytes: Array[Byte]): Array[Long] = {
    var p = 0
    def le16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
    def le32(): Int = { val v = le16() | (le16() << 16); v }
    def le64(): Long = { val lo = le32() & 0xffffffffL; val hi = le32() & 0xffffffffL; lo | (hi << 32) }
    require(le32() == Magic, "not a Delta RoaringBitmapArray (bad magic)")
    val nBitmaps = le64()
    require(nBitmaps >= 0 && nBitmaps < (1L << 31), s"absurd bitmap count $nBitmaps")
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var b = 0L
    while (b < nBitmaps) {
      val key = le32().toLong & 0xffffffffL
      val base = key << 32
      val cookie = le32()
      val (nContainers, runBits) =
        if ((cookie & 0xffff) == 12347) {
          val n = (cookie >>> 16) + 1
          val rb = new Array[Byte]((n + 7) / 8)
          System.arraycopy(bytes, p, rb, 0, rb.length); p += rb.length
          (n, rb)
        } else {
          require(cookie == 12346, s"unrecognized roaring cookie $cookie")
          (le32(), Array.emptyByteArray)
        }
      val keys = new Array[Int](nContainers)
      val cards = new Array[Int](nContainers)
      var c = 0
      while (c < nContainers) { keys(c) = le16(); cards(c) = le16() + 1; c += 1 }
      // offset header: always present without run containers; with runs,
      // only at >= 4 containers (the published NO_OFFSET_THRESHOLD)
      if (runBits.isEmpty || nContainers >= 4) p += nContainers * 4
      c = 0
      while (c < nContainers) {
        val hi = base | (keys(c).toLong << 16)
        val isRun = runBits.nonEmpty && ((runBits(c / 8) >> (c % 8)) & 1) == 1
        if (isRun) {
          val nRuns = le16()
          var r = 0
          while (r < nRuns) {
            val start = le16(); val len = le16()
            var v = start
            while (v <= start + len) { out += (hi | v); v += 1 }
            r += 1
          }
        } else if (cards(c) <= 4096) {
          var v = 0
          while (v < cards(c)) { out += (hi | le16()); v += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            var word = le64()
            val wordBase = hi | (w.toLong << 6)
            while (word != 0) {
              out += (wordBase | java.lang.Long.numberOfTrailingZeros(word))
              word &= word - 1
            }
            w += 1
          }
        }
        c += 1
      }
      b += 1
    }
    val arr = out.result()
    java.util.Arrays.sort(arr)   // bitmap keys arrive ordered, but don't trust it
    arr
  }

  // ---- descriptor resolution ------------------------------------------------

  /** Absolute path of an on-disk vector ('u': table-relative UUID-named
    * file under the optional random prefix; 'p': absolute).
    */
  private[connector] def dvPath(tableDir: String, d: Descriptor): Path =
    d.storageType match {
      case "p" => new Path(d.pathOrInlineDv)
      case "u" =>
        require(d.pathOrInlineDv.length >= 20,
          s"storageType 'u' needs a 20-char Z85 uuid, got '${d.pathOrInlineDv}'")
        val prefix = d.pathOrInlineDv.dropRight(20)
        val uuid = decodeUuid(d.pathOrInlineDv.takeRight(20))
        val parent = if (prefix.isEmpty) new Path(tableDir) else new Path(tableDir, prefix)
        new Path(parent, s"deletion_vector_$uuid.bin")
      case other => throw new IllegalArgumentException(
        s"deletion vector storageType '$other' is not u/i/p")
    }

  /** The deleted row positions a descriptor names — executor-callable (the
    * import's anti-join decodes per task). Size and CRC-32 are verified
    * for on-disk vectors; cardinality is verified for all.
    */
  def positions(tableDir: String, d: Descriptor, conf: Configuration): Array[Long] = {
    val data = d.storageType match {
      case "i" =>
        val bytes = z85Decode(d.pathOrInlineDv)
        // inline sizeInBytes may undershoot the 4-byte Z85 padding
        if (bytes.length == d.sizeInBytes) bytes
        else java.util.Arrays.copyOf(bytes, d.sizeInBytes)
      case _ =>
        val path = dvPath(tableDir, d)
        val off = d.offset.getOrElse(throw new IllegalArgumentException(
          s"on-disk deletion vector $path has no offset"))
        val fs = path.getFileSystem(conf)
        val in = fs.open(path)
        try {
          val head = new Array[Byte](1)
          in.readFully(0, head)
          require(head(0) == 1,
            s"deletion vector file $path has format version ${head(0)}, expected 1")
          val lenBuf = new Array[Byte](4)
          in.readFully(off, lenBuf)
          val size = java.nio.ByteBuffer.wrap(lenBuf).getInt   // big-endian
          require(size == d.sizeInBytes,
            s"deletion vector at $path+$off declares $size bytes, " +
              s"descriptor says ${d.sizeInBytes}")
          val buf = new Array[Byte](size + 4)
          in.readFully(off + 4L, buf)
          val crc = new CRC32
          crc.update(buf, 0, size)
          val stored = java.nio.ByteBuffer.wrap(buf, size, 4).getInt
          require(crc.getValue.toInt == stored,
            s"deletion vector at $path+$off fails its CRC-32 check")
          java.util.Arrays.copyOf(buf, size)
        } finally in.close()
    }
    val pos = deserializeRoaring(data)
    require(pos.length.toLong == d.cardinality,
      s"deletion vector decodes ${pos.length} positions, descriptor says " +
        s"${d.cardinality} — refusing a vector/descriptor mismatch")
    pos
  }

  // ---- writer (spec/oracle fixtures; a Delta-compatible DV export) ---------

  /** Write one `.bin` file under `tableDir` packing `vectors` in order
    * (Delta's own writers pack many vectors per file); returns 'u'
    * descriptors. `prefix` exercises the random-prefix path shape.
    */
  def writeFile(tableDir: String, conf: Configuration,
                vectors: Seq[Array[Long]], prefix: String = ""): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val pathOrInline = prefix + encodeUuid(uuid)
    val parent = if (prefix.isEmpty) new Path(tableDir) else new Path(tableDir, prefix)
    val path = new Path(parent, s"deletion_vector_$uuid.bin")
    val fs = path.getFileSystem(conf)
    val bos = new ByteArrayOutputStream(256)
    bos.write(1)                                   // format version
    val descs = vectors.map { pos =>
      val off = bos.size()
      val data = serializeRoaring(pos)
      val be = java.nio.ByteBuffer.allocate(4)
      bos.write(be.putInt(0, data.length).array(), 0, 4)
      bos.write(data)
      val crc = new CRC32
      crc.update(data)
      bos.write(be.putInt(0, crc.getValue.toInt).array(), 0, 4)
      Descriptor("u", pathOrInline, Some(off), data.length, pos.length.toLong)
    }
    val out = fs.create(path, false)
    try out.write(bos.toByteArray) finally out.close()
    descs
  }

  /** An inline ('i') descriptor for small vectors. */
  def inlineDescriptor(pos: Array[Long]): Descriptor = {
    val data = serializeRoaring(pos)
    val padded = java.util.Arrays.copyOf(data, (data.length + 3) / 4 * 4)
    Descriptor("i", z85Encode(padded), None, data.length, pos.length.toLong)
  }
}
