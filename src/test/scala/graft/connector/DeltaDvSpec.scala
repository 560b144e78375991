package graft.connector

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Delta's published deletion-vector encodings ([[DeltaDv]]), no Spark
  * needed: Z85, the portable RoaringBitmapArray (array / bitmap / run
  * containers, multi-bitmap keys), the on-disk file layout (version byte,
  * size prefix, CRC-32), and descriptor resolution for all three
  * storageTypes — including the corruptions that must refuse loudly.
  */
class DeltaDvSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("z85 round trips and matches the published test vector") {
    // the canonical Z85 spec vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B
    // encodes to "HelloWorld"
    val spec = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b).map(_.toByte)
    assert(DeltaDv.z85Encode(spec) === "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq === spec.toSeq)
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { i =>
      val b = Array.fill(4 * i)(rnd.nextInt().toByte)
      assert(DeltaDv.z85Decode(DeltaDv.z85Encode(b)).toSeq === b.toSeq)
    }
    val u = java.util.UUID.randomUUID()
    assert(DeltaDv.decodeUuid(DeltaDv.encodeUuid(u)) === u)
  }

  test("roaring round trip: array, bitmap, and multi-key shapes") {
    def rt(pos: Array[Long]): Unit =
      assert(DeltaDv.deserializeRoaring(DeltaDv.serializeRoaring(pos)).toSeq === pos.toSeq)
    rt(Array.emptyLongArray)
    rt(Array(0L))
    rt(Array(1L, 5L, 65535L, 65536L, 131071L))                     // 2 containers
    rt((0L until 20000L by 3).toArray)                             // bitmap container (6667 > 4096)
    rt(Array(7L, (1L << 32) + 9, (1L << 32) + 10, (5L << 32) + 1)) // multi-bitmap keys
    rt((0L until 5000L).toArray ++ Array((1L << 32) + 3))          // bitmap + second key
  }

  test("roaring reader accepts run containers (a real Delta writer's dense deletes)") {
    // hand-build a SERIAL_COOKIE (12347) bitmap: 1 run container holding
    // [10, 20] and [100, 102] — the reader must expand runs exactly
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    le32(1681511377); le32(1); le32(0)   // magic, nBitmaps=1 (as two LE32 words)
    le32(0)                               // bitmap key 0
    le32(12347 | (0 << 16))               // run cookie, containerCount-1 = 0
    bos.write(1)                          // run bitmap: container 0 is a run
    le16(0); le16(13)                     // container key 0, cardinality-1 = 13
    // < 4 containers with runs -> no offset header
    le16(2)                               // 2 runs
    le16(10); le16(10)                    // [10, 10+10]
    le16(100); le16(2)                    // [100, 102]
    val got = DeltaDv.deserializeRoaring(bos.toByteArray)
    assert(got.toSeq === ((10L to 20L) ++ (100L to 102L)).toSeq)
  }

  test("file layout: version byte, offsets, CRC; u/i/p descriptors resolve") {
    val dir = tmp("dv-file")
    val v1 = Array(0L, 2L, 9L)
    val v2 = (100L until 4600L).toArray
    val descs = DeltaDv.writeFile(dir, conf, Seq(v1, v2), prefix = "ab")
    assert(descs.map(_.storageType) === Seq("u", "u"))
    assert(descs.map(_.cardinality) === Seq(3L, 4500L))
    assert(descs.head.pathOrInlineDv.startsWith("ab"))
    assert(DeltaDv.positions(dir, descs(0), conf).toSeq === v1.toSeq)
    assert(DeltaDv.positions(dir, descs(1), conf).toSeq === v2.toSeq)

    // absolute-path descriptor ('p') against the same file
    val p = DeltaDv.dvPath(dir, descs(0)).toString
    val abs = descs(1).copy(storageType = "p", pathOrInlineDv = p)
    assert(DeltaDv.positions("/nonexistent-root", abs, conf).toSeq === v2.toSeq)

    // inline ('i')
    val inl = DeltaDv.inlineDescriptor(Array(3L, 4L, 1000000L))
    assert(DeltaDv.positions(dir, inl, conf).toSeq === Seq(3L, 4L, 1000000L))

    // cardinality mismatch refuses (vector/descriptor desync)
    val bad = descs(0).copy(cardinality = 4L)
    val e1 = intercept[IllegalArgumentException] { DeltaDv.positions(dir, bad, conf) }
    assert(e1.getMessage.contains("mismatch"))

    // flipped data byte fails the CRC
    val path = DeltaDv.dvPath(dir, descs(0))
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(path); try in.readFully(0, bytes) finally in.close()
    bytes(descs(0).offset.get + 6) = (bytes(descs(0).offset.get + 6) ^ 1).toByte
    val out = fs.create(path, true); try out.write(bytes) finally out.close()
    val e2 = intercept[IllegalArgumentException] { DeltaDv.positions(dir, descs(0), conf) }
    assert(e2.getMessage.contains("CRC"))
  }
}
