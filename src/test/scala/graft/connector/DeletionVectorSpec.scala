package graft.connector

import org.scalatest.funsuite.AnyFunSuite

/** Codec and merge semantics of [[DeletionVector]] — pure unit tests. */
class DeletionVectorSpec extends AnyFunSuite {

  test("encode/decode round-trips, including empty and adversarial gaps") {
    val dv = DeletionVector(Map(
      "part-0.parquet" -> Array(0L, 1L, 2L, 1000000L, Long.MaxValue - 1),
      "part-1.parquet" -> Array(7L),
      "part-2.parquet" -> Array.emptyLongArray))
    val back = DeletionVector.decode(DeletionVector.encode(dv))
    assert(back.files.keySet === dv.files.keySet)
    dv.files.foreach { case (k, v) => assert(back.files(k) === v) }
    assert(back.cardinality === 6L)

    val empty = DeletionVector.decode(DeletionVector.encode(DeletionVector.empty))
    assert(empty.isEmpty && empty.files.isEmpty)
  }

  test("adjacent runs cost ~1 byte per position (delta varint)") {
    val run = DeletionVector(Map("f" -> Array.tabulate(10000)(_.toLong + 5)))
    val bytes = DeletionVector.encode(run)
    assert(bytes.length < 10100 + 32, s"run-length encoding regressed: ${bytes.length} bytes")
  }

  test("encode refuses unsorted or duplicated positions") {
    intercept[IllegalArgumentException](
      DeletionVector.encode(DeletionVector(Map("f" -> Array(3L, 2L)))))
    intercept[IllegalArgumentException](
      DeletionVector.encode(DeletionVector(Map("f" -> Array(2L, 2L)))))
  }

  test("decode refuses foreign bytes") {
    intercept[IllegalArgumentException](
      DeletionVector.decode(Array[Byte]('P', 'A', 'R', '1', 0, 0, 0, 0)))
  }

  test("union merges sorted-distinct and is idempotent") {
    val a = DeletionVector(Map("f" -> Array(1L, 3L, 5L), "g" -> Array(0L)))
    val b = DeletionVector(Map("f" -> Array(2L, 3L, 9L), "h" -> Array(4L)))
    val u = a.union(b)
    assert(u.files("f") === Array(1L, 2L, 3L, 5L, 9L))
    assert(u.files("g") === Array(0L))
    assert(u.files("h") === Array(4L))
    assert(u.cardinality === 7L)
    assert(u.union(u).files("f") === u.files("f"))
    assert(a.union(DeletionVector.empty).files("f") === a.files("f"))
  }

  test("serializable conf wrapper survives java serialization round-trip") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.key", "v1")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(new SerializableHadoopConf(conf)); out.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("graft.test.key") === "v1")
  }

  test("vector cache returns decoded content and caches by path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dv-cache").toString
    val conf = new org.apache.hadoop.conf.Configuration()
    val dv = DeletionVector(Map("f.parquet" -> Array(1L, 9L)))
    DeletionVector.write(s"$dir/v-1", conf, dv)
    val a = DeletionVectorCache.get(s"$dir/v-1", conf)
    assert(a.files("f.parquet") === Array(1L, 9L))
    // second get returns the SAME decoded instance (cached, file not re-read)
    assert(DeletionVectorCache.get(s"$dir/v-1", conf) eq a)
  }

  test("skipper is a forward cursor over membership") {
    val sk = new DeletionVector.Skipper(Array(2L, 5L, 6L))
    assert(!sk.deleted(0))
    assert(!sk.deleted(1))
    assert(sk.deleted(2))
    assert(!sk.deleted(3))
    assert(sk.deleted(5))
    assert(sk.deleted(6))
    assert(!sk.deleted(7))
    assert(!sk.deleted(100))
  }
}
