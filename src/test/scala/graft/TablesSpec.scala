package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader must produce identical TimestampType rows for every
  * physical layout the fixture has shipped in (reference data model:
  * stream_blocks timestamps): legacy parquet int64-nanos read via the
  * nanosAsLong flag, native timestamp (isAdjustedToUTC=true), and
  * TIMESTAMP_NTZ (isAdjustedToUTC=false — what the 2026-08-13 regenerated
  * testdata loads as). Round-6 lesson: an unconditional layout assumption
  * broke 21 queries at analysis when the fixture changed.
  */
class TablesSpec extends SparkSpec {

  private def writeAndLoad(writer: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    dir.deleteOnExit()
    writer(dir.getAbsolutePath)
    Tables.events(spark, dir.getAbsolutePath)
  }

  // one µs-precision instant, away from any DST/epoch edge
  private val micros = 1700000000123456L

  test("real fixture: events.ts loads as TimestampType at every SF") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val df = Tables.events(spark, sf(d))
      assert(df.schema("ts").dataType == TimestampType,
        s"$d: expected TimestampType, got ${df.schema("ts").dataType}")
      assert(df.limit(1).count() == 1)
    }
  }

  test("legacy int64-nanos layout converts losslessly to microseconds") {
    import spark.implicits._
    val df = writeAndLoad { path =>
      Seq((1L, micros * 1000L)).toDF("event_id", "ts")
        .write.mode("overwrite").parquet(s"$path/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == micros, s"expected $micros, got $got")
  }

  test("native TimestampType layout passes through unchanged") {
    import spark.implicits._
    val df = writeAndLoad { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
        .write.mode("overwrite").parquet(s"$path/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == micros, s"expected $micros, got $got")
  }

  test("unknown ts layout fails loudly at load instead of null-casting") {
    import spark.implicits._
    val e = intercept[IllegalStateException] {
      writeAndLoad { path =>
        Seq((1L, "2026-08-13T00:00:00Z")).toDF("event_id", "ts")
          .write.mode("overwrite").parquet(s"$path/events.parquet")
      }
    }
    assert(e.getMessage.contains("unexpected events.ts type"))
  }

  test("TIMESTAMP_NTZ layout normalizes to TimestampType with equal micros") {
    import spark.implicits._
    val df = writeAndLoad { path =>
      Seq((1L, micros)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.mode("overwrite").parquet(s"$path/events.parquet")
    }
    assert(df.schema("ts").dataType == TimestampType)
    // UTC session: the NTZ->LTZ normalization is value-identity on micros
    val got = df.select(unix_micros(col("ts"))).as[Long].head()
    assert(got == micros, s"expected $micros, got $got")
  }
}
