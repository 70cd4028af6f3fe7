package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Loader-robustness specs: the driver regenerates the test parquet between
  * rounds and has already shipped `events.ts` in two different physical
  * layouts (TIMESTAMP(NANOS) that Spark only reads as a raw long, and
  * timestamp[us] that surfaces as NTZ) — the r8 regeneration silently broke
  * 12 of 75 oracle queries through exactly this. These cases pin
  * [[Tables.events]]'s contract: whatever the file contains, `ts` comes out
  * as session-zone TimestampType at microsecond resolution.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val micros = 1723600000123456L // 2024-08-14 02:26:40.123456 UTC

  private def writeAndLoad(writeTs: org.apache.spark.sql.Column): java.sql.Timestamp = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-events").toString
    Seq((1L, "click")).toDF("event_id", "kind")
      .withColumn("ts", writeTs)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val loaded = Tables.events(spark, tmp)
    assert(loaded.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"ts must load as TimestampType, got ${loaded.schema("ts").dataType}")
    loaded.select(col("ts")).head().getTimestamp(0)
  }

  private def epochMicros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("events adapts a long-nanos ts column (TIMESTAMP(NANOS) layout)") {
    assert(epochMicros(writeAndLoad(lit(micros * 1000L))) == micros)
  }

  test("events passes through a session-zone timestamp ts column") {
    assert(epochMicros(writeAndLoad(timestamp_micros(lit(micros)))) == micros)
  }

  test("embeddings pins the vector element type to float across layouts") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    for (cast <- Seq("array<float>", "array<double>")) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-emb").toString
      Seq((1L, Seq(0.25, -0.5, 1.0), 0))
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast(cast))
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      val loaded = Tables.embeddings(spark, tmp)
      assert(loaded.schema("embedding").dataType ==
        ArrayType(FloatType, containsNull = true) ||
        loaded.schema("embedding").dataType ==
        ArrayType(FloatType, containsNull = false),
        s"layout $cast loaded as ${loaded.schema("embedding").dataType}")
      // the getSeq[Float] consumer path (query-vector lookup, IVF build)
      assert(loaded.head().getSeq[Float](1) == Seq(0.25f, -0.5f, 1.0f))
    }
  }

  test("events casts an NTZ ts column (timestamp[us] without zone metadata)") {
    // the timestamp[us] layout the r8 regeneration shipped reads back as
    // TIMESTAMP_NTZ; the session zone is UTC, so the wall-clock
    // reinterpretation is value-preserving
    assert(epochMicros(writeAndLoad(
      timestamp_micros(lit(micros)).cast("timestamp_ntz"))) == micros)
  }
}
