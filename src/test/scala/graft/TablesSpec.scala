package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.model.Tables

/** Tables.events must yield ONE generation-independent schema
  * (`ts TIMESTAMP`) from every parquet physical type the driver has
  * shipped — the r07 break was exactly a consumer seeing TIMESTAMP_NTZ
  * from one generation and raw Long nanos from another.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // events at 2024-01-01 00:10:00 and 02:30:00 UTC, as epoch micros
  private val micros = Seq(600L, 9000L).map(s => (1704067200L + s) * 1000000L)

  private def checkHours(ev: org.apache.spark.sql.DataFrame): Unit = {
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TIMESTAMP, got ${ev.schema("ts").dataType}")
    // the q30 shape: formatted hour buckets identical whichever physical
    // type the file shipped (session TZ pinned UTC)
    val hours = ev.select(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("h"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(hours == Seq("2024-01-01 00:00:00", "2024-01-01 02:00:00"))
  }

  test("events normalizes nanos-as-Long parquet to TIMESTAMP") {
    val dir = Files.createTempDirectory("graft-tables").toString
    // a raw Long ts column stands in for the nanos generation — the
    // legacy nanosAsLong conf surfaces TIMESTAMP(NANOS) as exactly this
    micros.map(m => (m * 1000L, 1L, "click", 1.0, "{}"))
      .toDF("ts", "event_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    checkHours(Tables.events(spark, dir))
  }

  test("events normalizes TIMESTAMP_NTZ parquet to TIMESTAMP (q81 shape)") {
    val dir = Files.createTempDirectory("graft-tables").toString
    micros.map(m => (m, 1L, "click", 1.0, "{}"))
      .toDF("us", "event_id", "event_type", "value", "props")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("event_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    checkHours(ev)
    // and the q81 shape must ANALYZE AND RUN (the r07 break threw at
    // plan time): interval join whose bounds derive from the events ts
    val iv = ev.select(col("ts").as("s0"),
      (col("ts") + expr("INTERVAL 1 MINUTE")).as("s1"))
    val joined = graft.ops.Relational.intervalJoin(
      ev.select(col("event_id"), col("ts")), "ts", iv, "s0", "s1")
    assert(joined.count() == 2) // each event covered by its own interval
  }
}
