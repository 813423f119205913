package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration: every table must load with
  * rows, and `events.ts` must come back as a session-zone TIMESTAMP no matter
  * which physical type the generator chose this round (TIMESTAMP(NANOS) →
  * BIGINT legacy path, timestamp[us] → TIMESTAMP_NTZ cast path, or a native
  * TIMESTAMP). A schema drift then fails HERE by name instead of as nine
  * opaque gate drops.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  // both driver-refreshed SFs the gates run on — a partial regeneration
  // that only touched one dir should still fail here by name
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("every testdata table loads with rows at every gated SF") {
    for (d <- sfDirs; t <- Tables.names)
      assert(Tables.load(spark, d, t).count() > 0, s"table $d/$t is empty")
  }

  test("events.ts is a timestamp after loading, whatever the file stores") {
    for (d <- sfDirs) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType === TimestampType, s"at $d")
      // sane instant range: the generator stamps recent epochs, not 1970/2262
      val bounds = ev.agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi")).head()
      assert(bounds.getLong(0) > 1000000000L * 1000000L,   // after 2001
        s"$d ts lower bound ${bounds.getLong(0)} looks mis-scaled")
      assert(bounds.getLong(1) < 4102444800L * 1000000L,   // before 2100
        s"$d ts upper bound ${bounds.getLong(1)} looks mis-scaled")
    }
  }

  test("legacy nanos-as-long events file still converts exactly") {
    import spark.implicits._
    // A BIGINT ts column is byte-for-byte what the nanosAsLong legacy conf
    // hands the loader for a TIMESTAMP(NANOS) file, so writing Long nanos
    // exercises the exact same LongType branch.
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos-ev").toString
    val nanos = 1700000000L * 1000000000L + 123456789L // 2023-11-14, odd ns
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    // exact integer division: micros = nanos div 1000, no double round-trip
    assert(ev.select(unix_micros(col("ts"))).head().getLong(0)
      === nanos / 1000L)
  }
}
