package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `events.ts` physical-encoding contract so a driver-side fixture
  * regeneration can never silently break the event-time surface again
  * (round 8: TIMESTAMP(NANOS)-as-long fixtures became TIMESTAMP(MICROS) and
  * 16 queries died at analysis). [[Engine.tsMicros]] must derive identical
  * epoch-micros from every encoding the parquet reader can produce, and the
  * live fixture must resolve through it.
  */
class TsContractSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // one instant, three encodings: 2026-03-01 12:34:56.789012 UTC
  private val wantUs = 1772368496789012L

  test("tsMicros: LongType epoch-nanos fixture (legacy) divides to micros") {
    val df = s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(Long.box(wantUs * 1000L + 999L))),
      StructType(Seq(StructField("ts", LongType))))
    val got = df.select(Engine.tsMicros(df).as("us")).head().getLong(0)
    assert(got === wantUs, "nano-long fixtures must truncate to micros")
  }

  test("tsMicros: TIMESTAMP_NTZ micros fixture (current) passes through exactly") {
    val df = s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        java.time.LocalDateTime.ofEpochSecond(
          wantUs / 1000000L, (wantUs % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    val got = df.select(Engine.tsMicros(df).as("us")).head().getLong(0)
    assert(got === wantUs, "NTZ micros fixtures must pass through unchanged (UTC session)")
  }

  test("tsMicros: TimestampType column passes through exactly") {
    val df = s.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          wantUs / 1000000L, (wantUs % 1000000L) * 1000L)))),
      StructType(Seq(StructField("ts", TimestampType))))
    val got = df.select(Engine.tsMicros(df).as("us")).head().getLong(0)
    assert(got === wantUs)
  }

  test("tsMicros: unsupported ts type fails loudly, not at analysis depth") {
    val df = s.range(1).select(col("id").cast("string").as("ts"))
    val e = intercept[IllegalArgumentException](Engine.tsMicros(df))
    assert(e.getMessage.contains("unsupported type"),
      "a third encoding flip must produce a named error, not DATATYPE_MISMATCH")
  }

  test("canary: the live events fixture resolves through tsMicros") {
    val ev = Engine.table(s, TestSpark.sf, "events")
    val mx = ev.agg(max(Engine.tsMicros(ev))).head().getLong(0)
    // sanity window: 2001..2286 in epoch-micros — catches a units mixup
    // (nanos read as micros would land in 1971, micros as nanos in 10^4 AD)
    assert(mx > 1000000000000000L && mx < 10000000000000000L,
      s"events.ts derived micros out of range ($mx): the driver likely " +
        "changed the fixture encoding again — extend Engine.tsMicros")
  }
}
