package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests pinning the reference's exact cleaning semantics
  * (/root/reference/data_pipeline.py:372-377, :636-663, :383-395) on tiny
  * literal frames — including the day-first two-digit-year formats that are
  * deliberately NOT in the oracled queries (DuckDB's %y pivot differs).
  */
class CleaningSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  test("money clean: strip [$,] then cast (F1/F2)") {
    val df = Seq("$1,234.56", "$0.99", "12.00", "$1,000,000.01")
      .toDF("raw")
      .select(regexp_replace(col("raw"), "[$,]", "").cast("double").as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq ==
      Seq(1234.56, 0.99, 12.0, 1000000.01))
  }

  test("money clean: garbage becomes null, not an exception (ANSI off)") {
    val df = Seq("N/A", "", "$12.50").toDF("raw")
      .select(nullif(regexp_replace(col("raw"), "[$,]", ""), lit("")).cast("double").as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(None, None, Some(12.5)))
  }

  test("robust date parse: day-first multi-format with null-on-failure (F4)") {
    val parse = coalesce(
      to_date(col("raw"), "d/M/yyyy H:mm"),
      to_date(col("raw"), "d/M/yy H:mm"),
      to_date(col("raw"), "yyyy-MM-dd"))
    val df = Seq(
      "12/4/2025 20:46",  // day-first full year
      "12/4/25 20:46",    // day-first two-digit year (2000 pivot)
      "2025-04-12",       // ISO
      "31/12/1999 23:59", // unambiguous day-first
      "not a date"        // -> null (errors='coerce')
    ).toDF("raw").select(parse.cast("string").as("d"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq == Seq(
      Some("2025-04-12"), Some("2025-04-12"), Some("2025-04-12"),
      Some("1999-12-31"), None))
  }

  test("blank-row detection: ALL columns null (P3)") {
    val df = Seq[(Option[Double], Option[String])](
      (None, None), (Some(1.0), None), (None, Some("x")), (Some(2.0), Some("y")))
      .toDF("a", "b")
    val blank = col("a").isNull && col("b").isNull
    assert(df.filter(blank).count() == 1)
    assert(df.filter(!blank).count() == 3)
  }

  test("abs-if-negative == abs (F3/X1)") {
    val df = Seq(-5.5, 0.0, 3.25).toDF("v").select(abs(col("v")).as("a"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(5.5, 0.0, 3.25))
  }

  test("dead-letter split conserves rows: in == good + dead (C2/C3)") {
    val row = Cleaning.deadLetter(s, TestSpark.sf).collect()(0)
    val (nIn, nGood, nDead) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nIn == nGood + nDead)
    assert(nDead > 0, "fixture must exercise the dead-letter path")
  }

  test("flagship pipeline returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(s).count() > 0)
  }
}
