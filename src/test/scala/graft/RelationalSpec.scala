package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-upsert semantics (J2/S7) and the idempotency anti-join gate (J1) on
  * literal frames, plus the reference's core invariant: applying the same
  * upsert twice must equal applying it once.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "tag", "v")
  private def source = Seq((2L, "B", 99.0), (4L, "d", 40.0))
    .toDF("id", "tag", "v")

  test("mergeUpsert: matched rows update, unmatched insert, rest survive") {
    val out = Relational.mergeUpsert(target, source, "id")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeUpsert: a NULL source value on a matched row overwrites the target") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("tag", StringType),
      StructField("v", DoubleType)))
    val src = s.createDataFrame(
      java.util.Arrays.asList(Row(2L, null, 7.0)), schema)
    val out = Relational.mergeUpsert(target, src, "id")
      .filter(col("id") === 2L).collect()(0)
    assert(out.isNullAt(1) && out.getDouble(2) == 7.0) // tag nulled, not kept
  }

  test("mergeUpsert is idempotent: applying the same source twice == once") {
    val once = Relational.mergeUpsert(target, source, "id")
    val twice = Relational.mergeUpsert(once, source, "id")
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("anti-join gate: already-ingested keys are skipped (J1)") {
    val log = Seq((2L, "f2"), (3L, "f3")).toDF("id", "filename")
    val incoming = Seq((1L, "f1"), (2L, "f2"), (4L, "f4")).toDF("id", "filename")
    val fresh = incoming.join(log, Seq("id", "filename"), "left_anti")
    assert(fresh.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // running the gate twice changes nothing
    val again = fresh.join(log, Seq("id", "filename"), "left_anti")
    assert(again.count() == fresh.count())
  }

  test("top-k plans as TakeOrderedAndProject (no global sort at scale)") {
    val plan = Relational.topK(s, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("star join broadcasts the small dimensions") {
    val plan = Relational.joinRevenue(s, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
  }
}
