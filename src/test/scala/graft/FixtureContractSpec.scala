package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary for EVERY table (TsContractSpec's generalization):
  * the round-8 regression was the driver silently re-encoding `events.ts`,
  * which surfaced as 16 analysis-time failures in the driver's report
  * instead of one named test failure here. Each column asserts the set of
  * Spark-read types the engine actually handles; a driver-side fixture
  * regeneration that drifts outside the set fails THIS spec with the
  * table.column spelled out, before any query dies downstream.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val eventTime: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType) // Engine.tsMicros dispatch
  private val fixtureDate: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral),
    "customer" -> Map("c_custkey" -> integral, "c_name" -> Set(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> integral, "s_name" -> Set(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> integral, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> integral, "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> fixtureDate, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> fixtureDate),
    "events" -> Map("event_id" -> integral, "ts" -> eventTime,
      "user_id" -> integral, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Map("vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> integral),
  )

  contract.foreach { case (tbl, cols) =>
    test(s"fixture contract: $tbl columns read as engine-supported types") {
      val schema = Engine.table(s, TestSpark.sf, tbl).schema
      cols.foreach { case (name, allowed) =>
        val field = schema.find(_.name == name)
        assert(field.isDefined,
          s"$tbl.$name missing — the driver changed the fixture layout; " +
            "update the engine AND this contract together")
        assert(allowed.contains(field.get.dataType),
          s"$tbl.$name read as ${field.get.dataType} (allowed: ${allowed.mkString(", ")}) " +
            "— the driver re-encoded the fixture; extend the engine's " +
            "handling (as Engine.tsMicros does for ts) before widening this set")
      }
    }
  }
}
