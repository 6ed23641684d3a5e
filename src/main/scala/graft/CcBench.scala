package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the connected-components two-tier crossover
  * (Dedup.connectedComponents): exact single-partition union-find vs
  * distributed min-label propagation with pointer jumping.
  *
  * The tier gate is `spark.graft.cc.localMaxEdges`; this main measures
  * where the crossover actually sits so the default is a number from a
  * run, not a guess. Each tier is forced through the PUBLIC entry point
  * by flipping the gate (Long.MaxValue -> union-find; 0 -> iterative),
  * so the timed path is exactly what production queries execute.
  *
  * Synthetic graph: chain components of 8 nodes (7 edges) — diameter 7
  * exercises >1 pointer-jumping round, and the ~n/7 distinct components
  * keep the union-find's parent map at realistic (near-dup family) load
  * rather than one giant component that path-compresses trivially.
  *
  * Usage: SPARK_DRIVER_MEM=32g sbt "runMain graft.CcBench [edgeCounts...]"
  * Results are recorded in PLANS.md ("CC crossover") and in the
  * connectedComponents scaladoc.
  */
object CcBench {
  private val ChainNodes = 8L // nodes per chain component => 7 edges each

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(5000000L, 10000000L, 20000000L, 40000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    sizes.foreach { nEdges0 =>
      // k-th chain contributes edges (k*8+j, k*8+j+1) for j in [0,6];
      // rounded down to whole chains so the checks below stay exact
      val epc = ChainNodes - 1
      val nEdges = nEdges0 - nEdges0 % epc
      val pairs = spark.range(nEdges)
        .select(
          ((col("id") / epc).cast("long") * ChainNodes + pmod(col("id"), lit(epc))).as("n"))
        .withColumn("m", col("n") + 1L)
        .repartition(32)
        .localCheckpoint()

      def run(tier: String, gate: Long): Double = {
        spark.conf.set("spark.graft.cc.localMaxEdges", gate.toString)
        val t0 = System.nanoTime()
        val res = graft.operators.Dedup.connectedComponents(pairs)
        // force the full labeling AND sanity-check it: every chain's label is
        // its min node id, so sum(lab) over 8 nodes = 8 * (k * 8)
        val row = res.agg(count(lit(1)).as("nodes"), sum(col("lab")).as("labsum")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        val comps = nEdges / epc
        val expNodes = comps * ChainNodes
        val expSum = ChainNodes * ChainNodes * comps * (comps - 1) / 2
        require(row.getLong(0) == expNodes, s"$tier nodes ${row.getLong(0)} != $expNodes")
        require(row.getLong(1) == expSum, s"$tier labsum ${row.getLong(1)} != $expSum")
        sec
      }

      // min-of-2 per tier to suppress warmup/GC jitter
      val uf = Seq(run("unionFind", Long.MaxValue), run("unionFind", Long.MaxValue)).min
      val it = Seq(run("iterative", 0L), run("iterative", 0L)).min
      println(f"""{"edges":$nEdges,"unionFindSec":$uf%.2f,"iterativeSec":$it%.2f}""")
    }
    spark.stop()
  }
}
