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
  * Env: SPARK_GRAFT_CC_TIERS=uf,it,tl (default all) selects tiers;
  * SPARK_GRAFT_CC_RUNS=N (default 2) sets the min-of-N repeat count —
  * both exist so long points can be split across bounded invocations.
  * SPARK_GRAFT_CC_SHAPE=chain (default) | dense picks the graph family:
  * chains (E ~ V, diameter 7 — the sparse adversary for contraction) or
  * dense ring components (512 nodes x degree 128 => E = 128V, diameter
  * <= 2 — the boilerplate-flood shape where per-partition contraction
  * should pay, since average degree 128 >> the 32 partitions).
  * Results are recorded in PLANS.md ("CC crossover") and in the
  * connectedComponents scaladoc.
  */
object CcBench {
  private val ChainNodes = 8L // nodes per chain component => 7 edges each
  private val DenseC = 512L   // nodes per dense component
  private val DenseD = 128L   // forward neighbors per node => E = 128 V

  def main(args: Array[String]): Unit = {
    val sizes =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(5000000L, 10000000L, 20000000L, 40000000L)
    val tiers = sys.env.getOrElse("SPARK_GRAFT_CC_TIERS", "uf,it,tl").split(",").toSet
    val runs = sys.env.getOrElse("SPARK_GRAFT_CC_RUNS", "2").toInt
    val shape = sys.env.getOrElse("SPARK_GRAFT_CC_SHAPE", "chain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    sizes.foreach { nEdges0 =>
      // chain: k-th chain contributes edges (k*8+j, k*8+j+1), j in [0,6];
      // dense: component c contributes (c*512+i, c*512+(i+d)%512) for
      // i in [0,511], d in [1,128]. Both rounded down to whole components
      // so the label checksum below stays exact.
      val epc = if (shape == "dense") DenseC * DenseD else ChainNodes - 1
      val nodesPerComp = if (shape == "dense") DenseC else ChainNodes
      val nEdges = nEdges0 - nEdges0 % epc
      val comps = nEdges / epc
      val pairs = (if (shape == "dense")
        spark.range(nEdges).select(
            (col("id") / epc).cast("long").as("c"),
            ((col("id") % epc) / DenseD).cast("long").as("i"),
            (pmod(col("id"), lit(DenseD)) + 1L).as("d"))
          .select((col("c") * DenseC + col("i")).as("n"),
            (col("c") * DenseC + pmod(col("i") + col("d"), lit(DenseC))).as("m"))
      else
        spark.range(nEdges).select(
            ((col("id") / epc).cast("long") * ChainNodes + pmod(col("id"), lit(epc))).as("n"))
          .withColumn("m", col("n") + 1L))
        .repartition(32)
        .localCheckpoint()

      def runVia(tier: String, cc: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        val res = cc(pairs)
        // force the full labeling AND sanity-check it: every component's
        // label is its min node id (c * nodesPerComp)
        val row = res.agg(count(lit(1)).as("nodes"), sum(col("lab")).as("labsum")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        val expNodes = comps * nodesPerComp
        val expSum = nodesPerComp * nodesPerComp * comps * (comps - 1) / 2
        require(row.getLong(0) == expNodes, s"$tier nodes ${row.getLong(0)} != $expNodes")
        require(row.getLong(1) == expSum, s"$tier labsum ${row.getLong(1)} != $expSum")
        sec
      }
      def run(tier: String, gate: Long): Double = runVia(tier, { p =>
        spark.conf.set("spark.graft.cc.localMaxEdges", gate.toString)
        graft.operators.Dedup.connectedComponents(p)
      })

      // min-of-N per tier to suppress warmup/GC jitter
      def minOf(f: => Double): Double = Seq.fill(runs)(f).min
      val parts = Seq.newBuilder[String]
      if (tiers("uf"))
        parts += f""""unionFindSec":${minOf(run("unionFind", Long.MaxValue))}%.2f"""
      if (tiers("it"))
        parts += f""""iterativeSec":${minOf(run("iterative", 0L))}%.2f"""
      if (tiers("tl")) // mid-tier: per-partition contraction + single-partition finish
        parts += f""""twoLevelSec":${minOf(runVia("twoLevel", graft.operators.Dedup.ccTwoLevel))}%.2f"""
      println(s"""{"edges":$nEdges,${parts.result().mkString(",")}}""")
    }
    spark.stop()
  }
}
