package graft

import org.apache.spark.sql.SparkSession

/** The bounded-heap half of the state-store decision table (PLANS r14;
  * VERDICT r14 item 5). The wall-clock half is measured: the on-heap
  * memory provider is ~2.5x FASTER than RocksDB even at 1e7 state keys.
  * The half that justifies keeping RocksDB as the engine default was,
  * until this rig, argued from heap math alone: the memory provider
  * retains N versions of the whole store ON-HEAP, so at production
  * executor heaps it should OOM where RocksDB (native memory, spill to
  * disk) completes. This main turns that argument into a measurement:
  * run ONE state-heavy streaming rig on the 100x state rung (~1e7 dedup
  * keys) under ONE provider in THIS JVM — launched as a deliberately
  * SMALL-HEAP child (e.g. `java -Xmx4g ... graft.StateHeapRig memory`),
  * the 4 GiB-executor shape the default is chosen for. A driver OOM
  * here is a RESULT, not a harness failure — which is also why this
  * runs in a child JVM and never inside the ScaleRung sweep (a fatal
  * error degrades the parent JVM's subsequent timings; ADVICE r14).
  *
  * Prints exactly one result line:
  *   STATEHEAP <query> <provider> OK <sec>      — completed
  *   STATEHEAP <query> <provider> FAIL <class>  — died (OOM expected
  *                                                 for `memory` at 4g)
  * Exit code 0 either way; the orchestrating shell treats a vanished
  * child (hard OOM kill before the print) as FAIL too.
  */
object StateHeapRig {
  def main(args: Array[String]): Unit = {
    val provider = args.headOption.getOrElse("memory")
    val name = if (args.length > 1) args(1) else "q87_stream_dedup"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    ScaleRung.ensureStateRung(spark)
    spark.conf.set("spark.graft.stateStore.provider", provider)
    val t0 = System.nanoTime()
    try {
      SparkEntry.queries(name)(spark, ScaleRung.state100Dir)
        .write.format("noop").mode("overwrite").save()
      println(f"STATEHEAP $name $provider OK ${(System.nanoTime() - t0) / 1e9}%.2f")
    } catch {
      case e: Throwable =>
        println(s"STATEHEAP $name $provider FAIL ${e.getClass.getName}")
    }
    spark.stop()
  }
}
