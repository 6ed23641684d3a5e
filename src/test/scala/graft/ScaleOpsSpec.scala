package graft

import graft.Engine._
import graft.operators.ScaleOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("bloom prefilter prunes fact rows and loses no true matches") {
    val dir = TestSpark.sf
    val dim = table(s, dir, "part").filter(col("p_size") <= 5).select(col("p_partkey"))
    val fact = table(s, dir, "lineitem").select(col("l_partkey"))
    // rebuild just the prefilter half of q108 to measure its selectivity
    val bloom = dim
      .select(col("p_partkey"), explode(array((0 until 3).map(lit): _*)).as("j"))
      .withColumn("pos",
        pmod(md5Long(concat(col("p_partkey").cast("string"), lit("#"), col("j").cast("string"))), lit(4096)))
      .select(expr("CAST(pos div 64 AS INT)").as("w"),
              expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("mask"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bm"))
    val mightContain = (0 until 3).map { j =>
      val pos = s"pmod(graft_md5_60(concat(CAST(l_partkey AS STRING), '#', '$j')), 4096)"
      s"(coalesce(element_at(bm, CAST($pos div 64 AS INT)), 0L) & shiftleft(1L, CAST($pos % 64 AS INT))) != 0"
    }.mkString(" AND ")
    val passed = fact.crossJoin(broadcast(bloom)).filter(expr(mightContain)).cache()
    val total = fact.count()
    val kept = passed.count()
    assert(kept < total, s"bloom prefilter must prune ($kept of $total kept)")
    // no false negatives: every fact row with a true dim match passes the bloom
    val trueMatches = fact.join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
    val lost = trueMatches.join(passed.select(col("l_partkey")), Seq("l_partkey"), "left_anti")
    assert(lost.count() == 0, "bloom filter produced a false negative")
    passed.unpersist()
  }

  test("q108 bloom-join result equals the plain exact semi-join") {
    val dir = TestSpark.sf
    val withBloom = ScaleOps.bloomJoin(s, dir)
    val dim = table(s, dir, "part").filter(col("p_size") <= 5).select(col("p_partkey"))
    val plain = table(s, dir, "lineitem")
      .join(dim, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    assert(withBloom.exceptAll(plain).count() == 0 && plain.exceptAll(withBloom).count() == 0)
  }

  test("shuffleExact mode: bloom probe sits below the exact join's shuffle") {
    s.conf.set("spark.graft.bloomJoin.shuffleExact", "true")
    try {
      val df = ScaleOps.bloomJoin(s, TestSpark.sf)
      val plan = df.queryExecution.executedPlan.toString
      // the exact join must be the shuffle (sort-merge) form, and the bloom
      // probe (the BroadcastNestedLoopJoin with the bit-mask condition)
      // must appear BELOW it — i.e. the bloom prunes the shuffle input
      val smj = plan.indexOf("SortMergeJoin")
      val bnlj = plan.indexOf("BroadcastNestedLoopJoin")
      assert(smj >= 0, s"expected a sort-merge exact join in:\n$plan")
      assert(bnlj > smj, "bloom probe must be inside the exact join's shuffle input")
      // and results are still identical to the broadcast form
      val shuffleRows = df.collect().map(_.toString).sorted
      s.conf.unset("spark.graft.bloomJoin.shuffleExact")
      s.conf.unset("spark.sql.optimizer.excludedRules")
      val broadcastRows = ScaleOps.bloomJoin(s, TestSpark.sf).collect().map(_.toString).sorted
      assert(shuffleRows.sameElements(broadcastRows))
    } finally {
      s.conf.unset("spark.graft.bloomJoin.shuffleExact")
      s.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("count-min estimates never underestimate and dominate exact counts") {
    val hh = ScaleOps.heavyHitters(s, TestSpark.sf).cache()
    assert(hh.count() == 20)
    assert(hh.filter(!col("no_underestimate")).count() == 0)
    assert(hh.filter(col("cms_n") < col("exact_n")).count() == 0)
    hh.unpersist()
  }

  test("chunking covers every token: chunk count formula and overlap accounting hold") {
    val dir = TestSpark.sf
    val perLang = ScaleOps.chunkDocs(s, dir).cache()
    val docs = table(s, dir, "documents")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("expect_chunks", expr("(n - 1) div 24 + 1"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("total_tokens"), sum(col("expect_chunks")).as("expect_chunks"))
    val j = perLang.join(docs, "lang").cache()
    // stride 24 < window 32, so chunks overlap: summed chunk tokens must
    // cover every token at least once (>= total), and the chunk count per
    // doc is exactly (n-1) div 24 + 1
    assert(j.filter(col("chunk_tokens") < col("total_tokens")).count() == 0)
    assert(j.filter(col("n_chunks") =!= col("expect_chunks")).count() == 0)
    j.unpersist(); perLang.unpersist()
  }

  test("snapshot diff statuses match directly-computed expectations") {
    val dir = TestSpark.sf
    val d = table(s, dir, "documents").select(col("doc_id")).cache()
    val removed = d.filter(col("doc_id") % 17 === 3).count()
    val added = d.filter(col("doc_id") % 29 === 5).count()
    val changed = d.filter(col("doc_id") % 13 === 4 && col("doc_id") % 17 =!= 3).count()
    val unchanged = d.count() - removed - changed
    val got = ScaleOps.snapshotDiff(s, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) == removed)
    assert(got.getOrElse("added", 0L) == added)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.getOrElse("unchanged", 0L) == unchanged)
    d.unpersist()
  }

  test("source cap keeps at most 15 per source and accounts for every doc") {
    val r = ScaleOps.sourceCap(s, TestSpark.sf).cache()
    assert(r.filter(col("n_kept") > 15).count() == 0)
    assert(r.filter(col("n_kept") + col("n_dropped") =!= col("n_docs")).count() == 0)
    r.unpersist()
  }

  test("importance resampling upweights long documents") {
    val dir = TestSpark.sf
    val d = table(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("kept",
        pmod(md5Long(col("doc_id").cast("string")), lit(1000)) < least(col("n_tokens"), lit(80L)) * 10L)
      .cache()
    val meanKept = d.filter(col("kept")).agg(avg("n_tokens")).collect()(0).getDouble(0)
    val meanDropped = d.filter(!col("kept")).agg(avg("n_tokens")).collect()(0).getDouble(0)
    assert(meanKept > meanDropped,
      s"hash lottery must favor long docs (kept avg $meanKept vs dropped $meanDropped)")
    // and the rollup agrees with the per-doc predicate
    val rollup = ScaleOps.importanceResample(s, dir)
      .agg(sum("n_kept")).collect()(0).getLong(0)
    assert(rollup == d.filter(col("kept")).count())
    d.unpersist()
  }

  test("train/val/test split partitions every stratum exactly") {
    val dir = TestSpark.sf
    val r = ScaleOps.trainSplit(s, dir).cache()
    // the three splits partition each language: counts sum to stratum size
    val perLang = r.groupBy("lang").agg(sum("n_docs").as("total"))
    val docs = table(s, dir, "documents").groupBy("lang").count()
    val j = perLang.join(docs, "lang")
    assert(j.filter(col("total") =!= col("count")).count() == 0)
    // every (lang, split) cell is disjoint by construction (one bucket per
    // doc); spot the ratio: train strictly dominates val and test
    val bySplit = r.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
    r.unpersist()
  }

  test("cdc apply: live keys = inserts minus deletes; deleted keys never survive") {
    val dir = TestSpark.sf
    val orders = table(s, dir, "orders")
    val total = orders.count()
    val deleted = orders.filter(col("o_orderkey") % 5 === 0).count()
    val live = ScaleOps.cdcApply(s, dir).agg(sum("n_live")).collect()(0).getLong(0)
    assert(live == total - deleted)
  }

  test("scd2 history: per-key version/current accounting is exact") {
    val dir = TestSpark.sf
    val orders = table(s, dir, "orders")
    val total = orders.count()
    val upd = orders.filter(col("o_orderkey") % 3 === 0).count()
    val del = orders.filter(col("o_orderkey") % 5 === 0).count()
    val r = ScaleOps.scd2History(s, dir)
      .agg(sum("n_versions"), sum("n_current"), sum("closed_span")).collect()(0)
    assert(r.getLong(0) == total + upd + del, "one version per change event")
    assert(r.getLong(1) == total - del, "current = keys whose last op is not D")
    // closed interval spans: each non-final version closes at the next seq
    val expectedSpan = orders
      .filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 5 === 0)
      .select(when(col("o_orderkey") % 3 === 0 && col("o_orderkey") % 5 === 0, 2L)
        .when(col("o_orderkey") % 3 === 0, 1L).otherwise(2L).as("sp"))
      .agg(sum("sp")).collect()(0).getLong(0)
    assert(r.getLong(2) == expectedSpan)
  }

  test("bigram lift is scale-free: doubling the corpus leaves lift_milli unchanged") {
    // lift = c_xy * N / (c_x * c_y): doubling every count cancels exactly —
    // pin that the integer formula preserves this (ranking is intrinsic,
    // not an artifact of corpus size)
    import s.implicits._
    val rows = ScaleOps.bigramLift(s, TestSpark.sf).collect()
    assert(rows.length == 15)
    assert(rows.forall(_.getLong(3) > 0))
    // top bigram count is the max: ordering is by c_xy desc
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q142 rollup plan reads ONLY the sketch store, never the fact table") {
    // the operator's reason to exist: after the build, rollups must not
    // rescan orders — prove it at the PLAN level, not by timing
    val df = ScaleOps.sketchStore(s, TestSpark.sf) // ensures the store exists
    val scanned = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned.nonEmpty, "rollup must scan the blob store")
    assert(scanned.forall(_.contains("graft_index/hll_")),
      s"rollup must scan only sketch blobs, scanned: $scanned")
    assert(!scanned.exists(_.contains("orders.parquet")),
      "rollup must never touch the fact table")
  }

  test("q146 pruned z-scan pushes a partition filter and reads a fraction of the files") {
    val row = ScaleOps.zorderScan(s, TestSpark.sf).collect()(0) // builds the lake if absent
    assert(row.getAs[Boolean]("pruned_equals_full"),
      "pruned scan must return exactly the full scan's rectangle rows")
    // the 32x32 rectangle at (96..127, 64..95) covers exactly z-buckets 52..55
    val buckets = graft.sources.Lake.zBuckets(96, 127, 64, 95)
    assert(buckets == Seq(52L, 53L, 54L, 55L), s"bucket cover: $buckets")
    val lakePath = "target/tmp/zlake_" + TestSpark.sf.replaceAll("[^A-Za-z0-9.]+", "_")
    val pruned = graft.sources.Lake.readZOrdered(s, lakePath, buckets)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("zfile"),
      s"bucket cover must land as a partition filter, plan:\n$plan")
    val readFiles = pruned.select(input_file_name().as("fn")).distinct().count()
    val allFiles = s.read.parquet(lakePath)
      .select(input_file_name().as("fn")).distinct().count()
    assert(readFiles <= buckets.length && readFiles < allFiles,
      s"pruning must skip files: read $readFiles of $allFiles")
  }

  test("q252 two-phase realization: bit-equal to the single window on a mega-source flood, prefilter bites, starved margin escalates to the same answer") {
    import graft.operators.ScaleOps
    import s.implicits._
    // a deliberately skewed corpus: one source with 5000 docs would land
    // its whole row set on one rank-window reducer in the single-window
    // form; the 1/10 budget caps it hard, so the prefilter must cut most
    // of its rows before the window
    val dir = s"target/tmp/floodmix_${java.util.UUID.randomUUID().toString.take(8)}"
    val mega = (1 to 5000).map(i =>
      (s"m$i", "mega", Seq.fill(20)(s"tok$i").mkString(" ")))
    val small = for (k <- 1 to 10; i <- 1 to 20)
      yield (s"s${k}_$i", s"small$k", Seq.fill(20)("w").mkString(" "))
    (mega ++ small).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val exact = rows(ScaleOps.realizeAt(s, dir, 1L, 10L))
    assert(rows(ScaleOps.cappedRealizeM(s, dir, 2L)) == exact,
      "two-phase must reproduce the single-window semantics bit-for-bit")
    // the mechanism: margin-2 threshold keeps ~2x alloc/c of the mega
    // source — recompute the phase-1 formula and count survivors
    val af = ScaleOps.waterfillAlloc(s, dir, 1L, 10L)
      .filter(col("source") === "mega").collect().head
    val (c, alloc) = (af.getAs[Long]("tokens"), af.getAs[Long]("alloc"))
    assert(alloc * 2 < c, s"flood setup: mega must be hard-capped ($alloc vs $c)")
    val t = ((BigInt(1) << 60) * 2L * alloc / c).toLong
    val survivors = table(s, dir, "documents")
      .filter(col("source") === "mega")
      .filter(md5Long(col("doc_id").cast("string")) < t).count()
    assert(survivors < 1500,
      s"prefilter must cut most of the mega source's rows, kept $survivors of 5000")
    // a starved margin forces the escalation path; the answer must not move
    assert(rows(ScaleOps.cappedRealizeM(s, dir, 1L)) == exact,
      "escalated thresholds must converge to the same exact answer")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  // ---- mixing-family skew-proofing (round 18): naive single-window
  // references the sharded/prefiltered implementations must reproduce ----

  private def tkc = expr("size(filter(split(text, ' '), x -> x != ''))").cast("long")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** q250's ORIGINAL one-window-per-source realization — the semantics
    * [[ScaleOps.realizeAt]]'s sharded prefix must reproduce bit-for-bit. */
  private def naiveRealize(dir: String, num: Long, den: Long) = {
    import org.apache.spark.sql.expressions.Window
    val alloc = ScaleOps.waterfillAlloc(s, dir, num, den)
      .select(col("source"), col("alloc"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5Long(col("doc_id").cast("string")), col("doc_id"))
    table(s, dir, "documents")
      .select(col("doc_id"), col("source"), tkc.as("tk"))
      .withColumn("prefix",
        sum(col("tk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("kept", col("prefix") - col("tk") < col("alloc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("kept"), col("tk")).otherwise(0L)).as("kept_tokens"),
           min(col("alloc")).as("alloc"))
  }

  /** q255's ORIGINAL single-window quality fill (kept-average invariant in
    * the widened decimal form the production query now reports). */
  private def naiveQualityFill(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val alloc = ScaleOps.waterfillAlloc(s, dir, 1L, 10L)
      .select(col("source"), col("alloc"))
    val qb = graft.operators.TextOps.qualityPerDoc(s, dir)
      .select(col("doc_id"), col("bucket"))
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), tkc.as("tk"))
      .join(qb, Seq("doc_id"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("bucket").desc, md5Long(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("prefix",
        sum(col("tk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("kept", col("prefix") - col("tk") < col("alloc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("kept"), col("tk")).otherwise(0L)).as("kept_tokens"),
           min(col("alloc")).as("alloc"),
           sum(when(col("kept"), col("bucket")).otherwise(0L)).as("kept_bucket_sum"),
           sum(col("bucket")).as("bucket_sum"))
      .withColumn("quality_gained",
        expr("CAST(kept_bucket_sum AS DECIMAL(38,0)) * CAST(n_docs AS DECIMAL(38,0)) >= " +
             "CAST(bucket_sum AS DECIMAL(38,0)) * CAST(n_kept AS DECIMAL(38,0))"))
  }

  /** q256's ORIGINAL single-window form over exact-dedup survivors. */
  private def naiveDedupMixture(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val marked = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), tkc.as("tk"), md5(col("text")).as("h"))
      .withColumn("is_dup", org.apache.spark.sql.functions.row_number().over(wd) > 1)
    val surv = marked.filter(!col("is_dup"))
    val cnts = surv.groupBy(col("source")).agg(sum(col("tk")).as("c"))
    val alloc = ScaleOps.waterfillFromCounts(cnts, 1L, 10L)
      .select(col("source"), col("alloc"))
    val dupes = marked.groupBy(col("source"))
      .agg(sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dupes"))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5Long(col("doc_id").cast("string")), col("doc_id"))
    surv
      .withColumn("prefix",
        sum(col("tk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("kept", col("prefix") - col("tk") < col("alloc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_surv"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("kept"), col("tk")).otherwise(0L)).as("kept_tokens"),
           min(col("alloc")).as("alloc"))
      .join(broadcast(dupes), Seq("source"))
  }

  private def writeDocs(rows: Seq[(String, String, String)]): String = {
    import s.implicits._
    val dir = s"target/tmp/mixflood_${java.util.UUID.randomUUID().toString.take(8)}"
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rmDir(dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("q250 sharded prefix sum is bit-equal to the single-window realization on a mega-source flood") {
    val mega = (1 to 3000).map(i =>
      (s"m$i", "mega", Seq.fill(20)(s"tok$i").mkString(" ")))
    val small = for (k <- 1 to 8; i <- 1 to 25)
      yield (s"s${k}_$i", s"small$k", Seq.fill(10)("w").mkString(" "))
    val dir = writeDocs(mega ++ small)
    // wide budget (19/20, q250's) AND tight budget: the sharding must be
    // exact at any ratio, since it replaces the window rather than
    // prefiltering it
    assert(rowsOf(ScaleOps.realizeAt(s, dir, 19L, 20L)) == rowsOf(naiveRealize(dir, 19L, 20L)),
      "sharded prefix must reproduce the single window at the wide budget")
    assert(rowsOf(ScaleOps.realizeAt(s, dir, 1L, 10L)) == rowsOf(naiveRealize(dir, 1L, 10L)),
      "sharded prefix must reproduce the single window at the tight budget")
    rmDir(dir)
  }

  test("q256 dedup-aware mixture: bit-equal to the single-window form on a mega flood; prefilter bites; dup-only source stays absent; starved margin converges") {
    // mega: 3000 unique docs + 1500 exact dups of its own first 1500; a
    // "shadow" source whose every doc duplicates a mega text (higher
    // doc_id => mega stays canonical => shadow has ZERO survivors and
    // must be absent from the output of both forms)
    val megaU = (1 to 3000).map(i =>
      (s"m$i", "mega", Seq.fill(20)(s"tok$i").mkString(" ")))
    val megaD = (1 to 1500).map(i =>
      (s"md$i", "mega", Seq.fill(20)(s"tok$i").mkString(" ")))
    val shadow = (1 to 20).map(i =>
      (s"zz$i", "shadow", Seq.fill(20)(s"tok$i").mkString(" ")))
    val small = for (k <- 1 to 10; i <- 1 to 20)
      yield (s"s${k}_$i", s"small$k", Seq.fill(20)(s"w${k}_$i").mkString(" "))
    val dir = writeDocs(megaU ++ megaD ++ shadow ++ small)
    val exact = rowsOf(naiveDedupMixture(dir))
    val got = ScaleOps.dedupMixture(s, dir)
    assert(rowsOf(got) == exact,
      "prefiltered dedup mixture must reproduce the single-window semantics bit-for-bit")
    assert(!got.collect().exists(_.getString(0) == "shadow"),
      "a fully-duplicated source has no survivors and must not appear")
    // the mechanism: margin-2 threshold keeps ~2x alloc/c of mega's
    // SURVIVORS — recompute the phase-1 formula over the survivor corpus
    val r = got.filter(col("source") === "mega").collect().head
    val (nSurv, alloc) = (r.getAs[Long]("n_surv"), r.getAs[Long]("alloc"))
    assert(nSurv == 3000L, s"mega survivor count: $nSurv")
    val c = 3000L * 20L
    assert(alloc * 2 < c, s"flood setup: mega must be hard-capped ($alloc vs $c)")
    val t = ((BigInt(1) << 60) * 2L * alloc / c).toLong
    val winInput = table(s, dir, "documents")
      .filter(col("source") === "mega")
      .filter(md5Long(col("doc_id").cast("string")) < t).count()
    assert(winInput < 1200,
      s"prefilter must cut most of mega's survivors before the window, kept $winInput of 3000")
    assert(rowsOf(ScaleOps.dedupMixtureM(s, dir, 1L)) == exact,
      "escalated thresholds must converge to the same exact answer")
    rmDir(dir)
  }

  test("q255 quality fill: bit-equal to the single-window form on a mega flood; boundary-bucket prefilter cuts window input; starved margin converges") {
    // mega: 2500 high-quality docs (8-char words => bucket 7) + 2500
    // low-quality docs (single-char stopwords => bucket 0); the tight
    // budget's boundary lands INSIDE the high tier, so the whole low
    // tier must be dropped outright and the high tier thresholded
    val megaHi = (1 to 2500).map(i =>
      (s"h$i", "mega", Seq.fill(20)("abcdefgh").mkString(" ")))
    val megaLo = (1 to 2500).map(i =>
      (s"l$i", "mega", Seq.fill(20)("a").mkString(" ")))
    val small = for (k <- 1 to 10; i <- 1 to 20)
      yield (s"s${k}_$i", s"small$k", Seq.fill(20)("w").mkString(" "))
    val dir = writeDocs(megaHi ++ megaLo ++ small)
    val exact = rowsOf(naiveQualityFill(dir))
    val got = ScaleOps.qualityFill(s, dir)
    assert(rowsOf(got) == exact,
      "prefiltered quality fill must reproduce the single-window semantics bit-for-bit")
    // the mechanism: recompute the boundary plan for mega — alloc lands
    // inside the high tier, so window input is ~margin x alloc / 20 docs
    val r = got.filter(col("source") === "mega").collect().head
    val alloc = r.getAs[Long]("alloc")
    val hiMass = 2500L * 20L
    assert(alloc < hiMass, s"boundary must land inside the high tier ($alloc vs $hiMass)")
    val t = ((BigInt(1) << 60) * 2L * alloc / hiMass).toLong
    val qb = graft.operators.TextOps.qualityPerDoc(s, dir).select(col("doc_id"), col("bucket"))
    val winInput = table(s, dir, "documents").filter(col("source") === "mega")
      .join(qb, Seq("doc_id"))
      .filter(col("bucket") === 7L && md5Long(col("doc_id").cast("string")) < t)
      .count()
    assert(winInput < 1500,
      s"boundary prefilter must cut most of mega's rows, kept $winInput of 5000")
    // and nothing from the dropped low tier may be kept: kept tokens all
    // come from bucket-7 docs (every kept doc's bucket >= dropped's)
    assert(r.getAs[Long]("kept_bucket_sum") == 7L * r.getAs[Long]("n_kept"),
      "kept set must be drawn entirely from the top decile tier")
    assert(rowsOf(ScaleOps.qualityFillM(s, dir, 1L)) == exact,
      "escalated thresholds must converge to the same exact answer")
    rmDir(dir)
  }

  test("q255 boundary in the LOW tier: the whole high tier is kept outright, only the low tier is thresholded, still bit-equal") {
    // complement of the main flood (whose boundary lands INSIDE the top
    // tier with nothing above it): here the high tier's mass is well
    // under the allocation, so the prefilter must keep it OUTRIGHT and
    // threshold only the low tier against the residual
    val megaHi = (1 to 100).map(i =>
      (s"h$i", "mega", Seq.fill(20)("abcdefgh").mkString(" ")))
    val megaLo = (1 to 4900).map(i =>
      (s"l$i", "mega", Seq.fill(20)("a").mkString(" ")))
    val small = for (k <- 1 to 10; i <- 1 to 20)
      yield (s"s${k}_$i", s"small$k", Seq.fill(20)("w").mkString(" "))
    val dir = writeDocs(megaHi ++ megaLo ++ small)
    val exact = rowsOf(naiveQualityFill(dir))
    val got = ScaleOps.qualityFill(s, dir)
    assert(rowsOf(got) == exact,
      "low-tier boundary must still reproduce the single-window semantics bit-for-bit")
    val r = got.filter(col("source") === "mega").collect().head
    val (alloc, nKept, kbs) = (r.getAs[Long]("alloc"),
      r.getAs[Long]("n_kept"), r.getAs[Long]("kept_bucket_sum"))
    val hiMass = 100L * 20L
    assert(alloc > hiMass && alloc * 2 < 100000L,
      s"setup: boundary must land in the low tier ($alloc vs $hiMass)")
    // every high-tier doc is kept (they sort first and their mass is
    // under alloc), and the kept set extends into the low tier
    assert(nKept > 100L, s"kept set must cross into the low tier ($nKept)")
    assert(kbs == 7L * 100L + 0L * (nKept - 100L),
      "all 100 high-tier docs (bucket 7) kept outright, low-tier keeps at bucket 0")
    // the mechanism: low-tier window input ~ margin x rem of 4900 docs
    val rem = alloc - hiMass
    val t = ((BigInt(1) << 60) * 2L * rem / (4900L * 20L)).toLong
    val qb = graft.operators.TextOps.qualityPerDoc(s, dir).select(col("doc_id"), col("bucket"))
    val winInput = table(s, dir, "documents").filter(col("source") === "mega")
      .join(qb, Seq("doc_id"))
      .filter(col("bucket") === 0L && md5Long(col("doc_id").cast("string")) < t)
      .count() + 100L
    assert(winInput < 1500L,
      s"the low tier must be mostly cut before the window, input $winInput of 5000")
    rmDir(dir)
  }

  test("markDups: mega-DIGEST flood — bit-equal to the window form, no per-digest window in the plan, map-side partial agg bounds task input") {
    // the shape the r18 mega-SOURCE fixtures never covered (VERDICT r18
    // item 1): thousands of byte-copies of ONE text — one digest whose
    // whole row set the r18 row_number marking routed through a single
    // reducer. The groupBy+join-back marking must (a) stay bit-equal to
    // the window semantics, (b) carry no Window node, and (c) collapse
    // the flood map-side (partial_min) so no task holds the copy set.
    val flood = (1 to 4000).map(i =>
      (f"f$i%05d", "flood", "the exact same boilerplate page text"))
    val uniq = (1 to 50).map(i =>
      (s"u$i", "flood", Seq.fill(20)(s"fl$i").mkString(" ")))
    // a cross-source copy whose doc_id sorts FIRST ("a0" < "f00001"):
    // the flooded group's canonical lives in the OTHER source, so every
    // flood-side copy must be marked dup
    val victim = Seq(("a0", "victim", "the exact same boilerplate page text"))
    val small = for (k <- 1 to 6; i <- 1 to 20)
      yield (s"s${k}_$i", s"small$k", Seq.fill(20)(s"w${k}_$i").mkString(" "))
    val dir = writeDocs(flood ++ uniq ++ victim ++ small)
    val marked = ScaleOps.markDups(s, dir)
    // bit-equality with the r18 window semantics on the flooded corpus
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy(col("dh")).orderBy(col("doc_id"))
    val naive = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), tkc.as("tk"), md5(col("text")).as("dh"))
      .withColumn("is_dup", org.apache.spark.sql.functions.row_number().over(wd) > 1)
    assert(rowsOf(marked) == rowsOf(naive),
      "groupBy+join-back marking must be bit-equal to the window form")
    assert(marked.filter(col("source") === "flood" && col("is_dup")).count() == 4000L,
      "all 4000 flood copies must be dups (the canonical a0 lives in victim)")
    // plan shape: no per-digest window anywhere in the marking, and the
    // canonical pick partially aggregates before its exchange
    val plan = marked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"marking must not contain a per-digest window:\n$plan")
    assert(plan.contains("partial_min"),
      s"canonical pick must be map-side combinable (partial_min):\n$plan")
    // the substrate's consumers inherit the fix: q256 over the flooded
    // corpus still reproduces the single-window reference bit-for-bit
    assert(rowsOf(ScaleOps.dedupMixture(s, dir)) == rowsOf(naiveDedupMixture(dir)),
      "q256 over the flooded corpus must reproduce the single-window semantics")
    rmDir(dir)
  }

  test("q260 feed-synced mix-admission: takedowns really erase digests, both decision mechanisms fire, and a feed replay is a no-op on digests/counts/rates/decisions") {
    import graft.operators.ScaleOps
    val dir = TestSpark.sf
    val store = ScaleOps.mixAdmitSyncStore(s, dir)
    def rd(t: String) = graft.sources.IndexStore.read(s, store, t)
    val docs = table(s, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
    // the delete leg was real: at least one taken-down (not re-ingested,
    // not otherwise held) text left the digest set
    val baseDistinct = docs.filter(col("text").isNotNull)
      .select(md5(col("text"))).distinct().count()
    val nDig = rd("digests").count()
    assert(nDig < baseDistinct,
      s"takedown must shrink the digest set ($nDig vs $baseDistinct)")
    // both mechanisms fire against the SYNCED policy (q258's strictness
    // convention): the dup screen rejects and the lottery admits
    val arrivals = ScaleOps.mixArrivalBatch(s, dir)
    val d = ScaleOps.mixAdmitBatchAt(s, store, arrivals).groupBy().agg(
      sum(when(col("decision") === "dup", 1L).otherwise(0L)),
      sum(when(col("decision") === "admit", 1L).otherwise(0L))).collect()(0)
    assert(d.getLong(0) > 0L, "the synced dup screen must reject the copies")
    assert(d.getLong(1) > 0L, "the synced lottery must admit fresh arrivals")
    // replay the SAME drained feed window onto the synced store: the
    // delete ids are already gone and the arrival holders already present
    // (duplicate holder rows are the q228 append tolerance), so digests,
    // counts, rates, and decisions must not move — the property that
    // makes a re-delivered window safe for the streaming form
    def snap() = (rowsOf(rd("rates")), rowsOf(rd("counts")),
      rd("digests").count(),
      rowsOf(ScaleOps.mixAdmitSummary(ScaleOps.mixAdmitBatchAt(s, store, arrivals))))
    val before = snap()
    ScaleOps.applyMixAdmFeed(s, store,
      docs.filter(col("doc_id") % 31 === 2)
        .select((col("doc_id") + 500000L).as("doc_id"), col("source"), col("text")),
      docs.filter(col("doc_id") % 97 === 13).select(col("doc_id")))
    assert(snap() == before,
      "replaying the same feed window must be a no-op on the policy store")
  }

  test("q261 packs exactly what q259 materialized: per-source instance and token conservation through the packer") {
    import graft.operators.ScaleOps
    val dir = TestSpark.sf
    // the two consumers of the shared mixChain state must agree exactly:
    // every epoch instance q259 reports lands in a pack, and the packed
    // token mass equals the realized token mass — nothing dropped,
    // nothing double-packed
    val audit = ScaleOps.mixPipeline(s, dir)
      .select(col("source"), col("n_instances"), col("realized_tokens"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val packed = ScaleOps.mixPackPipeline(s, dir).collect()
    assert(packed.nonEmpty)
    assert(packed.map(_.getString(0)).toSet == audit.keySet,
      "packer must cover exactly the audited sources")
    packed.foreach { r =>
      val src = r.getString(0)
      assert((r.getAs[Long]("n_instances"), r.getAs[Long]("packed_tokens")) == audit(src),
        s"conservation through the packer must hold for $src")
    }
    // the packer demonstrably packs (not one pack per instance, nor one
    // pack per source swallowing everything)
    assert(packed.exists(_.getAs[Long]("n_packs") > 1L),
      "some source must split across packs at this SF")
    assert(packed.forall(r => r.getAs[Long]("n_packs") <= r.getAs[Long]("n_instances")),
      "a pack holds at least one instance")
  }

  test("q265 serves q260's decisions bit-for-bit through the masks, and the re-ingested takedown rides the Iceberg seg rule") {
    import graft.operators.ScaleOps
    val dir = TestSpark.sf
    // same feed fixture, same probe body: the masked store and the
    // physically-rewritten store may only differ in REPRESENTATION
    val phys = rowsOf(ScaleOps.feedSyncedMixAdmission(s, dir))
    val masked = rowsOf(ScaleOps.maskedMixAdmission(s, dir)
      .drop("n_mask_rows"))
    assert(masked == phys,
      "masked-store decisions/audit must equal the physical store's")
    // the mask mechanism is demonstrably live: gone-digests masked at
    // seq 0, and a taken-down-and-re-ingested text (%97=13 AND %31=2
    // ids exist in the fixture) is served through its own mask as a
    // seg-1 digest row
    val path = ScaleOps.mixAdmMaskSyncStore(s, dir)
    val gone = graft.sources.IndexStore.read(s, path, "mask_gone")
    assert(gone.count() > 0L, "the delete leg must land gone-digest masks")
    val reAdded = graft.sources.IndexStore.read(s, path, "digests")
      .filter(col("seg") === 1L)
      .join(gone.select(col("dh")), Seq("dh"), "left_semi")
    assert(reAdded.count() > 0L,
      "a re-ingested takedown must return as a seg-1 digest visible through its mask")
  }

  test("q264 packs exactly what q263 kept: per-source doc, raw-token and effective-mass conservation through the packer") {
    import graft.operators.ScaleOps
    val dir = TestSpark.sf
    // the two consumers of the shared weighted-selection state must agree
    // exactly: every doc q263 kept lands in a pack, the packed physical
    // mass equals the kept raw tokens, and the effective millitoken
    // accounting survives the packer — layout and curriculum reconcile
    val real = ScaleOps.weightedRealize(s, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val packed = ScaleOps.weightedPackPipeline(s, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val keptSrcs = real.collect {
      case (src, r) if r.getAs[Long]("n_kept") > 0L => src }.toSet
    assert(packed.keySet == keptSrcs,
      "packer must cover exactly the sources with kept documents")
    keptSrcs.foreach { src =>
      val (r, p) = (real(src), packed(src))
      assert(p.getAs[Long]("n_docs") == r.getAs[Long]("n_kept"),
        s"doc conservation for $src")
      assert(p.getAs[Long]("packed_tokens") == r.getAs[Long]("kept_tokens"),
        s"raw-token conservation for $src")
      assert(p.getAs[Long]("packed_eff_milli") == r.getAs[Long]("kept_eff_milli"),
        s"effective-mass conservation for $src")
    }
    // the packer demonstrably packs, and a pack overfills only by its
    // last document's spill (pack_id = floor(prefix-before / 2048))
    assert(packed.values.exists(_.getAs[Long]("n_packs") > 1L),
      "some source must split across packs at this SF")
    val maxKeptRtk = ScaleOps.weightedDocs(s, dir)
      .agg(max(col("rtk"))).head().getLong(0)
    assert(packed.values.forall(
        _.getAs[Long]("max_pack_tokens") < 2048L + maxKeptRtk),
      "a pack exceeds the window only by its final document's spill")
  }

  test("q262 near-dup flood: distinct digests, same content — the flood's effective mass collapses to ~one idea and cannot buy allocation") {
    import graft.operators.ScaleOps
    // the flood q256 is blind to (VERDICT r18 item 5): 800 documents,
    // every one a distinct TRANSPOSITION (one pairwise swap) of the same
    // 41-token text — 800 pairwise-distinct sequences (exact dedup keeps
    // every one) over ONE token multiset, hence identical SimHash
    // fingerprints, hence one hamming-0 near-dup cluster. 800 reps stay
    // under the 1024 band-bucket cap, so the capped substrate sees every
    // pair. doc_ids avoid % 10 == 0 so the corpus is exactly what we
    // write (no injected variants).
    val toks = (1 to 41).map(i => f"ft$i%02d").toVector
    val swaps = (for (a <- 0 until 41; b <- a + 1 until 41) yield (a, b)).take(800)
    val flood = swaps.zipWithIndex.map { case ((a, b), i) =>
      val t = toks.updated(a, toks(b)).updated(b, toks(a))
      (10L * i + 1L, "flood", t.mkString(" "))
    }
    val small = (1 to 10).flatMap(k => (1 to 20).map(i =>
      (100000L + 1000L * k + 10L * i + 3L, s"small$k",
        (1 to 20).map(j => s"w${k}_${i}_$j").mkString(" "))))
    val dir = s"target/tmp/softflood_${java.util.UUID.randomUUID().toString.take(8)}"
    import s.implicits._
    (flood ++ small).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ScaleOps.softDedupMixture(s, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = got("flood")
    // digests really are distinct: exact dedup would keep all 800
    assert(table(s, dir, "documents").filter(col("source") === "flood")
      .select(md5(col("text"))).distinct().count() == 800L,
      "transpositions must produce 800 distinct digests")
    assert(f.getAs[Long]("n_clustered") == 800L,
      s"every flood doc must sit in the near-dup cluster: ${f.getAs[Long]("n_clustered")}")
    // effective mass ~ tokens/800: the whole flood funds ~one document
    val (raw, eff) = (f.getAs[Long]("tokens"), f.getAs[Long]("eff_tokens"))
    assert(raw == 800L * 41L, s"flood raw mass: $raw")
    assert(eff <= raw / 400L,
      s"the flood's effective mass must collapse (raw $raw, eff $eff)")
    // and allocation follows effective mass: the flood cannot out-allocate
    // an honest small source despite 4x its raw tokens
    val smallAlloc = got("small1").getAs[Long]("alloc")
    assert(f.getAs[Long]("alloc") <= smallAlloc,
      s"a near-dup flood must not buy allocation (flood ${f.getAs[Long]("alloc")} vs small $smallAlloc)")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("q260 delete-leg mechanisms: cross-source canonical promotion shifts counts, a re-ingested takedown restores its digest, a last-holder delete erases it") {
    import graft.operators.ScaleOps
    // a corpus crafted around the builder's fixed feed formulas
    // (delete doc_id % 97 == 13, re-ingest doc_id % 31 == 2 as +500000):
    //  - text T: held by id 110 (% 97 == 13 -> deleted, source a) AND
    //    id 250 (survives, source b). Pre-delete canonical is 110, so T's
    //    tokens count for a; the delete PROMOTES 250 -> T must shift to b.
    //  - text U: held only by id 207 (% 97 == 13, % 31 != 2) -> last
    //    holder deleted, never re-ingested: digest ERASED.
    //  - text W: held only by id 498 (% 97 == 13 AND % 31 == 2) -> the
    //    takedown is re-ingested as 500498 (same source): digest RESTORED,
    //    counts unchanged (canonical moves within the source).
    //  - filler docs in each source so no count hits zero.
    val tT = (1 to 7).map(i => s"tt$i").mkString(" ")   // 7 tokens
    val tU = (1 to 5).map(i => s"uu$i").mkString(" ")   // 5 tokens
    val tW = (1 to 3).map(i => s"ww$i").mkString(" ")   // 3 tokens
    // 100-token fillers per source so the tight 1/10 budget yields a
    // nonzero waterfill level (a toy-sized corpus would alloc 0 and make
    // the rates assertion vacuous)
    val fill = (src: String) => (1 to 100).map(j => s"f$src$j").mkString(" ")
    val docs = Seq(
      (110L, "a", tT), (250L, "b", tT),
      (207L, "b", tU),
      (498L, "c", tW),
      (1L, "a", fill("a")), (2L, "b", fill("b")), (3L, "c", fill("c")))
    import s.implicits._
    val dir = s"target/tmp/mixadmmech_${java.util.UUID.randomUUID().toString.take(8)}"
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val store = ScaleOps.mixAdmitSyncStore(s, dir)
    def rd(t: String) = graft.sources.IndexStore.read(s, store, t)
    val digests = rd("digests").collect().map(_.getString(0)).toSet
    def dh(text: String): String = docs.toDF("doc_id", "source", "text")
      .filter(col("text") === text).select(md5(col("text")))
      .collect().head.getString(0)
    assert(digests.contains(dh(tT)), "T keeps its digest (surviving holder in b)")
    assert(!digests.contains(dh(tU)), "U's last holder was deleted: digest erased")
    assert(digests.contains(dh(tW)), "W was re-ingested: digest restored")
    // counts: T's 7 tokens PROMOTED from a to b; W's 3 stay in c
    val counts = rd("counts").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 100L, s"a = its filler only after the promotion: ${counts("a")}")
    assert(counts("b") == 100L + 7L, s"b gains T's tokens (filler 100 + T 7): ${counts("b")}")
    assert(counts("c") == 100L + 3L, s"c keeps W through the restore (filler 100 + W 3): ${counts("c")}")
    // and the rates table is the waterfill re-solve over exactly these
    // counts (the driver-side re-solve really ran against the shifted
    // counts, not the pre-delete ones)
    val rates = rd("rates").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.keySet == Set("a", "b", "c") && rates("b") > 0L,
      s"rates must be re-solved over the synced counts: $rates")
    // ADVICE r19: a recurring apply must INVALIDATE the stamp before its
    // four independent table swaps — a crash mid-apply on an already-
    // stamped store would otherwise pass isCurrent and serve torn tables.
    // Re-stamping afterwards (with a feed-version token) is the caller's
    // contract; an apply that dies leaves the store loudly stale.
    assert(graft.sources.IndexStore.readStamp(s, store)
        .exists(_.startsWith("mixadmsync1|")),
      "precondition: the built store is stamped current")
    val emptyDocs = docs.toDF("doc_id", "source", "text").limit(0)
    ScaleOps.applyMixAdmFeed(s, store, emptyDocs, emptyDocs.select("doc_id"))
    assert(graft.sources.IndexStore.readStamp(s, store)
        .contains("mixadmsync-applying"),
      "an apply without a re-stamp must leave the store detectably torn")
    rmDir(dir)
  }

  /** q263's ORIGINAL single-window weighted realization over the same
    * survivor/cost frame — what the prefiltered sharded form must
    * reproduce bit-for-bit (the oracle keeps this SQL shape). */
  private def naiveWeightedRealize(dir: String) = {
    import org.apache.spark.sql.expressions.Window
    val wd = ScaleOps.weightedDocs(s, dir)
    val alloc = ScaleOps.waterfillFromCounts(
      wd.groupBy(col("source")).agg(sum(col("tk")).as("c")), 1L, 10L)
      .select(col("source"), col("alloc"))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    wd
      .withColumn("prefix",
        sum(col("tk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(alloc), Seq("source"))
      .withColumn("kept", col("prefix") - col("tk") < col("alloc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_surv"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("kept"), col("rtk")).otherwise(0L)).as("kept_tokens"),
           sum(when(col("kept"), col("tk")).otherwise(0L)).as("kept_eff_milli"),
           min(col("alloc")).as("alloc_milli"))
  }

  test("q263 dual-guard flood: exact copies removed, near-dup variants admitted at ~1/k cost — bit-equal to the single-window weighted form, escalation converges") {
    import graft.operators.ScaleOps
    // both guards on one source: 800 transposition variants (distinct
    // digests, ONE hamming-0 cluster) + 400 byte-copies of variant 0
    // (exact dups). Exact dedup drops the copies; the weights price the
    // 800 survivors at ~1/800 each, so the flood fills its allocation
    // with MANY cheap variants totalling ~one idea of effective mass —
    // the soft-dedup training semantic, not a ban.
    val toks = (1 to 41).map(i => f"ft$i%02d").toVector
    val swaps = (for (a <- 0 until 41; b <- a + 1 until 41) yield (a, b)).take(800)
    val flood = swaps.zipWithIndex.map { case ((a, b), i) =>
      val t = toks.updated(a, toks(b)).updated(b, toks(a))
      (10L * i + 1L, "flood", t.mkString(" "))
    }
    val copies = (0 until 400).map(i =>
      (200000L + 10L * i + 7L, "flood", flood.head._3))
    val small = (1 to 10).flatMap(k => (1 to 20).map(i =>
      (100000L + 1000L * k + 10L * i + 3L, s"small$k",
        (1 to 20).map(j => s"w${k}_${i}_$j").mkString(" "))))
    import s.implicits._
    val dir = s"target/tmp/wrealflood_${java.util.UUID.randomUUID().toString.take(8)}"
    (flood ++ copies ++ small).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val exact = rowsOf(naiveWeightedRealize(dir))
    val got = ScaleOps.weightedRealize(s, dir)
    assert(rowsOf(got) == exact,
      "prefiltered sharded weighted realization must reproduce the single-window form bit-for-bit")
    val f = got.collect().map(r => r.getString(0) -> r).toMap.apply("flood")
    assert(f.getAs[Long]("n_surv") == 800L,
      s"exact dedup must drop the 400 byte-copies: ${f.getAs[Long]("n_surv")}")
    assert(f.getAs[Long]("n_kept") > 400L,
      s"cheap variants fill the budget (soft dedup admits, not bans): ${f.getAs[Long]("n_kept")}")
    // the flood's effective spend stays inside its allocation (+ one
    // boundary doc), and it cannot out-allocate an honest small source
    val (eff, alloc) = (f.getAs[Long]("kept_eff_milli"), f.getAs[Long]("alloc_milli"))
    assert(eff <= alloc + 100L, s"effective spend must respect the allocation ($eff vs $alloc)")
    val smallAlloc = got.collect().collectFirst {
      case r if r.getString(0) == "small1" => r.getAs[Long]("alloc_milli") }.get
    assert(alloc <= smallAlloc,
      s"the flood must not out-allocate an honest source ($alloc vs $smallAlloc)")
    assert(rowsOf(ScaleOps.weightedRealizeM(s, dir, 1L)) == exact,
      "escalated thresholds must converge to the same exact answer")
    rmDir(dir)
  }

  test("q259 composition shares q256's survivor universe, and its kept token mass sits in the greedy crossing band") {
    val dir = TestSpark.sf
    val byQ256 = ScaleOps.dedupMixture(s, dir)
      .select(col("source"), col("n_surv"), col("alloc")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = ScaleOps.mixPipeline(s, dir)
      .select(col("source"), col("n_surv"), col("kept_tokens")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, ns, kt) = (r.getString(0), r.getLong(1), r.getLong(2))
      // same dedup policy, same corpus => same survivor universe
      assert(byQ256(src)._1 == ns,
        s"$src: survivor count ${ns} != q256's ${byQ256(src)._1}")
      // greedy crossing: kept mass first reaches-or-crosses the SAME
      // allocation (identical survivor counts => identical waterfill),
      // whatever order (hash vs quality-first) filled it
      val alloc = byQ256(src)._2
      assert(kt >= alloc || ns == 0L,
        s"$src: quality fill undershot the allocation ($kt < $alloc)")
    }
  }

  test("mixing family degenerate budgets: alloc=0 sources get synthesized zero rows bit-equal to the single-window forms") {
    // 30 one-token sources + a zero-token source: the 1/10 budget's
    // water level is 0, so EVERY source caps out at alloc=0 — the regime
    // where the r17 q252 shape routed whole sources through one reducer
    // (ADVICE r17) and where the synthesized-zero path is the whole query
    val tiny = (1 to 30).map(i => (s"d$i", s"src$i", s"tok$i"))
    val dir = writeDocs(tiny :+ (("dv", "void", "")))
    assert(rowsOf(ScaleOps.cappedRealizeM(s, dir, 2L)) == rowsOf(naiveRealize(dir, 1L, 10L)),
      "q252 must synthesize zero rows equal to the single-window output")
    assert(rowsOf(ScaleOps.qualityFill(s, dir)) == rowsOf(naiveQualityFill(dir)),
      "q255 must synthesize zero rows equal to the single-window output")
    assert(rowsOf(ScaleOps.dedupMixture(s, dir)) == rowsOf(naiveDedupMixture(dir)),
      "q256 must synthesize zero rows equal to the single-window output")
    val n = ScaleOps.cappedRealize(s, dir).filter(col("alloc") === 0L).count()
    assert(n == 31L, s"all 31 sources must appear as zero rows, got $n")
    rmDir(dir)
  }
}
