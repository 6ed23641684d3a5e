package graft

import graft.operators.{Analytics, Dedup}
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 additions: percentiles, engineered corr, deterministic sampling,
  * TF-IDF ranking, and near-dup cluster formation.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("percentiles: p25 <= p50 <= p75 <= p99, bounded by min/max") {
    Analytics.percentiles(s, TestSpark.sf).collect().foreach { r =>
      val (p25, p50, p75, p99) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (mn, mx) = (r.getDouble(6), r.getDouble(7))
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= p99 && p99 <= mx)
    }
  }

  test("corr on an exact linear relationship is 1.0") {
    import s.implicits._
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val c = df.agg(corr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    // and the registered engineered identity stays within [-1, 1]
    Analytics.corrAgg(s, TestSpark.sf).collect().foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("hash sample is deterministic and roughly the configured fraction") {
    val a = Analytics.hashSample(s, TestSpark.sf).collect().map(_.toString).sorted
    val b = Analytics.hashSample(s, TestSpark.sf).collect().map(_.toString).sorted
    assert(a.sameElements(b), "same rows must be selected on every run")
    assert(a.nonEmpty)
  }

  test("tfidf: top-5 per lang, scores non-increasing within a lang") {
    val rows = TextOps.tfidf(s, TestSpark.sf)
      .orderBy(col("lang"), col("rn")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val scores = rs.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("above-avg threshold broadcasts the one-row scalar side") {
    val plan = Analytics.aboveAvg(s, TestSpark.sf).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"scalar side must broadcast:\n$plan")
  }

  test("unpivot emits one long row per (row, measure)") {
    val n = s.read.parquet(s"${TestSpark.sf}/lineitem.parquet").count()
    val long = Analytics.unpivotMeasures(s, TestSpark.sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(long == 4 * n)
  }

  test("window distributions: pct_rank in [0,1], quartile in 1..4") {
    Analytics.windowDist(s, TestSpark.sf).collect().foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 4)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("k-anonymity: every record covered once; cohorts meet k at their assigned level") {
    val out = TextOps.kAnonymity(s, TestSpark.sf).collect()
    val n = s.read.parquet(s"${TestSpark.sf}/customer.parquet").count()
    // total coverage, one assignment per record
    assert(out.length == n && out.map(_.getLong(0)).distinct.length == n)
    // the privacy contract: an assigned cohort always has >= k members
    // (level 3 is the whole table, which also satisfies k here)
    assert(out.forall(_.getLong(2) >= 5), "a released cohort under k breaks k-anonymity")
    // sf0.001 is sparse enough to exercise the coarse rungs INCLUDING the
    // global cohort (7 nations have < 5 customers), and dense enough that
    // no level-0 cohort reaches k — the ladder is genuinely climbed
    assert(out.map(_.getInt(1)).distinct.sorted.toSeq == Seq(1, 2, 3),
      s"expected levels {1,2,3} at sf0.001, got ${out.map(_.getInt(1)).distinct.sorted.toSeq}")
  }

  test("pii redaction: every injected span caught, zero leaks") {
    val r = TextOps.piiRedact(s, TestSpark.sf).collect()(0)
    val nDocs = r.getLong(0)
    assert(r.getLong(1) == nDocs, "every doc has an injected email")
    assert(r.getLong(2) == nDocs, "every doc has an injected phone")
    assert(r.getLong(3) == 0L, "no PII-shaped text survives redaction")
  }

  test("repetition ratio stays in [0,1) and near-dup slices score high") {
    TextOps.repetitionRatio(s, TestSpark.sf).collect().foreach { r =>
      val avg = r.getDouble(2)
      assert(avg >= 0.0 && avg < 1.0)
    }
  }

  test("contamination: benchmark slice overlap is bounded by gram counts") {
    TextOps.contamination(s, TestSpark.sf).collect().foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "contaminated <= docs")
      assert(r.getLong(3) >= 0L)
    }
  }

  test("stratified sample: exactly k per stratum, deterministic") {
    val a = Analytics.stratifiedSample(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    a.foreach { case (_, n, _) => assert(n == 20L) }
    val b = Analytics.stratifiedSample(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("KMV sketch is partition-independent and exact below k") {
    import s.implicits._
    val kmv = udaf(graft.functions.KmvSketch, org.apache.spark.sql.Encoders.scalaLong)
    // 40 distinct values < k=64: the sketch must report the exact count
    val small = (1 to 200).map(i => (i % 40).toLong * 7919L)
    val e1 = small.toDF("h").repartition(1).agg(kmv(col("h"))).collect()(0).getDouble(0)
    val e13 = small.toDF("h").repartition(13).agg(kmv(col("h"))).collect()(0).getDouble(0)
    assert(e1 == 40.0 && e13 == 40.0)
    // 5000 distinct hashes > k: estimate identical under any partitioning
    val big = (1 to 5000).map(i => graft.functions.GraftHash.md5_60(
      org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)))
    val b1 = big.toDF("h").repartition(1).agg(kmv(col("h"))).collect()(0).getDouble(0)
    val b17 = big.toDF("h").repartition(17).agg(kmv(col("h"))).collect()(0).getDouble(0)
    assert(b1 == b17)
    assert(math.abs(b1 - 5000.0) / 5000.0 < 0.35, s"estimate $b1 too far from 5000")
  }

  test("approx quantiles: sketch path plans with NO sort, contracts hold") {
    val df = Analytics.approxQuantiles(s, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getBoolean(2) && r.getBoolean(3),
      s"rank-error contract violated: $r") }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"sketch path must not sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), "GK summary aggregates via ObjectHashAggregate")
  }

  test("seq packing conserves docs and tokens; mix weights sum to 1") {
    val docs = s.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val nDocs = docs.count()
    val packed = TextOps.seqPack(s, TestSpark.sf).collect()
    assert(packed.map(_.getLong(2)).sum == nDocs, "packing must conserve documents")
    packed.foreach(r => assert(r.getLong(1) <= r.getLong(2), "packs hold >= 1 doc each"))
    val weights = TextOps.mixWeights(s, TestSpark.sf).collect().map(_.getDouble(3))
    assert(math.abs(weights.sum - 1.0) < 1e-6, s"mixture weights must sum to 1, got ${weights.sum}")
    assert(weights.forall(w => w > 0 && w < 1))
  }

  test("table checksum: sum fingerprint catches the dup-pair swap xor misses") {
    import s.implicits._
    // {A,A,B,B} vs {C,C,B,B}: same row count, every row occurs an even
    // number of times, so bit_xor cancels to 0 on both — only the wrapping
    // SUM fingerprint distinguishes the two tables.
    val t1 = Seq("A", "A", "B", "B").toDF("k")
    val t2 = Seq("C", "C", "B", "B").toDF("k")
    val r1 = Analytics.tableSig(t1, "t1", "k").collect()(0)
    val r2 = Analytics.tableSig(t2, "t2", "k").collect()(0)
    assert(r1.getLong(1) == r2.getLong(1), "same n_rows")
    assert(r1.getLong(2) == r2.getLong(2), "xor fingerprint collides by construction")
    assert(r1.getLong(3) != r2.getLong(3), "sum fingerprint must distinguish the tables")
    // and the sum fingerprint is order/partitioning-independent
    val r1b = Analytics.tableSig(t1.repartition(3), "t1", "k").collect()(0)
    assert(r1.getLong(3) == r1b.getLong(3))
  }

  test("connected components match a reference union-find on random graphs") {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // forcedLocalMax 0 forces the distributed iterative path; the default
    // (unset) takes the single-partition union-find path — both must agree
    // with the reference labeling
    (1 to 3).zip(Seq(None, Some("0"), None)).foreach { case (_, forcedLocalMax) =>
      val n = 30
      val edges = (1 to 40)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      forcedLocalMax.foreach(v => s.conf.set("spark.graft.cc.localMaxEdges", v))
      val labels = try {
        Dedup.connectedComponents(edges.toDF("da", "db"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally s.conf.unset("spark.graft.cc.localMaxEdges")
      // reference union-find, always attaching the larger root under the
      // smaller one, so each component's root IS its minimum node id
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      assert(labels.keySet == nodes.toSet)
      nodes.foreach(nd => assert(labels(nd) == find(nd), s"node $nd"))
      // the mid-tier (per-partition contraction + finish) must produce
      // the identical labeling from any partitioning
      val tl = Dedup.ccTwoLevel(
          edges.toDF("n", "m").repartition(4)
            .select(col("n").cast("long"), col("m").cast("long")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(tl == labels, "two-level labeling must equal the gated tiers'")
    }
  }

  test("CC three-tier gate: dense graph takes the star path, sparse falls through") {
    import s.implicits._
    // one 30-clique (435 edges) + a 12-node chain: dense enough that
    // 4-partition contraction shrinks it well below the edge count
    val clique = for (i <- 0 until 30; j <- i + 1 until 30) yield (i.toLong, j.toLong)
    val chain = (100 until 111).map(i => (i.toLong, i.toLong + 1))
    val edges = clique ++ chain
    val ref = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
    }
    // gate between star count (<= ~42 nodes x 4 partitions ~ 168) and edge
    // count (447): edges exceed it, stars fit -> mid tier must run AND be
    // correct. Then a tiny gate (stars exceed too) -> iterative-on-stars.
    for (gate <- Seq("300", "5")) {
      s.conf.set("spark.graft.cc.localMaxEdges", gate)
      val got = try {
        Dedup.connectedComponents(edges.toDF("da", "db").repartition(4))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally s.conf.unset("spark.graft.cc.localMaxEdges")
      assert(got == ref, s"gate=$gate labeling must match the reference")
    }
  }

  test("dedup clusters: labels partition the pair-graph nodes; canonical is the min") {
    val pairs = Dedup.simhashPairs(s, TestSpark.sf).select(col("da"), col("db")).cache()
    val nNodes = pairs.select(col("da").as("n"))
      .unionByName(pairs.select(col("db").as("n"))).distinct().count()
    val clusters = Dedup.dedupClusters(s, TestSpark.sf).cache()
    val total = clusters.agg(sum("n_members")).collect()(0).getLong(0)
    assert(total == nNodes, "every clustered node appears in exactly one cluster")
    // canonical selection: the cluster id IS the minimum member
    assert(clusters.filter(col("cluster_id") =!= col("min_doc")).count() == 0)
    assert(clusters.count() > 0)
    pairs.unpersist(); clusters.unpersist()
  }

  test("pagerank: integer iteration conserves rank mass up to truncation") {
    val top = Analytics.pageRank(s, TestSpark.sf).collect()
    assert(top.length == 20 && top.map(_.getInt(2)).toSeq == (1 to 20))
    // ranks strictly ordered (ties broken by node, so non-increasing)
    val ranks = top.map(_.getLong(1))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // mass conservation up to integer truncation: per iteration,
    // `r div deg` loses < 1 femto per src node but that loss is carried
    // by each of its deg out-edges (< E total), `(85*csum) div 100`
    // loses < 1 per dst node (< N), and the teleport base
    // `(1-d)*10^15 div N` re-added to every node under-pays its exact
    // share by < 1 femto per node (< N more); the initial 10^15 div N
    // seeding loses < N. With bidirectional edges nothing dangles, so
    // over 3 iterations: 10^15 - mass < 3*(E+2N) + N. If an iteration
    // dropped or double-counted a node the error would be ~10^15/N.
    val full = Analytics.pageRankRanks(s, TestSpark.sf)
    val mass = full.agg(sum(col("r"))).collect()(0).getLong(0)
    val nodes = full.count()
    val nEdges = Analytics.tradeGraph(s, TestSpark.sf)._1.count()
    assert(mass <= 1000000000000000L, s"mass grew: $mass")
    assert(mass > 1000000000000000L - (3L * (nEdges + 2 * nodes) + nodes),
      s"mass lost beyond truncation bound: $mass (E=$nEdges N=$nodes)")
  }

  test("trustrank: top-20 well-formed, trust bounded by total mass, seeds present") {
    val rows = Analytics.trustRank(s, TestSpark.sf).collect()
    assert(rows.length == 20 && rows.map(_.getInt(3)).toSeq == (1 to 20))
    val trust = rows.map(_.getLong(1))
    assert(trust.zip(trust.tail).forall { case (a, b) => a >= b })
    // trust decays except at seeds; no node can ever exceed the total
    // teleport+propagated mass
    assert(trust.forall(t => t > 0 && t < 1000000000000000L))
    // with trust seeded on trading suppliers, at least one seed must rank
    // in the top-20 (teleport mass alone guarantees a floor)
    assert(rows.exists(_.getBoolean(2)), "no seed in top-20: teleport mass lost")
  }
}
