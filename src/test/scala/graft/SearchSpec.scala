package graft

import graft.operators.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval stack behavior: the persisted inverted index round-trips, BM25
  * ranking is sane and scale-shaped (broadcast query terms, no cartesian),
  * segment refresh merges to fresh-build stats, and the prefix-filtered
  * set join finds the injected duplicate pairs through equi-joins only.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("inverted index persists and validates via IndexStore stamp") {
    Search.invindexBuild(s, TestSpark.sf).collect() // builds if stale
    val path = Search.fixtureIndexPath(TestSpark.sf)
    val stamp = Search.fixtureStamp(s, TestSpark.sf)
    assert(graft.sources.IndexStore.isCurrent(s, path, stamp),
      "index must validate against the layout-versioned corpus stamp after a build")
    // content check: stored postings tf-sum == direct token count
    val stored = graft.sources.IndexStore.read(s, path, "postings")
      .agg(sum("tf")).collect()(0).getLong(0)
    val direct = Engine.table(s, TestSpark.sf, "documents")
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))))
      .count()
    assert(stored == direct, "stored postings must cover every token occurrence")
  }

  test("BM25 plan broadcasts the query-term side and stays cartesian-free") {
    val plan = Search.bm25TopK(s, TestSpark.sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "postings probe must be an equi-join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the tiny query/stats side must broadcast")
  }

  test("BM25 top-k is rank-consistent and the positive is always a candidate") {
    val top = Search.bm25TopK(s, TestSpark.sf).cache()
    // per qid: rn dense from 1, scores non-increasing in rn
    val bad = top.as("a").join(top.as("b"),
        col("a.qid") === col("b.qid") && col("a.rn") < col("b.rn") &&
          col("a.score") < col("b.score"))
    assert(bad.count() == 0, "scores must be non-increasing in rank")
    val negs = Search.bm25Negatives(s, TestSpark.sf).cache()
    assert(negs.filter(col("pos_rank").isNull).count() == 0,
      "the posing doc always matches its own query terms")
    assert(negs.filter(col("neg1") === col("qid")).count() == 0,
      "negatives must exclude the positive")
    top.unpersist(); negs.unpersist()
  }

  test("segment refresh: two segments merge to fresh whole-corpus stats") {
    val merged = Search.segmentRefresh(s, TestSpark.sf)
      .select("tok", "df", "cf", "max_tf", "rn").collect().toSeq
    val fresh = Search.invindexBuild(s, TestSpark.sf).collect().toSeq
    assert(merged.map(_.toString).sorted == fresh.map(_.toString).sorted,
      "segment-merged dictionary must equal a fresh whole-corpus build")
  }

  test("segment compaction: one segment, identical dictionary, identical BM25") {
    val compacted = Search.segmentCompact(s, TestSpark.sf).cache()
    assert(compacted.filter(col("n_segments") =!= 1).count() == 0,
      "every surviving dict row must sit in segment 0 after compaction")
    val fresh = Search.invindexBuild(s, TestSpark.sf).collect().toSeq
    val got = compacted.select("tok", "df", "cf", "max_tf", "rn").collect().toSeq
    assert(got.map(_.toString).sorted == fresh.map(_.toString).sorted,
      "compacted dictionary must equal a fresh whole-corpus build")
    compacted.unpersist()
  }

  test("refresh and compaction keep the positional table complete") {
    val p = Search.refreshedBranch(s, TestSpark.sf, "spec")
    val direct = Engine.table(s, TestSpark.sf, "documents")
      .select(explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))))
      .count()
    assert(graft.sources.IndexStore.read(s, p, "positions").count() == direct,
      "refreshed branch must carry position rows for base AND batch docs")
    Search.compactSearchIndex(s, p)
    assert(graft.sources.IndexStore.read(s, p, "positions").count() == direct,
      "compaction must preserve the positional table verbatim")
  }

  test("as-of horizon filters the positional table, not just the BM25 tables") {
    // fresh branch (the "spec" branch above was compacted to one segment)
    val p = Search.refreshedBranch(s, TestSpark.sf, "specasof")
    val idx = Search.loadIndex(s, p)
    val horizon = Search.asOfIndex(idx, maxSeg = 0)
    // the refreshed quarter (doc_id % 4 == 3) landed as segment 1: its
    // positions exist in the full view and are INVISIBLE at horizon 0 —
    // phrase probes reproduce what the index could answer pre-refresh
    val batchDocs = col("doc_id") % 4 === 3
    assert(idx.positions.filter(batchDocs).count() > 0,
      "refreshed docs must have position rows in the full view")
    assert(horizon.positions.filter(batchDocs).count() == 0,
      "horizon 0 must hide the refreshed segment's positions")
    // base docs' positions are untouched by the horizon (bit-identical set)
    val base = idx.positions.filter(!batchDocs)
    val hbase = horizon.positions.filter(!batchDocs)
    assert(hbase.count() == base.count(),
      "horizon must not drop any base-segment position row")
    // and the segment predicate is PUSHED to the scan (file-prunable at
    // scale), not applied post-shuffle
    val pushed = horizon.positions.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") && pushed.contains("segment"),
      s"horizon filter must reach the parquet scan:\n$pushed")
  }

  test("phrase as-of: horizon leg loses refreshed-quarter occurrences, full leg equals q170") {
    val df = Search.phraseAsOf(s, TestSpark.sf).cache()
    val full = df.filter(col("horizon") === "full").drop("horizon")
    val asof = df.filter(col("horizon") === "asof0").drop("horizon")
    // the full horizon over the two-segment branch is a whole-corpus
    // phrase search: identical rows to q170 (disjoint-doc-append contract)
    val q170 = Search.phraseSearch(s, TestSpark.sf).collect().map(_.toString).sorted
    assert(full.collect().map(_.toString).sorted.sameElements(q170),
      "full horizon must equal the whole-corpus q170 answer")
    // doc 11 (11 % 97 == 11, 11 % 4 == 3) is a refreshed-quarter probe:
    // its phrase's own occurrence is invisible at horizon 0, so its asof0
    // row either vanishes or counts strictly fewer occurrences
    val f11 = full.filter(col("qid") === 11).collect()
    assert(f11.length == 1, "doc 11 must yield a probe phrase at every SF")
    val a11 = asof.filter(col("qid") === 11).collect()
    assert(a11.isEmpty ||
        a11.head.getAs[Long]("n_occ") < f11.head.getAs[Long]("n_occ"),
      "horizon 0 must not see doc 11's own phrase occurrence")
    // no asof0 count may exceed its full-horizon counterpart (a leaked
    // segment-1 position would do exactly that)
    val joined = asof.select(col("qid"), col("n_occ").as("a_occ"))
      .join(full.select(col("qid"), col("n_occ").as("f_occ")), "qid")
    assert(joined.filter(col("a_occ") > col("f_occ")).count() == 0,
      "asof0 occurrence counts must be <= full-horizon counts")
    df.unpersist()
  }

  test("phrase search: every phrase matches its source doc, equi-joins only") {
    val df = Search.phraseSearch(s, TestSpark.sf).cache()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the phrase is lifted from tokens 2-4 of its qid doc, so the source
    // doc itself always matches: first_doc <= qid, n_docs >= 1
    assert(df.filter(col("n_docs") < 1 || col("first_doc") > col("qid")).count() == 0,
      "a phrase must at least match the doc it was lifted from")
    assert(df.filter(col("n_occ") < col("n_docs")).count() == 0,
      "occurrences can never undercount matching docs")
    df.unpersist()
  }

  test("public API: persisted index serves BM25 in a fresh session, index-only scans") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_search").toString
    val idxPath = s"$tmp/idx"
    val corpus = { import s.implicits._
      Seq(
        (1L, "spark shuffles data across the cluster"),
        (2L, "spark broadcasts small tables"),
        (3L, "the cat sat on the mat")
      ).toDF("doc_id", "text") }
    Search.persistIndex(s, idxPath, "literal-corpus", corpus)
    // fresh session state = restart analog; the corpus frame is gone
    val s2 = s.newSession()
    Engine.tune(s2)
    val q = { import s2.implicits._
      Seq((10L, "spark"), (10L, "cluster"), (11L, "cat")).toDF("qid", "tok") }
    val scored = Search.bm25(Search.loadIndex(s2, idxPath), q)
    // plan-level proof: every file source is the persisted index
    val scanned = scored.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains(idxPath)),
      s"scoring must scan only the persisted index, scanned: $scanned")
    val byQ = scored.collect().groupBy(_.getLong(0))
    // qid 10 ("spark cluster"): doc 1 matches both terms, outranks doc 2
    val top10 = byQ(10L).maxBy(_.getDouble(2))
    assert(top10.getLong(1) == 1L, s"doc 1 must top the 'spark cluster' query: ${byQ(10L).toSeq}")
    // qid 11 ("cat"): only doc 3 scores
    assert(byQ(11L).map(_.getLong(1)).toSet == Set(3L))
  }

  test("hybrid RRF: probe budget bounds the query set; both legs stay inside it") {
    // default budget = 16 -> qids are the q164 stream (id % 50 = 7) below 800
    val dflt = Search.hybridRrf(s, TestSpark.sf)
      .select(col("qid")).distinct().collect().map(_.getLong(0))
    assert(dflt.nonEmpty && dflt.length <= 16, s"default budget 16: ${dflt.length}")
    assert(dflt.forall(q => q % 50 == 7 && q < 800), dflt.mkString(","))
    // a smaller configured budget shrinks the set — the knob is live
    s.conf.set("spark.graft.hybrid.probes", "2")
    try {
      val small = Search.hybridRrf(s, TestSpark.sf)
        .select(col("qid")).distinct().collect().map(_.getLong(0))
      assert(small.toSet == Set(7L, 57L), s"budget 2 -> qids {7, 57}: ${small.toSeq}")
    } finally s.conf.unset("spark.graft.hybrid.probes")
  }

  test("MMR rerank: greedy invariants — distinct picks, non-increasing scores") {
    val out = Search.mmrRerank(s, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      val byPick = rows.sortBy(_._3)
      // one row per pick, no doc picked twice
      assert(byPick.map(_._3).toSeq == (1 to byPick.length), s"qid $q picks: $byPick")
      assert(byPick.map(_._2).distinct.length == byPick.length, s"qid $q repeated a doc")
      // greedy monotonicity: each later pick's MMR score cannot exceed an
      // earlier one's (the candidate pool only shrinks and the redundancy
      // penalty only grows)
      byPick.sliding(2).foreach { case Array(a, b) =>
        assert(b._4 <= a._4, s"qid $q: pick ${b._3} score ${b._4} > pick ${a._3} score ${a._4}")
      case _ => ()
      }
      // pick 1 carries the pure-relevance score of the rank-1 candidate
      assert(byPick.head._4 == 3500000L, s"qid $q pick-1 score ${byPick.head._4}")
    }
    assert(out.groupBy(_._1).values.exists(_.length == 3),
      "at least one query must fill all three context slots")
  }

  test("q214 as-of BM25: horizon excludes segment-1 docs AND their stats") {
    import org.apache.spark.sql.functions._
    val rows = Search.bm25AsOf(s, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
    val full = rows.collect { case (("full", q, d), sc) => (q, d) -> sc }.toMap
    val asof = rows.collect { case (("asof0", q, d), sc) => (q, d) -> sc }.toMap
    // the horizon NEVER returns a refreshed-quarter doc; the full probe does
    assert(asof.keys.forall { case (_, d) => d % 4 != 3 },
      "as-of probe leaked a post-horizon segment doc")
    assert(full.keys.exists { case (_, d) => d % 4 == 3 },
      "full probe must surface refreshed-segment docs")
    // a pair ranked under both horizons scores DIFFERENTLY: the horizon
    // filters the collection statistics (n_docs/avgdl/df), not only the
    // candidate postings — time travel of the whole index state
    val shared = asof.keySet & full.keySet
    assert(shared.nonEmpty, "horizons must overlap on some (qid, doc)")
    assert(shared.exists(k => asof(k) != full(k)),
      "as-of scores must reflect the pre-refresh collection stats")
  }

  test("prefix set join finds injected exact-copy pairs, equi-join only") {
    val df = Search.prefixSetJoin(s, TestSpark.sf).cache()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "prefix filtering must keep the candidate step an equi-join")
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-20 must plan TakeOrderedAndProject, not a full-set window sort")
    // exact copies (doc_id + 200000) have identical shingle sets -> jac 1.0
    val exact = df.filter(col("db") === col("da") + 200000L && col("jac") === 1.0)
    assert(exact.count() > 0, "injected exact-copy pairs must surface")
    df.unpersist()
  }
}
