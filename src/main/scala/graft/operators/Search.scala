package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval over `documents`: a persisted inverted index (postings
  * + dictionary + document lengths), BM25 top-k ranking, retrieval-eval /
  * hard-negative mining, segment-based incremental refresh, and an exact
  * set-similarity join (prefix filtering) — the full-text side of a
  * training-data engine, complementing the embedding/ANN family
  * ([[Similarity]]) and the approximate LSH dedup family ([[Dedup]]).
  *
  * Why an inverted index at 100 TB: BM25 over a query set is a join of the
  * query terms against term-keyed postings — cost proportional to the
  * postings of the QUERY terms only, never |queries| x |corpus|. The index
  * tables are laid out for exactly that probe: postings are hash-distributed
  * and sorted by `tok`, so a term probe prunes by parquet min/max stats and
  * the scan never touches postings of other terms; the dictionary (one row
  * per term) broadcasts.
  *
  * Index persistence rides [[graft.sources.IndexStore]] (stamp-validated
  * guarded swap, same consistency model as the dedup/vector screening
  * indexes): build once from the corpus, every retrieval query thereafter is
  * index-only — a restart costs three parquet opens, not a corpus rescan.
  * Refresh is Lucene-style segments ([[segmentRefresh]]): a new batch
  * APPENDS postings/doclen/dict rows tagged with a fresh segment id —
  * per-term stats (df, cf) are additive across disjoint doc sets, so
  * readers merge the per-segment dictionary rows with a SUM-groupBy and
  * never rewrite existing segment files.
  *
  * Reference provenance: the reference has no text retrieval (its only
  * lookup is a per-file idempotency probe, /root/reference/data_pipeline.py:138);
  * this module is part of the LLM-pipeline extension surface (search-driven
  * curation, retrieval-training data: eval + hard negatives).
  *
  * Determinism contract (DuckDB-verifiable): tokenization is the shared
  * `[a-z0-9]+` regex of q68/q70; BM25 per-term weights are IEEE doubles but
  * the per-doc SUM goes through the exact DECIMAL accumulator ([[dsum]]) so
  * accumulation order cannot change results; final scores are ROUNDED to 6
  * digits with doc_id tiebreaks before any ranking, the q70 convention that
  * makes the one permissible ulp between `ln` implementations unable to
  * reorder a top-k.
  */
object Search extends QueryModule {

  private val K1 = 1.2
  private val B = 0.75

  /** Index layout version, folded into the stamp: the stamp fingerprints
    * the CORPUS, so a layout change (e.g. the positions table added for
    * phrase search, or v3's segment column ON that table) must bump this
    * or an older on-disk index would still validate and miss tables or
    * columns the readers expect. */
  private val FORMAT = "v3"

  private def docs(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))

  /** One row per (doc, token occurrence) — the shared `[a-z0-9]+` tokenizer. */
  private def toks(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      explode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("tok"))

  /** One row per (doc, token occurrence, 1-based position) — the positional
    * side of the index ([[phraseSearch]]'s substrate). */
  private def posToks(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      posexplode(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("tok"), (col("p0") + 1).as("pos"))

  private val toksSql =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
      |  FROM documents)""".stripMargin

  /** The three index tables from a corpus slice, tagged with a segment id.
    * postings: (tok, doc_id, tf); doclen: (doc_id, dl); dict: per-term
    * (df, cf, max_tf) — df/cf are additive across segments (disjoint doc
    * sets), max_tf merges with MAX. */
  private def segmentTables(d: DataFrame, segment: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val post = toks(spread(d))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("segment", lit(segment))
    val dl = post.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("dl"))
      .withColumn("segment", lit(segment))
    val dict = post.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        max(col("tf")).as("max_tf"))
      .withColumn("segment", lit(segment))
    (post, dl, dict)
  }

  /** Public API: build and persist an inverted index for an ARBITRARY
    * corpus frame (doc_id, text, ...) — the fixture rigs are one caller,
    * not the API surface. Postings are repartitioned by term and sorted
    * within partitions by (tok, doc_id): at scale each output file covers
    * a narrow token range, so a term probe prunes to a handful of files
    * by parquet min/max stats — the parquet-native analog of a
    * posting-list seek. */
  def persistIndex(s: SparkSession, path: String, stamp: String,
                   d: DataFrame): Unit = {
    val (post, dl, dict) = segmentTables(d, segment = 0)
    graft.sources.IndexStore.write(s, path, stamp, Seq(
      "postings" -> post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id")),
      "positions" -> posToks(spread(d)).withColumn("segment", lit(0))
        .repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"), col("pos")),
      "doclen" -> dl,
      "dict" -> dict),
      meta = Map("k1" -> K1.toString, "b" -> B.toString, "tokenizer" -> "[a-z0-9]+"))
  }

  private[graft] def fixtureIndexPath(dir: String): String =
    "target/tmp/search_idx_" + dir.replaceAll("[^A-Za-z0-9.]+", "_")

  /** The stamp a current fixture index must carry: layout version +
    * corpus fingerprint. */
  private[graft] def fixtureStamp(s: SparkSession, dir: String): String =
    FORMAT + "|" +
      graft.sources.IndexStore.sourceStamp(s, Seq(s"$dir/documents.parquet"))

  /** Build-if-stale, then serve the stored tables (session-cached reads —
    * the store is the source of truth, the cache only saves re-opens). */
  private[graft] def searchIndex(s: SparkSession, dir: String): SearchIndex = {
    val path = fixtureIndexPath(dir)
    synchronized {
      val stamp = fixtureStamp(s, dir)
      if (!graft.sources.IndexStore.isCurrent(s, path, stamp))
        persistIndex(s, path, stamp, docs(s, dir))
    }
    loadIndex(s, path, cacheKey = Some(s"search:$dir"))
  }

  /** Public API: load a stored index's frames (optionally session-cached).
    * The positions table is lazy — only phrase probes open it. */
  def loadIndex(s: SparkSession, path: String,
                cacheKey: Option[String] = None): SearchIndex = {
    def rd(t: String) = {
      def b = graft.sources.IndexStore.read(s, path, t)
      cacheKey.fold(b)(k => graft.SessionCache.cached(s, s"$k:$t")(b))
    }
    SearchIndex(rd("postings"), rd("doclen"), rd("dict"), () => rd("positions"))
  }

  /** q163: build (or validate) the persisted inverted index, then answer a
    * dictionary audit FROM THE STORED TABLES ALONE — top-15 terms by
    * collection frequency. The oracle recomputes the same stats from the
    * raw corpus, so what is actually verified is the index CONTENT: a
    * postings row lost (or duplicated) by the build/swap would change df/cf
    * and hash-mismatch. */
  def invindexBuild(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val idx = searchIndex(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cf").desc, col("tok"))
    idx.dict
      .groupBy(col("tok"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
        max(col("max_tf")).as("max_tf"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 15)
      .select(col("tok"), col("df"), col("cf"), col("max_tf"), col("rn"))
  }

  private val dictSql =
    """tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
      |dict AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
      |         CAST(MAX(tf) AS BIGINT) AS max_tf
      |  FROM tf GROUP BY tok)""".stripMargin

  private val invindexBuildSql =
    s"""WITH $toksSql,
       |$dictSql
       |SELECT tok, df, cf, max_tf, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS INT) AS rn
       |  FROM dict)
       |WHERE rn <= 15""".stripMargin

  /** Deterministic fixture query set: every doc with doc_id % 50 = 7 poses
    * its first 3 distinct tokens as a query (qid = the posing doc_id). */
  /** Partition count for probe/query frames that feed broadcast-side
    * scoring joins. One row-group fixture scans arrive as a SINGLE
    * partition, which serializes the whole scoring pipeline onto one
    * task (measured on q214: two ~1.5-1.9 s single-task stages doing
    * the entire per-horizon BM25 scoring). But full `spread` is wrong
    * here too: every task pays a fixed ~0.5 s re-inflating the
    * broadcast hash relations it probes, so 32 near-empty probe slices
    * cost 17-23 s of CPU for 0.9 s of real work (measured; q214 went
    * 4.2 s -> 5.8 s). A small fixed slice count is the right posture at
    * ANY scale: in the broadcast-probe regime the probe set is
    * metadata-scale by definition, and once the index outgrows the
    * broadcast threshold the scoring join plans as a shuffle join whose
    * exchange re-partitions the probe side anyway, making this count
    * irrelevant. Measured on q214: 1 slice 4.20 s, 4 slices 3.02 s,
    * 32 slices 5.84 s (isolated min-of-3). */
  private val ProbeSlices = 4

  private[graft] def querySet(d: DataFrame): DataFrame =
    // re-slice BEFORE tokenizing: the shuffle moves only the ~2%
    // filtered probe docs, and the regex/explode then run in parallel
    d.filter(col("doc_id") % 50 === 7).repartition(ProbeSlices)
      .select(col("doc_id").as("qid"),
        explode(array_distinct(slice(
          regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)), 1, 3))).as("tok"))

  private val querySetSql =
    """queries AS (
      |  SELECT DISTINCT doc_id AS qid,
      |         unnest((regexp_extract_all(text, '[a-z0-9]+'))[1:3]) AS tok
      |  FROM documents WHERE doc_id % 50 = 7)""".stripMargin

  /** All (qid, doc_id) BM25 scores for the fixture query set against a
    * loaded index. The probe side (query terms) is tiny and broadcasts;
    * the postings join therefore scans only matching terms' postings —
    * the inverted-index win. Scores: per-term IEEE doubles, per-doc sum
    * through the DECIMAL accumulator, rounded to 6 with doc_id tiebreaks
    * downstream. */
  private def bm25Scores(s: SparkSession, dir: String, idx: SearchIndex): DataFrame =
    // session-cached: q164 (top-k) and q165 (eval/negatives) are two views
    // over the same scored (qid, doc) frame — score once per corpus
    graft.SessionCache.cached(s, s"search:bm25:$dir")(bm25(idx, querySet(docs(s, dir))))

  /** Public API: all (qid, doc_id) BM25 scores for an ARBITRARY query-term
    * frame (qid, tok) against a loaded index — corpus-free: every input is
    * the index's own tables plus the probe terms, so a restarted process
    * scores without touching (or even having) the original corpus. */
  def bm25(idx: SearchIndex, q: DataFrame): DataFrame = {
    val dict = idx.dict.groupBy(col("tok"))
      .agg(sum(col("df")).as("df"))
    val dl = idx.doclen.select(col("doc_id"), col("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // Join order measured both ways (r20): streaming the postings table
    // with the probe frame broadcast reads better on paper, but the
    // store's postings parquet is a single row group locally, so the
    // scan cannot split and the scoring serializes (q214 3.0 -> 3.7 s).
    // The unhinted shape below broadcasts whichever side the planner
    // estimates smaller — postings at bench SF (probe tasks bounded by
    // ProbeSlices), a shuffle join at scale once estimates outgrow the
    // threshold — and self-adapts without a hint.
    q.join(broadcast(dict.join(broadcast(q.select("tok").distinct()), "tok")), "tok")
      .join(idx.postings.select(col("tok"), col("doc_id"), col("tf")), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(dsum(col("w"), 12), 6).as("score"))
  }

  private val bm25ScoresSql =
    s"""$toksSql,
       |$dictSql,
       |tfp AS (SELECT tok, doc_id, COUNT(*) AS tf FROM toks GROUP BY tok, doc_id),
       |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
       |$querySetSql,
       |scored AS (
       |  SELECT q.qid, p.doc_id,
       |         round(CAST(SUM(CAST(
       |           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |             * (p.tf * ${K1 + 1.0}) /
       |             (p.tf + $K1 * (${1.0 - B} + $B * dl.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
       |         AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
       |  FROM queries q
       |  JOIN dict d ON d.tok = q.tok
       |  JOIN tfp p ON p.tok = q.tok
       |  JOIN dl ON dl.doc_id = p.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY q.qid, p.doc_id)""".stripMargin

  /** q164: BM25 top-5 per query from the persisted index (WindowGroupLimit
    * keeps the per-query rank a bounded top-k below the sort at scale). */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25Scores(s, dir, searchIndex(s, dir))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
  }

  private[graft] val bm25TopKSql =
    s"""WITH $bm25ScoresSql
       |SELECT qid, doc_id, score, rn FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored)
       |WHERE rn <= 5""".stripMargin

  /** q165: retrieval eval + hard-negative mining in one pass. Each query's
    * posing doc is its known-relevant positive; `pos_rank` is where BM25
    * ranks it (the MRR/recall input), and neg1..neg3 are the top-scoring
    * OTHER docs — exactly the "hard negatives" a contrastive retrieval
    * trainer mines (high-scoring non-positives). One ranking window over
    * the scored candidates serves both outputs. */
  def bm25Negatives(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val ranked = bm25Scores(s, dir, searchIndex(s, dir))
      .withColumn("rn", row_number().over(w))
    val pos = ranked.groupBy(col("qid"))
      .agg(min(when(col("doc_id") === col("qid"), col("rn"))).as("pos_rank"),
        count(lit(1)).as("n_cands"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rn"))
    val negs = ranked.filter(col("doc_id") =!= col("qid"))
      .withColumn("nr", row_number().over(w2))
      .filter(col("nr") <= 3)
      .groupBy(col("qid"))
      .agg(max(when(col("nr") === 1, col("doc_id"))).as("neg1"),
        max(when(col("nr") === 2, col("doc_id"))).as("neg2"),
        max(when(col("nr") === 3, col("doc_id"))).as("neg3"))
    pos.join(negs, "qid")
      .select(col("qid"), col("pos_rank"), col("n_cands"),
        col("neg1"), col("neg2"), col("neg3"))
  }

  private val bm25NegativesSql =
    s"""WITH $bm25ScoresSql,
       |ranked AS (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored),
       |pos AS (
       |  SELECT qid, CAST(MIN(CASE WHEN doc_id = qid THEN rn END) AS INT) AS pos_rank,
       |         CAST(COUNT(*) AS BIGINT) AS n_cands
       |  FROM ranked GROUP BY qid),
       |negs AS (
       |  SELECT qid,
       |         MAX(CASE WHEN nr = 1 THEN doc_id END) AS neg1,
       |         MAX(CASE WHEN nr = 2 THEN doc_id END) AS neg2,
       |         MAX(CASE WHEN nr = 3 THEN doc_id END) AS neg3
       |  FROM (SELECT qid, doc_id,
       |               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rn) AS nr
       |        FROM ranked WHERE doc_id <> qid)
       |  WHERE nr <= 3 GROUP BY qid)
       |SELECT p.qid, p.pos_rank, p.n_cands, n.neg1, n.neg2, n.neg3
       |FROM pos p JOIN negs n ON n.qid = p.qid""".stripMargin

  /** q166: segment-based incremental refresh, audited end-to-end. Builds a
    * base index over 3/4 of the corpus (segment 0), APPENDS the remaining
    * quarter as segment 1 ([[graft.sources.IndexStore.append]] — existing
    * segment files untouched), then answers the q163 dictionary audit from
    * the merged per-segment rows. The oracle recomputes the stats from the
    * FULL corpus: what is verified is that segment-merge reads (SUM over
    * per-segment df/cf, MAX over max_tf) equal a fresh whole-corpus build
    * — the additive-stats contract that makes append-only refresh sound.
    * n_segments is observable in the output, so a collapsed (rebuilt
    * rather than appended) index would fail the oracle too. */
  /** Branch the shared 3/4-corpus base index (built once per corpus stamp)
    * to a caller-private path and append the remaining quarter as segment 1
    * — the two-segment starting state of the refresh (q166) and compaction
    * (q178) rigs. Branch paths are PROCESS-unique: the rigs mutate their
    * index, so two JVMs sharing a working dir (Verify and Bench racing on
    * target/) must not interleave appends into one directory; the
    * in-process synchronized covers concurrent queries in one session.
    * The immutable BASE index builds once and each invocation BRANCHES it
    * by pure file copy (the q143 pattern) — repeat runs pay file IO, not
    * a recompute.
    */
  private[graft] def refreshedBranch(s: SparkSession, dir: String, tag: String): String = {
    val all = docs(s, dir)
    val base = all.filter(col("doc_id") % 4 =!= 3)
    val batch = all.filter(col("doc_id") % 4 === 3)
    val pid = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "")
    val sane = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val basePath = s"target/tmp/search_loop_base_$sane"
    val path = s"target/tmp/search_${tag}_${pid}_$sane"
    synchronized {
      val stamp = fixtureStamp(s, dir) + "|base75"
      if (!graft.sources.IndexStore.isCurrent(s, basePath, stamp))
        persistIndex(s, basePath, stamp, base)
      graft.sources.IndexStore.copy(s, basePath, path)
      val (post0, _, _) = segmentTables(batch, segment = 1)
      // checkpoint the increment's postings once: dl/dict derive from it,
      // so the tokenize+group pipeline runs once, not three times — then
      // the four appends (independent tables) overlap their job costs
      val post = post0.localCheckpoint()
      val dl = post.groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("dl")).withColumn("segment", lit(1))
      val dict = post.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          max(col("tf")).as("max_tf")).withColumn("segment", lit(1))
      graft.sources.IndexStore.inParallel(Seq(
        () => graft.sources.IndexStore.append(s, path, "postings",
          post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"))),
        () => graft.sources.IndexStore.append(s, path, "doclen", dl),
        () => graft.sources.IndexStore.append(s, path, "dict", dict),
        // the positional table refreshes the same way (disjoint doc sets
        // append cleanly), segment-tagged like the BM25 tables, so phrase
        // probes on a refreshed branch stay complete AND horizon-capable
        () => graft.sources.IndexStore.append(s, path, "positions",
          posToks(spread(batch)).withColumn("segment", lit(1))
            .repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"), col("pos")))))
    }
    path
  }

  /** Public API: a horizon view of a segment store — the index AS OF
    * `maxSeg`, i.e. before any later segment landed. A pure pushed-down
    * FILTER on the stored `segment` column of ALL FOUR index tables
    * (postings candidates, dictionary df, doclen's n_docs/avgdl, and —
    * since the v3 layout — the positional table), so horizon scores are
    * bit-identical to what the index served at that segment and phrase
    * probes see exactly the positions that existed then (closing the
    * horizon-free-phrase gap VERDICT r12 named). At scale parquet
    * min/max stats on `segment` prune whole appended files. The
    * positions filter stays inside the lazy thunk — BM25-only callers
    * still never open the positional table. */
  def asOfIndex(idx: SearchIndex, maxSeg: Int): SearchIndex =
    SearchIndex(
      idx.postings.filter(col("segment") <= maxSeg),
      idx.doclen.filter(col("segment") <= maxSeg),
      idx.dict.filter(col("segment") <= maxSeg),
      () => idx.positionsF().filter(col("segment") <= maxSeg))

  /** q214: as-of BM25 over the segment store — q210/q213's audit story
    * for the lexical family ("reproduce yesterday's ranking"). The
    * two-segment refreshed branch (base 3/4 corpus = segment 0, the
    * refreshed quarter = segment 1) answers the SAME query set twice:
    * horizon `full` (both segments — equal to a whole-corpus build by
    * the additive-stats contract q166 proves) and horizon `asof0`
    * (segment 0 only — the ranking the index served BEFORE the refresh,
    * including its smaller n_docs/avgdl/df collection statistics). The
    * oracle recomputes both horizons from the raw corpus: `full` from
    * all documents, `asof0` from the pre-refresh 3/4 subset, so a
    * horizon filter that leaked a segment-1 posting OR a stale
    * collection statistic hash-mismatches.
    */
  def bm25AsOf(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = refreshedBranch(s, dir, "asof")
    val idx = loadIndex(s, path)
    val q = querySet(docs(s, dir)).localCheckpoint()
    def topk(i: SearchIndex, name: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
      bm25(i, q).withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(lit(name).as("horizon"), col("qid"), col("doc_id"),
          col("score"), col("rn"))
    }
    topk(idx, "full").unionByName(topk(asOfIndex(idx, 0), "asof0"))
  }

  /** One suffixed BM25 scoring chain over an optionally filtered corpus —
    * q214's oracle needs the chain twice (full corpus and the pre-refresh
    * 3/4 subset) with disjoint CTE names; the score expression is kept
    * verbatim from [[bm25ScoresSql]] so float parity carries over.
    * `from` swaps the corpus source (q227 scores a derived CTE). */
  private def bm25ChainSql(sfx: String, docWhere: String,
      from: String = "documents"): String =
    s"""toks$sfx AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
       |  FROM $from$docWhere),
       |tfp$sfx AS (SELECT tok, doc_id, COUNT(*) AS tf FROM toks$sfx GROUP BY tok, doc_id),
       |dict$sfx AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tfp$sfx GROUP BY tok),
       |dl$sfx AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks$sfx GROUP BY doc_id),
       |stats$sfx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl$sfx),
       |scored$sfx AS (
       |  SELECT q.qid, p.doc_id,
       |         round(CAST(SUM(CAST(
       |           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |             * (p.tf * ${K1 + 1.0}) /
       |             (p.tf + $K1 * (${1.0 - B} + $B * dl$sfx.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
       |         AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
       |  FROM queries q
       |  JOIN dict$sfx d ON d.tok = q.tok
       |  JOIN tfp$sfx p ON p.tok = q.tok
       |  JOIN dl$sfx ON dl$sfx.doc_id = p.doc_id
       |  CROSS JOIN stats$sfx s
       |  GROUP BY q.qid, p.doc_id)""".stripMargin

  private val bm25AsOfSql =
    s"""WITH $querySetSql,
       |${bm25ChainSql("_f", "")},
       |${bm25ChainSql("_a", " WHERE doc_id % 4 <> 3")}
       |SELECT 'full' AS horizon, qid, doc_id, score, rn FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_f)
       |WHERE rn <= 5
       |UNION ALL
       |SELECT 'asof0' AS horizon, qid, doc_id, score, rn FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_a)
       |WHERE rn <= 5""".stripMargin

  def segmentRefresh(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = refreshedBranch(s, dir, "loop")
    val idx = loadIndex(s, path)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cf").desc, col("tok"))
    idx.dict
      .groupBy(col("tok"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
        max(col("max_tf")).as("max_tf"),
        countDistinct(col("segment")).as("n_segments"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 15)
      .select(col("tok"), col("df"), col("cf"), col("max_tf"),
        col("n_segments"), col("rn"))
  }

  private val segmentRefreshSql =
    s"""WITH $toksSql,
       |$dictSql,
       |seg AS (
       |  SELECT d.tok, d.df, d.cf, d.max_tf,
       |         CAST(COUNT(DISTINCT CASE WHEN t.doc_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_segments
       |  FROM dict d
       |  JOIN (SELECT DISTINCT tok, doc_id FROM toks) t ON t.tok = d.tok
       |  GROUP BY d.tok, d.df, d.cf, d.max_tf)
       |SELECT tok, df, cf, max_tf, n_segments, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS INT) AS rn
       |  FROM seg)
       |WHERE rn <= 15""".stripMargin

  /** Public API: compact a persisted search index in place —
    * [[Dedup.compactIndex]] / [[Similarity.compactVecIndex]]'s lexical
    * twin, the maintenance op an append-forever segment refresh (q166)
    * eventually needs. All segments collapse into segment 0; the
    * dictionary is recomputed from the merged postings (per-term stats
    * are additive across segments' disjoint doc sets, so the rebuild
    * equals the SUM/MAX merge readers were computing); postings land in
    * freshly term-sorted files, restoring the min/max-prunable layout
    * that many small segment appends erode. Input is ONLY the stored
    * tables (localCheckpointed first — the rewrite reads the very files
    * it replaces); stamp and meta are preserved; readers mid-compact see
    * old or new, never a mix (the store's write-then-rename swap).
    * The positions table is re-sorted by term so its file pruning is
    * restored too, with its segment tags collapsed to 0 like every other
    * table — its CONTENT is already complete and needs no recompute.
    */
  def compactSearchIndex(s: SparkSession, path: String): Unit = {
    val stamp = graft.sources.IndexStore.readStamp(s, path).getOrElse("manual")
    val meta = graft.sources.IndexStore.readMeta(s, path)
    // the three materializations are independent reads of distinct stored
    // tables — overlap their job costs (each is a small fixed-overhead job)
    var post, posn, dl: DataFrame = null
    graft.sources.IndexStore.inParallel(Seq(
      () => post = graft.sources.IndexStore.read(s, path, "postings")
        .withColumn("segment", lit(0)).localCheckpoint(),
      () => posn = graft.sources.IndexStore.read(s, path, "positions")
        .withColumn("segment", lit(0)).localCheckpoint(),
      () => dl = graft.sources.IndexStore.read(s, path, "doclen")
        .withColumn("segment", lit(0)).localCheckpoint()))
    val dict = post.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"), max(col("tf")).as("max_tf"))
      .withColumn("segment", lit(0))
    graft.sources.IndexStore.write(s, path, stamp, Seq(
      "postings" -> post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id")),
      "positions" -> posn
        .repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"), col("pos")),
      "doclen" -> dl,
      "dict" -> dict), meta)
  }

  /** q178: segment compaction, audited end-to-end — the q166 rig taken one
    * step further: branch, refresh to two segments, COMPACT back to one,
    * and answer the same dictionary audit from the compacted store. The
    * oracle recomputes from the full corpus with n_segments pinned to 1:
    * a compaction that lost or duplicated a postings row changes df/cf and
    * hash-mismatches; one that failed to collapse segments fails on
    * n_segments. */
  def segmentCompact(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = refreshedBranch(s, dir, "cpt")
    synchronized { compactSearchIndex(s, path) }
    val idx = loadIndex(s, path)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cf").desc, col("tok"))
    idx.dict
      .groupBy(col("tok"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"),
        max(col("max_tf")).as("max_tf"),
        countDistinct(col("segment")).as("n_segments"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 15)
      .select(col("tok"), col("df"), col("cf"), col("max_tf"),
        col("n_segments"), col("rn"))
  }

  private val segmentCompactSql =
    s"""WITH $toksSql,
       |$dictSql
       |SELECT tok, df, cf, max_tf, CAST(1 AS BIGINT) AS n_segments, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS INT) AS rn
       |  FROM dict)
       |WHERE rn <= 15""".stripMargin

  // ---- q219: streaming index refresh through the exactly-once ledger ----

  /** The four tables every search-index store carries — one definition
    * shared by the streaming commit path and its readers, so a table
    * added later cannot silently escape the cross-table visibility
    * rule. */
  private[graft] val indexTableNames =
    Seq("postings", "doclen", "dict", "positions")

  /** The deterministic arrival-doc slices for the streaming refresh rig:
    * the refreshed quarter (doc_id % 4 == 3, the [[refreshedBranch]]
    * contract) split into two disjoint micro-batches, so base + both
    * batches == the whole corpus and the streamed index's BM25 equals
    * the whole-corpus build by additive-stats composition (q166). */
  private[graft] def arrivalDocBatches(s: SparkSession, dir: String): Seq[(Int, DataFrame)] = {
    val d = docs(s, dir)
    Seq(1 -> d.filter(col("doc_id") % 8 === 3),
      2 -> d.filter(col("doc_id") % 8 === 7))
  }

  /** One doc slice rendered as the four index tables WITHOUT a segment
    * data column — the partition directory carries the segment id in the
    * streaming layout. Postings/positions keep the term-sorted file
    * discipline [[persistIndex]] pins (min/max-prunable term probes);
    * dl/dict derive from the checkpointed postings so the tokenize
    * pipeline runs once per slice. */
  private def streamTables(d: DataFrame): Seq[(String, DataFrame)] = {
    val sd = spread(d)
    val post = toks(sd).groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    Seq(
      "postings" -> post.repartition(col("tok"))
        .sortWithinPartitions(col("tok"), col("doc_id")),
      "doclen" -> post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")),
      "dict" -> post.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          max(col("tf")).as("max_tf")),
      "positions" -> posToks(sd).repartition(col("tok"))
        .sortWithinPartitions(col("tok"), col("doc_id"), col("pos")))
  }

  /** The q219 streaming store's path — process-unique and reaped at JVM
    * exit, like the vector family's streaming store. */
  private[graft] def streamIndexPath(dir: String): String =
    "target/tmp/search_stream_" + graft.operators.Similarity.processTag +
      "_" + dir.replaceAll("[^A-Za-z0-9.]+", "_")

  /** Fresh-seed the streaming search index, partition-dir-first: the base
    * corpus (3/4 of docs) lands as committed `segment=0` of all four
    * tables through the SAME exactly-once commit path every later
    * micro-batch uses. Stamp written last (a crashed seed never
    * validates). */
  private[graft] def seedStreamIndex(s: SparkSession, dir: String): String = {
    val path = streamIndexPath(dir)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val base = docs(s, dir).filter(col("doc_id") % 4 =!= 3)
    // the four tables derive from one checkpointed tokenize — their
    // writes are independent jobs, so overlap them (the q214 refresh
    // pattern); on a fresh dir all four must report "wrote"
    val wrote = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.sources.IndexStore.inParallel(streamTables(base).map {
      case (t, df) => () =>
        if (graft.sources.IndexStore.appendSegmentIfAbsent(s, path, t, "segment", 0L, df))
          wrote.incrementAndGet(): Unit
    })
    require(wrote.get == indexTableNames.size,
      s"fresh streaming index at $path had segments")
    graft.sources.IndexStore.writeStamp(s, path,
      "searchstream1|" + fixtureStamp(s, dir))
    graft.operators.Similarity.cleanupAtExit(path)
    path
  }

  /** Commit one arriving doc micro-batch as tagged segment `segId` of
    * ALL FOUR tables, then DELIBERATELY re-commit every table (the
    * crash-recovery replay). Returns the WRITTEN-TABLE COUNTS of the two
    * passes: a correct ledger yields (4, 0) for a fresh segment and
    * (0, 0) when the segment is already fully committed (the
    * post-compaction replay q220 pins — tombstone markers must still
    * answer "committed"). A real crash between two tables' first commits
    * leaves the segment invisible (the cross-table visibility rule
    * intersects the per-table ledgers) until the replay completes the
    * stragglers — at which point it appears atomically. */
  private[graft] def streamIndexCommit(s: SparkSession, path: String,
      segId: Long, batch: DataFrame): (Int, Int) = {
    // frames are built (one tokenize, checkpointed) only if some table
    // still needs this segment — a fully-committed replay is the marker
    // stats alone, never a Spark job (the metadata-no-op the exactly-once
    // contract promises recovering streams)
    lazy val frames = streamTables(batch)
    def commitAll(): Int =
      if (indexTableNames.forall(t => graft.sources.IndexStore
            .segmentCommitted(s, path, t, "segment", segId))) 0
      else {
        // independent per-table writes over the shared checkpointed
        // tokenize — overlap them like the seed does
        val wrote = new java.util.concurrent.atomic.AtomicInteger(0)
        graft.sources.IndexStore.inParallel(frames.map { case (t, df) => () =>
          if (graft.sources.IndexStore.appendSegmentIfAbsent(s, path, t, "segment", segId, df))
            wrote.incrementAndGet(): Unit
        })
        wrote.get
      }
    val first = commitAll()
    val replay = commitAll()
    (first, replay)
  }

  /** The CROSS-TABLE visible segment set of the streamed search store: a
    * segment is readable iff committed in EVERY table (no torn
    * multi-table view survives a crash between two tables' commits). */
  private[graft] def streamVisibleSegments(s: SparkSession, path: String): Seq[Long] =
    graft.sources.IndexStore.commonCommittedSegments(
      s, path, indexTableNames, "segment")

  /** The streamed store's four tables loaded over an EXPLICIT visible
    * segment set — every reader of the multi-table store goes through
    * this, so the cross-table visibility rule cannot be bypassed. */
  private def streamIndexAt(s: SparkSession, path: String,
      vis: Seq[Long]): SearchIndex = {
    def rd(t: String) =
      graft.sources.IndexStore.readSegments(s, path, t, "segment", vis)
    SearchIndex(rd("postings"), rd("doclen"), rd("dict"), () => rd("positions"))
  }

  /** The q164 top-5 over a visible-segment view of the streamed store. */
  private def streamTopK(s: SparkSession, dir: String, path: String,
      vis: Seq[Long]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25(streamIndexAt(s, path, vis), querySet(docs(s, dir)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
  }

  /** The streamed store served through the cross-table visibility rule,
    * plus the audit columns the oracle pins — n_segments counted from
    * the store's DATA (not the ledger, which keeps tombstones after
    * compaction) and the rig's replay flag. */
  private[graft] def streamSearchResult(s: SparkSession, dir: String,
      path: String, replayNoop: Boolean): DataFrame = {
    val vis = streamVisibleSegments(s, path)
    val nseg = graft.sources.IndexStore
      .readSegments(s, path, "postings", "segment", vis)
      .agg(countDistinct(col("segment")).as("n_segments"))
    streamTopK(s, dir, path, vis)
      .crossJoin(broadcast(nseg))
      .withColumn("replay_was_noop", lit(replayNoop))
  }

  /** q219's oracle: the whole-corpus q164 chain (streamed segments
    * compose additively to whole-corpus statistics — the q166 property)
    * with the audit constants pinned: 3 segments (seed + one per
    * micro-batch), every deliberate replay a no-op. */
  private[graft] val bm25StreamRefreshSql = {
    val anchor = "SELECT qid, doc_id, score, rn FROM ("
    require(bm25TopKSql.contains(anchor), "q219 oracle anchor drifted")
    bm25TopKSql.replace(anchor,
      "SELECT qid, doc_id, score, rn, CAST(3 AS BIGINT) AS n_segments, " +
        "TRUE AS replay_was_noop FROM (")
  }

  /** Per-table (sort, range) file discipline for the streamed store's
    * compaction: the same term-sorted layout [[persistIndex]] writes, so
    * a compacted store's probes stay min/max-prunable seeks. */
  private[graft] val streamCompactCols: Map[String, Seq[String]] = Map(
    "postings" -> Seq("tok", "doc_id"),
    "doclen" -> Seq("doc_id"),
    "dict" -> Seq("tok"),
    "positions" -> Seq("tok", "doc_id", "pos"))

  /** q220's result: the q164 top-5 from the COMPACTED streamed store,
    * with n_segments audited from the data (must be 1 — every committed
    * row collapsed under segment 0) and the post-compaction replay flag
    * (both arrival batches re-committed against the tombstoned ledger
    * must write NOTHING in any table). */
  private[graft] def streamSearchCompactResult(s: SparkSession, dir: String,
      path: String, replayNoop: Boolean): DataFrame =
    streamSearchResult(s, dir, path, replayNoop)
      .withColumnRenamed("replay_was_noop", "replay_after_compact")

  /** q220's oracle: compaction must not change a single score — the
    * whole-corpus q164 chain again, with the post-compaction constants
    * pinned: ONE data segment, every replayed commit a metadata no-op. */
  private[graft] val bm25StreamCompactSql = {
    val anchor = "SELECT qid, doc_id, score, rn FROM ("
    require(bm25TopKSql.contains(anchor), "q220 oracle anchor drifted")
    bm25TopKSql.replace(anchor,
      "SELECT qid, doc_id, score, rn, CAST(1 AS BIGINT) AS n_segments, " +
        "TRUE AS replay_after_compact FROM (")
  }

  /** q221's result: the SAME query set answered at horizon full (all
    * three segments) and horizon 1 (seed + first micro-batch — the index
    * as it stood before batch 2 landed). The horizon bounds the visible
    * segment set itself (intersected per-table ledgers filtered to
    * `<= h`), so the pruned segment's directories never enter any
    * table's file index, and the asof leg's collection statistics
    * (n_docs/avgdl/df) are exactly the smaller ones the index served
    * then. */
  private[graft] def streamSearchAsOfResult(s: SparkSession, dir: String,
      path: String): DataFrame = {
    val vis = streamVisibleSegments(s, path)
    def leg(h: Long, name: String): DataFrame =
      streamTopK(s, dir, path, vis.filter(_ <= h))
        .select(lit(name).as("horizon"), col("qid"), col("doc_id"),
          col("score"), col("rn"))
    leg(Long.MaxValue, "full").unionByName(leg(1L, "asof1"))
  }

  /** q221's oracle: both horizons recomputed from the raw corpus — full
    * from all documents, asof1 from seed + batch 1 (doc_id % 8 <> 7:
    * the seed is doc_id % 4 <> 3 and batch 1 is doc_id % 8 = 3, see
    * [[arrivalDocBatches]]), so a leaked batch-2 posting OR a stale
    * collection statistic hash-mismatches. */
  private[graft] val bm25StreamAsOfSql =
    s"""WITH $querySetSql,
       |${bm25ChainSql("_f", "")},
       |${bm25ChainSql("_a", " WHERE doc_id % 8 <> 7")}
       |SELECT 'full' AS horizon, qid, doc_id, score, rn FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_f)
       |WHERE rn <= 5
       |UNION ALL
       |SELECT 'asof1' AS horizon, qid, doc_id, score, rn FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_a)
       |WHERE rn <= 5""".stripMargin

  // ---- q222: takedown (right-to-be-forgotten) over the persisted index ----

  /** The docs q222 erases: a deterministic ~4% slice, disjoint by
    * construction from the query-posing docs (doc_id % 50 = 7 implies
    * doc_id % 25 = 7, never 3) so the query set itself is unaffected —
    * what changes is who may still be RETRIEVED. */
  private val takedownKeep = col("doc_id") % 25 =!= 3

  /** Build-if-stale the post-takedown BRANCH of the fixture index: ONE
    * pass over the stored index tables — the corpus is never re-read and
    * nothing is re-tokenized. That is the erasure path a takedown
    * (right-to-be-forgotten / copyright removal) needs at 100 TB: a
    * rebuild is O(corpus) tokenize + shuffle, this is O(index) filter +
    * one aggregation. postings / doclen / positions drop the erased
    * docs' rows by a pushed predicate (for an arbitrary takedown list: a
    * broadcast anti-join); dict is an aggregate OVER docs, so it cannot
    * be filtered — it REBUILDS from the retained postings, shrinking
    * df/cf/max_tf exactly where the erased docs contributed (a stale
    * dict row would shift every idf and hash-mismatch the oracle).
    * Process-unique branch path, reaped at JVM exit. */
  private[graft] def takedownBranch(s: SparkSession, dir: String): String = {
    val idx = searchIndex(s, dir)
    val path = fixtureIndexPath(dir) + "_takedown_" +
      graft.operators.Similarity.processTag
    val stamp = "takedown1|" + fixtureStamp(s, dir)
    synchronized {
      if (!graft.sources.IndexStore.isCurrent(s, path, stamp)) {
        val post = idx.postings.filter(takedownKeep).localCheckpoint()
        val dict = post.groupBy(col("tok"), col("segment"))
          .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
            max(col("tf")).as("max_tf"))
          .select(col("tok"), col("df"), col("cf"), col("max_tf"), col("segment"))
        graft.sources.IndexStore.write(s, path, stamp, Seq(
          "postings" -> post.repartition(col("tok"))
            .sortWithinPartitions(col("tok"), col("doc_id")),
          "doclen" -> idx.doclen.filter(takedownKeep),
          "dict" -> dict,
          "positions" -> idx.positions.filter(takedownKeep)
            .repartition(col("tok"))
            .sortWithinPartitions(col("tok"), col("doc_id"), col("pos"))),
          meta = Map("takedown" -> "doc_id % 25 = 3"))
        graft.operators.Similarity.cleanupAtExit(path)
      }
    }
    path
  }

  /** q222: the q164 probe answered from the post-takedown branch, plus
    * the two audit columns that make the erasure itself oracled:
    * `n_docs` (the shrunken collection size — BM25 idf/avgdl must
    * reflect it) and `removed_traces` (rows for erased docs remaining
    * anywhere in the branch: postings + doclen + positions — pinned 0,
    * so a single surviving row of an erased doc fails the gate even if
    * it never reaches a top-5). */
  def searchTakedown(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = takedownBranch(s, dir)
    val tIdx = loadIndex(s, path, cacheKey = Some(s"search:takedown:$dir"))
    val erased = col("doc_id") % 25 === 3
    val traces = Seq(tIdx.postings, tIdx.doclen, tIdx.positions)
      .map(_.filter(erased).agg(count(lit(1)).as("n")))
      .reduce(_ unionByName _).agg(sum(col("n")).as("removed_traces"))
    val audit = tIdx.doclen.agg(count(lit(1)).as("n_docs"))
      .crossJoin(traces)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25(tIdx, querySet(docs(s, dir)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
      .crossJoin(broadcast(audit))
  }

  /** q222's oracle: the whole BM25 chain recomputed from the FILTERED
    * corpus — equality proves the O(index) erasure equals a full
    * rebuild (scores, idf, and the smaller n_docs/avgdl all shift where
    * the erased docs contributed) — with zero surviving traces pinned. */
  private[graft] val searchTakedownSql =
    s"""WITH $querySetSql,
       |${bm25ChainSql("_t", " WHERE doc_id % 25 <> 3")}
       |SELECT qid, doc_id, score, rn,
       |       (SELECT n_docs FROM stats_t) AS n_docs,
       |       CAST(0 AS BIGINT) AS removed_traces
       |FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_t)
       |WHERE rn <= 5""".stripMargin

  // ---- q227: feed-driven index sync (the lake leads, the index follows) ----

  /** Apply one drained change-feed window to a stored flat search index,
    * O(delta + index): the DELETE leg is q222's erasure generalized to an
    * arbitrary broadcast id list (postings/doclen/positions anti-joined,
    * dict rebuilt per segment from the retained postings), the INSERT leg
    * is the q166 refresh (the batch tokenized once, appended as the next
    * segment of all four tables, writes overlapped). Deletes first, so
    * the rewrite never touches the rows the append is about to add. The
    * corpus is never re-read: both legs consume only the feed rows and
    * the stored tables. */
  private[graft] def applyFeedToIndex(s: SparkSession, path: String, seg: Int,
      inserts: DataFrame, deleteIds: DataFrame): Unit = {
    // schema evolution through the feed (VERDICT r15 item 5): the lake
    // accepts mergeSchema'd commits, so a feed window can legally carry
    // columns the v1 index layout has no home for. ADDITIVE non-key
    // columns are CARRIED — they land in the `docmeta` side table (one
    // row per evolved insert, read back with mergeSchema so successive
    // windows may evolve differently), leaving every v1 table's schema
    // and every v1 probe untouched, the index-store analog of the lake's
    // mergeSchema=true. KEY/TYPE changes still refuse loudly: a doc_id
    // that stopped being a long (or a missing text) is not evolution,
    // it is a different feed — silently casting would desync index from
    // lake (ADVICE r15: the old name-only check let a retyped doc_id
    // through to fail obscurely later).
    import org.apache.spark.sql.types.{LongType, StringType}
    val fields = inserts.schema.fields.map(f => f.name -> f.dataType).toMap
    require(fields.get("doc_id").contains(LongType) &&
        fields.get("text").contains(StringType),
      s"applyFeedToIndex: incompatible schema-evolved feed — insert batch " +
        s"(${inserts.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}) " +
        "must carry doc_id:bigint and text:string; a key or type change needs " +
        "an explicit index-layout version, not a silent cast")
    val extras = inserts.columns.filterNot(Set("doc_id", "text")).toSeq
    def rd(t: String) = graft.sources.IndexStore.read(s, path, t)
    def hasDocMeta = graft.sources.IndexStore.tableNames(s, path).contains("docmeta")
    if (!deleteIds.isEmpty) {
      val ids = broadcast(deleteIds.select(col("doc_id")).localCheckpoint())
      val post = rd("postings").join(ids, Seq("doc_id"), "left_anti").localCheckpoint()
      val dict = post.groupBy(col("tok"), col("segment"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          max(col("tf")).as("max_tf"))
        .select(col("tok"), col("df"), col("cf"), col("max_tf"), col("segment"))
        .localCheckpoint()
      val dl = rd("doclen").join(ids, Seq("doc_id"), "left_anti").localCheckpoint()
      val pos = rd("positions").join(ids, Seq("doc_id"), "left_anti").localCheckpoint()
      // the evolved side table (if any earlier window created it) is a
      // doc-keyed table like doclen — the erasure applies there too
      val dm = if (hasDocMeta)
        Some(readDocMeta(s, path).join(ids, Seq("doc_id"), "left_anti").localCheckpoint())
      else None
      graft.sources.IndexStore.inParallel(Seq(
        () => graft.sources.IndexStore.replaceTable(s, path, "postings",
          post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"))),
        () => graft.sources.IndexStore.replaceTable(s, path, "dict", dict),
        () => graft.sources.IndexStore.replaceTable(s, path, "doclen", dl),
        () => graft.sources.IndexStore.replaceTable(s, path, "positions",
          pos.repartition(col("tok"))
            .sortWithinPartitions(col("tok"), col("doc_id"), col("pos")))) ++
        dm.map(d => () => graft.sources.IndexStore.replaceTable(s, path, "docmeta", d)))
    }
    if (!inserts.isEmpty) {
      val core = inserts.select(col("doc_id"), col("text"))
      val (post0, dl, dict) = segmentTables(core, seg)
      val post = post0.localCheckpoint()
      graft.sources.IndexStore.inParallel(Seq(
        () => graft.sources.IndexStore.append(s, path, "postings",
          post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"))),
        () => graft.sources.IndexStore.append(s, path, "doclen", dl),
        () => graft.sources.IndexStore.append(s, path, "dict", dict),
        () => graft.sources.IndexStore.append(s, path, "positions",
          posToks(spread(core)).withColumn("segment", lit(seg))
            .repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"), col("pos")))) ++
        (if (extras.nonEmpty) Seq(() => graft.sources.IndexStore.append(s, path, "docmeta",
          inserts.select((Seq(col("doc_id")) ++ extras.map(col)
            :+ lit(seg).cast("int").as("segment")).toIndexedSeq: _*)))
         else Seq.empty))
    }
  }

  /** The evolved-column side table a schema-evolved feed window creates:
    * one row per evolved insert, `(doc_id, <carried cols…>, segment)`.
    * Read with mergeSchema — successive windows may each add different
    * columns, and the union schema (absent values null) is exactly the
    * lake's mergeSchema contract mirrored. Docs ingested before any
    * evolution simply have no row (a left join reads their carried
    * columns as null). Kilobyte-to-megabyte table; the merge-footer cost
    * is per-file metadata, never a data scan. */
  private[graft] def readDocMeta(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(
      new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path), "docmeta").toString)

  /** q227: the capstone composition — the LAKE is the source of truth and
    * the search index FOLLOWS it through the change feed, O(delta):
    *  1. v1 commits the corpus; the index is built FROM THE LAKE;
    *  2. v2 deletes the q225 works (doc_id % 97 = 13), v3 appends new
    *     arrivals (the % 31 = 2 slice under fresh ids — including
    *     re-ingestions of just-deleted texts, which the feed handles
    *     naturally: the old doc is erased, the new doc ranks);
    *  3. the v1->v3 feed is drained ONCE and applied to the index —
    *     its D rows drive the q222 erasure, its insert rows land as the
    *     next segment (the q166 refresh); the corpus is never rescanned.
    * The oracle rebuilds BM25 from the lake's CURRENT logical state
    * (filtered + appended documents), so the synced index must be
    * bit-equal to a from-scratch rebuild — feed-driven maintenance with
    * zero drift. Audits: the feed's insert/delete counts and zero
    * surviving traces of the deleted docs. */
  def feedSyncedSearch(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = feedSyncStore(s, dir)
    val meta = graft.sources.IndexStore.readMeta(s, path)
    val idx = loadIndex(s, path)
    val erased = col("doc_id") % 97 === 13 && col("doc_id") < 500000L
    val traces = Seq(idx.postings, idx.doclen, idx.positions)
      .map(_.filter(erased).agg(count(lit(1)).as("n")))
      .reduce(_ unionByName _).agg(sum(col("n")).as("removed_traces"))
    val audit = idx.doclen.agg(count(lit(1)).as("n_docs"))
      .crossJoin(traces)
      .withColumn("n_feed_inserts", lit(meta("n_feed_inserts").toLong))
      .withColumn("n_feed_deletes", lit(meta("n_feed_deletes").toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25(idx, querySet(docs(s, dir)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
      .crossJoin(broadcast(audit))
  }

  /** Build-if-stale the feed-synced store q227 probes — the q222
    * warm-substrate convention (VERDICT r14 item 3): the one-time lake
    * commit + from-lake index build + feed drain + apply land ONCE per
    * (process, corpus) behind a stamp check, so the benched recurring
    * cost is the WARM probe; the one-time build cost is the rung's
    * documented linear term. The final stamp is written only AFTER the
    * feed apply (a crash mid-sync fails the stamp and rebuilds); the
    * feed's counts land in the store meta so the probe audits them
    * without re-draining the feed. */
  private[graft] def feedSyncStore(s: SparkSession, dir: String): String = {
    val idxPath = "target/tmp/search_sync_" +
      graft.operators.Similarity.processTag + "_" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val stamp = "feedsync2|" + fixtureStamp(s, dir)
    synchronized {
      if (!graft.sources.IndexStore.isCurrent(s, idxPath, stamp)) {
        val f = docFeedFixture(s, dir, "feedsync")
        persistIndex(s, idxPath, "feedsync-building", f.base)
        graft.operators.Similarity.cleanupAtExit(idxPath)
        applyFeedToIndex(s, idxPath, seg = 1, f.inserts, f.deleteIds)
        graft.sources.IndexStore.writeStamp(s, idxPath, stamp, Map(
          "n_feed_inserts" -> f.inserts.count().toString,
          "n_feed_deletes" -> f.deleteIds.count().toString))
      }
    }
    idxPath
  }

  /** One drained feed cycle over a documents lake, shared by the q227
    * physical and q231 masked sync-store builders (MaskFoldSpec's
    * fold-equality contract assumes both stores saw the SAME feed):
    * v1 commits the corpus; v2 deletes the q225 works (doc_id % 97 =
    * 13); v3 appends the % 31 = 2 arrivals under fresh ids; the v1→v3
    * feed drained once. `base` is the v1 snapshot read — stable under
    * the later commits. */
  private case class DocFeed(base: DataFrame, inserts: DataFrame,
      deleteIds: DataFrame, insertsEvolved: DataFrame)

  private def docFeedFixture(s: SparkSession, dir: String, name: String): DocFeed = {
    val lake = graft.sources.RoundTrip.freshLake(s, name, dir)
    val d = docs(s, dir)
    val v1 = graft.sources.Snapshots.commit(d, lake, append = false)
    val base = graft.sources.Snapshots.read(s, lake, v1)
    graft.sources.Snapshots.commitDelete(
      d.filter(col("doc_id") % 97 === 13).select("doc_id"), lake)
    val v3 = graft.sources.Snapshots.commit(
      d.filter(col("doc_id") % 31 === 2)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"), col("lang")),
      lake, append = true)
    val feed = graft.sources.Snapshots.changes(s, lake, v1, v3).localCheckpoint()
    DocFeed(base,
      feed.filter(col("_change_type") === "insert").select(col("doc_id"), col("text")),
      feed.filter(col("_change_type") === "delete").select(col("doc_id")),
      // the evolved view of the same insert window: the lake's rows carry
      // `lang`, which the v1 index layout has no home for — the q238
      // carry path consumes this; q227/q231 keep the projected view
      feed.filter(col("_change_type") === "insert")
        .select(col("doc_id"), col("text"), col("lang")))
  }

  /** q227's oracle: BM25 rebuilt from the lake's current logical state —
    * originals minus the deleted works, plus the appended arrivals under
    * their fresh ids — with the feed counts and zero traces pinned. */
  private[graft] val feedSyncedSearchSql =
    s"""WITH synced AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 13
       |  UNION ALL
       |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 31 = 2),
       |$querySetSql,
       |${bm25ChainSql("_s", "", from = "synced")}
       |SELECT qid, doc_id, score, rn,
       |       (SELECT n_docs FROM stats_s) AS n_docs,
       |       CAST(0 AS BIGINT) AS removed_traces,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 31 = 2)
       |         AS n_feed_inserts,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 97 = 13)
       |         AS n_feed_deletes
       |FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_s)
       |WHERE rn <= 5""".stripMargin

  // ---- q231: feed sync with O(delta) MASKED deletes (the delete-mask
  // sidecar — VERDICT r14 item 2) ----

  /** Build-if-stale the mask-synced search store: the same lake and the
    * same v1→v3 change feed as q227, but the delete leg lands as the
    * [[graft.sources.IndexStore.DeleteMaskTable]] sidecar — a kilobyte
    * `(doc_id, seq)` row-set — instead of q227's four-table physical
    * rewrite. That makes the RECURRING feed apply O(delta) end-to-end:
    * the insert leg was always delta-sized (one new segment, the q166
    * refresh); now the delete leg writes delta-sized bytes too. The mask
    * is sequence-scoped (`seq` = the segment horizon when the delete
    * window drained, here 0): it hides only rows of segments ≤ seq, so
    * a later re-insertion of a masked doc_id lands in a NEWER segment
    * and is immediately visible — the lake's own Iceberg-v2 scoping rule
    * (q151) applied to the index. Deletes are masked BEFORE the insert
    * segment commits, same ordering as q227. The final stamp is written
    * only after both legs, so a crash mid-sync rebuilds. Takedown
    * (q222) deliberately does NOT use this path: erasure must remove
    * bytes, a mask only hides them. */
  private[graft] def maskSyncStore(s: SparkSession, dir: String): String = {
    val idxPath = "target/tmp/search_msync_" +
      graft.operators.Similarity.processTag + "_" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val stamp = "masksync1|" + fixtureStamp(s, dir)
    synchronized {
      if (!graft.sources.IndexStore.isCurrent(s, idxPath, stamp)) {
        val f = docFeedFixture(s, dir, "masksync")
        persistIndex(s, idxPath, "masksync-building", f.base)
        graft.operators.Similarity.cleanupAtExit(idxPath)
        // MASKED delete leg: O(delta) bytes — the rewrite q227 pays is gone
        graft.sources.IndexStore.appendDeleteMask(s, idxPath,
          f.deleteIds.withColumn("seq", lit(0L)))
        // insert leg: identical to q227's (deletes first, then the new segment)
        applyFeedToIndex(s, idxPath, seg = 1, f.inserts, f.deleteIds.limit(0))
        // auto-fold policy check (VERDICT r15 item 2): the fixture's
        // ~1% deleted fraction sits below the 0.1 default, so the mask
        // STAYS here (q231's pre-fold semantics are the point); q237
        // exercises the fired path under a deployment-tightened knob
        val folded = graft.sources.IndexStore.autoFoldIfNeeded(
          s, idxPath, "doclen", "doc_id")(foldDeleteMask(s, idxPath))
        graft.sources.IndexStore.writeStamp(s, idxPath, stamp, Map(
          "n_feed_inserts" -> f.inserts.count().toString,
          "n_feed_deletes" -> f.deleteIds.count().toString,
          "auto_folded" -> folded.toString))
      }
    }
    idxPath
  }

  /** Apply a loaded delete mask to one segment-tagged index table:
    * broadcast anti-join on the key, scoped to segments at or below the
    * mask row's seq. */
  private def applyMask(df: DataFrame, mask: DataFrame): DataFrame =
    df.join(broadcast(mask),
      df("doc_id") === mask("doc_id") && df("segment") <= mask("seq"), "left_anti")

  /** The as-of × mask COMPOSITION (VERDICT r15 item 4): a horizon read
    * of a masked store sees the segments at or below the horizon, masked
    * ONLY by mask rows already visible there (`mask.seq <= h`) — a
    * delete drained AFTER the horizon must not reach back into it, just
    * as a segment committed after it doesn't. Both bounds are pushed
    * filters: the segment one prunes files (the q214 path), the mask one
    * trims the kilobyte broadcast before the anti-join. */
  private[graft] def maskedAsOf(df: DataFrame, mask: DataFrame, h: Long): DataFrame =
    applyMask(df.filter(col("segment") <= h), mask.filter(col("seq") <= h))

  /** Fold the delete mask into the physical layout and DROP it — the
    * compaction step that ends a mask's life (the lake folds its delete
    * files the same way, q153's compact). One anti-join rewrite per
    * table + the per-segment dict rebuild from retained postings (the
    * q222/q227 erasure shape), then the sidecar is removed. After the
    * fold the store is bit-identical to one whose deletes were applied
    * physically at feed time — MaskFoldSpec pins that equality against
    * the q227 store. */
  private[graft] def foldDeleteMask(s: SparkSession, path: String): Unit =
    graft.sources.IndexStore.readDeleteMask(s, path).foreach { mask0 =>
      val mask = mask0.localCheckpoint()
      def rd(t: String) = graft.sources.IndexStore.read(s, path, t)
      val post = applyMask(rd("postings"), mask).localCheckpoint()
      val dict = post.groupBy(col("tok"), col("segment"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
          max(col("tf")).as("max_tf"))
        .select(col("tok"), col("df"), col("cf"), col("max_tf"), col("segment"))
        .localCheckpoint()
      val dl = applyMask(rd("doclen"), mask).localCheckpoint()
      val pos = applyMask(rd("positions"), mask).localCheckpoint()
      val dm = if (graft.sources.IndexStore.tableNames(s, path).contains("docmeta"))
        Some(applyMask(readDocMeta(s, path), mask).localCheckpoint())
      else None
      graft.sources.IndexStore.inParallel(Seq(
        () => graft.sources.IndexStore.replaceTable(s, path, "postings",
          post.repartition(col("tok")).sortWithinPartitions(col("tok"), col("doc_id"))),
        () => graft.sources.IndexStore.replaceTable(s, path, "dict", dict),
        () => graft.sources.IndexStore.replaceTable(s, path, "doclen", dl),
        () => graft.sources.IndexStore.replaceTable(s, path, "positions",
          pos.repartition(col("tok"))
            .sortWithinPartitions(col("tok"), col("doc_id"), col("pos")))) ++
        dm.map(d => () => graft.sources.IndexStore.replaceTable(s, path, "docmeta", d)))
      graft.sources.IndexStore.dropTable(s, path,
        graft.sources.IndexStore.DeleteMaskTable)
    }

  /** q231: the q164 probe over the mask-synced store. Masked docs are
    * filtered from CANDIDATES by a broadcast anti-join applied after the
    * term-keyed postings probe (so the scan still reads only the query
    * terms' postings — the mask never forces a full-index pass), while
    * corpus-level statistics (df, n_docs, avgdl) remain those of the
    * PHYSICAL store until compaction folds the mask in — Lucene's
    * documented deleted-docs semantics, the price of the O(delta) delete
    * leg, stated rather than hidden (the oracle computes stats from the
    * same physical population, so the trade is itself hash-pinned; the
    * fold→physical equality is MaskFoldSpec's job). Audits: the physical
    * and live doc counts, the mask size, and the feed counts. */
  def maskedFeedSync(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = maskSyncStore(s, dir)
    val meta = graft.sources.IndexStore.readMeta(s, path)
    val idx = loadIndex(s, path)
    // a stamped store WITHOUT a mask is the legal post-fold state
    // (ADVICE r15): degrade to the empty mask — the anti-join no-ops and
    // physical == live, which is exactly what a folded store serves
    val mask = graft.sources.IndexStore.readDeleteMaskOrEmpty(s, path, "doc_id")
      .localCheckpoint()
    val live = applyMask(idx.doclen, mask)
    val audit = idx.doclen.agg(count(lit(1)).as("n_docs_physical"))
      .crossJoin(live.agg(count(lit(1)).as("n_live")))
      .crossJoin(mask.agg(count(lit(1)).as("n_mask_rows")))
      .withColumn("n_feed_inserts", lit(meta("n_feed_inserts").toLong))
      .withColumn("n_feed_deletes", lit(meta("n_feed_deletes").toLong))
    val mIdx = SearchIndex(applyMask(idx.postings, mask), idx.doclen,
      idx.dict, () => applyMask(idx.positions, mask))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25(mIdx, querySet(docs(s, dir)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
      .crossJoin(broadcast(audit))
  }

  /** q231's oracle: BM25 over the PHYSICAL population (v1 corpus plus
    * the appended arrivals — deleted docs still counted in df/n_docs/
    * avgdl, the documented pre-fold semantics) with masked doc_ids
    * removed from candidates only. */
  private[graft] val maskedFeedSyncSql =
    s"""WITH physical AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 31 = 2),
       |$querySetSql,
       |${bm25ChainSql("_m", "", from = "physical")},
       |mask AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 13)
       |SELECT qid, doc_id, score, rn,
       |       (SELECT n_docs FROM stats_m) AS n_docs_physical,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM dl_m
       |        WHERE doc_id NOT IN (SELECT doc_id FROM mask)) AS n_live,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM mask) AS n_mask_rows,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 31 = 2)
       |         AS n_feed_inserts,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM mask) AS n_feed_deletes
       |FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_m
       |  WHERE doc_id NOT IN (SELECT doc_id FROM mask))
       |WHERE rn <= 5""".stripMargin

  // ---- q237: the auto-fold policy FIRING (VERDICT r15 item 2) ----

  /** Build-if-stale the auto-folded sync store: q231's masked feed apply
    * run under a deployment-TIGHTENED fold threshold (0.005, passed as
    * an explicit parameter of this build — never a session-conf
    * mutation), so the fixture's ~1% deleted fraction CROSSES it and
    * the policy check at the end of the feed apply fires
    * [[foldDeleteMask]] — the same function a manual compaction calls.
    * The store this leaves behind is physically identical to q227's
    * (mask folded in, sidecar dropped); whether the policy fired is
    * recorded in the stamp meta so the probe audits it without
    * re-deriving the fraction. */
  private[graft] def autoFoldSyncStore(s: SparkSession, dir: String): String = {
    val idxPath = "target/tmp/search_afold_" +
      graft.operators.Similarity.processTag + "_" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val stamp = "autofold1|" + fixtureStamp(s, dir)
    synchronized {
      if (!graft.sources.IndexStore.isCurrent(s, idxPath, stamp)) {
        val f = docFeedFixture(s, dir, "autofold")
        persistIndex(s, idxPath, "autofold-building", f.base)
        graft.operators.Similarity.cleanupAtExit(idxPath)
        graft.sources.IndexStore.appendDeleteMask(s, idxPath,
          f.deleteIds.withColumn("seq", lit(0L)))
        applyFeedToIndex(s, idxPath, seg = 1, f.inserts, f.deleteIds.limit(0))
        // the tightened threshold is a parameter of THIS build, not a
        // session mutation: a conf set/restore window would be observed
        // by any concurrently-building masked store in the same session
        // and spuriously fold its mask (ADVICE r16)
        val folded = graft.sources.IndexStore.autoFoldIfNeeded(
          s, idxPath, "doclen", "doc_id", threshold = Some(0.005))(
          foldDeleteMask(s, idxPath))
        graft.sources.IndexStore.writeStamp(s, idxPath, stamp, Map(
          "n_feed_inserts" -> f.inserts.count().toString,
          "n_feed_deletes" -> f.deleteIds.count().toString,
          "auto_folded" -> folded.toString))
      }
    }
    idxPath
  }

  /** q237: the q164 probe over the auto-folded store — the delete-mask
    * lifecycle COMPLETED by policy rather than by hand. The audit pins
    * what the trigger restored: the mask is gone (`n_mask_rows` 0 via
    * the empty-mask degradation), collection statistics are LIVE counts
    * again (`n_docs` equals the lake's current population — the
    * documented Lucene-style drift of q231 is over), and `auto_folded`
    * is the policy verdict itself, which the oracle RE-DERIVES from the
    * raw corpus (deleted fraction vs the 0.005 knob) rather than
    * trusting the meta. Scores equal q227's physically-synced store's —
    * fold-by-policy ≡ fold-by-hand ≡ physical-at-feed-time. */
  def autoFoldFeedSync(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = autoFoldSyncStore(s, dir)
    val meta = graft.sources.IndexStore.readMeta(s, path)
    val idx = loadIndex(s, path)
    val mask = graft.sources.IndexStore.readDeleteMaskOrEmpty(s, path, "doc_id")
      .localCheckpoint()
    val audit = idx.doclen.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(mask.agg(count(lit(1)).as("n_mask_rows"))))
      .withColumn("auto_folded", lit(meta("auto_folded").toBoolean))
      .withColumn("n_feed_inserts", lit(meta("n_feed_inserts").toLong))
      .withColumn("n_feed_deletes", lit(meta("n_feed_deletes").toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    bm25(idx, querySet(docs(s, dir)))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
      .crossJoin(broadcast(audit))
  }

  /** q237's oracle: the post-fold store is the lake's current logical
    * state (q227's chain), and the policy verdict is re-derived from raw
    * counts — deleted fraction over the PHYSICAL pre-fold population
    * (base + arrivals, the population the policy saw) vs the tightened
    * 0.005 knob. */
  private[graft] val autoFoldFeedSyncSql =
    s"""WITH synced AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 13
       |  UNION ALL
       |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 31 = 2),
       |$querySetSql,
       |${bm25ChainSql("_a", "", from = "synced")}
       |SELECT qid, doc_id, score, rn,
       |       (SELECT n_docs FROM stats_a) AS n_docs,
       |       CAST(0 AS BIGINT) AS n_mask_rows,
       |       ((SELECT COUNT(*) FROM documents WHERE doc_id % 97 = 13) * 1.0 /
       |        ((SELECT COUNT(*) FROM documents) +
       |         (SELECT COUNT(*) FROM documents WHERE doc_id % 31 = 2)) > 0.005)
       |         AS auto_folded,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 31 = 2)
       |         AS n_feed_inserts,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 97 = 13)
       |         AS n_feed_deletes
       |FROM (
       |  SELECT qid, doc_id, score,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS rn
       |  FROM scored_a)
       |WHERE rn <= 5""".stripMargin

  // ---- q238: schema-evolution CARRY through the feed (VERDICT r15 item 5) ----

  /** Build-if-stale the evolved-feed sync store: q227's lake and feed,
    * but the insert window is applied in its EVOLVED shape — the lake
    * rows carry `lang`, a column the v1 index layout has no home for —
    * exercising [[applyFeedToIndex]]'s additive-carry path: the extra
    * column lands in the `docmeta` side table, every v1 table keeps its
    * schema. Deletes stay physical (the q227 leg) so the carried rows
    * ride through the erasure's docmeta anti-join too on later windows. */
  private[graft] def evolvedSyncStore(s: SparkSession, dir: String): String = {
    val idxPath = "target/tmp/search_esync_" +
      graft.operators.Similarity.processTag + "_" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val stamp = "evolvedsync1|" + fixtureStamp(s, dir)
    synchronized {
      if (!graft.sources.IndexStore.isCurrent(s, idxPath, stamp)) {
        val f = docFeedFixture(s, dir, "evolvedsync")
        persistIndex(s, idxPath, "evolvedsync-building", f.base)
        graft.operators.Similarity.cleanupAtExit(idxPath)
        applyFeedToIndex(s, idxPath, seg = 1, f.insertsEvolved, f.deleteIds)
        graft.sources.IndexStore.writeStamp(s, idxPath, stamp, Map(
          "n_feed_inserts" -> f.inserts.count().toString,
          "n_feed_deletes" -> f.deleteIds.count().toString))
      }
    }
    idxPath
  }

  /** q238: READ the evolved column through the synced index — per-lang
    * counts of the carried rows straight from the docmeta side table,
    * with the audit that proves the carry is complete and consistent:
    * `n_meta` (carried rows) equals the feed's insert count, every
    * carried row joins a doc the index actually serves
    * (`n_meta_indexed`), and `n_docs` is the synced population. The
    * oracle recomputes all of it from the raw corpus — a dropped or
    * duplicated carry row hash-mismatches. */
  def evolvedFeedSync(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val path = evolvedSyncStore(s, dir)
    val dm = readDocMeta(s, path)
    val idx = loadIndex(s, path)
    val audit = idx.doclen.agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(dm.agg(count(lit(1)).as("n_meta"))))
      .crossJoin(broadcast(
        dm.join(idx.doclen, Seq("doc_id")).agg(count(lit(1)).as("n_meta_indexed"))))
    dm.groupBy(col("lang")).agg(count(lit(1)).as("n_new"))
      .crossJoin(broadcast(audit))
  }

  /** q238's oracle: the carried rows are exactly the feed's arrivals,
    * so their per-lang counts (and the audit) all derive from raw
    * documents. */
  private[graft] val evolvedFeedSyncSql =
    s"""WITH arrivals AS (
       |  SELECT doc_id + 500000 AS doc_id, lang FROM documents WHERE doc_id % 31 = 2)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_new,
       |       ((SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE doc_id % 97 <> 13)
       |        + (SELECT CAST(COUNT(*) AS BIGINT) FROM arrivals)) AS n_docs,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM arrivals) AS n_meta,
       |       (SELECT CAST(COUNT(*) AS BIGINT) FROM arrivals) AS n_meta_indexed
       |FROM arrivals GROUP BY lang""".stripMargin

  // ---- q235: index-store manifest (the ops DESCRIBE surface) ----

  /** q235: the introspection read every production index deployment runs
    * before trusting a store — one row per stored table with its row
    * count, enumerated from [[graft.sources.IndexStore.tableNames]] (the
    * store's own directory listing, so a table the build forgot or a
    * stray extra table changes the ROW SET, not just a count). What
    * makes this a correctness gate rather than a debug print: every
    * count is oracled from the RAW CORPUS — postings rows are the
    * distinct (token, doc) pairs, doclen the tokened docs, dict the
    * distinct tokens, positions the total token occurrences — so a
    * build that dropped or duplicated rows in ANY table hash-mismatches
    * even if every registered probe happens to still rank correctly.
    * Cost at scale: one metadata listing + one count per table
    * (count(*) collapses map-side; no shuffle of data rows). */
  def indexManifest(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    searchIndex(s, dir) // build-if-stale; the manifest reads the STORE
    val path = fixtureIndexPath(dir)
    graft.sources.IndexStore.tableNames(s, path)
      .map(t => graft.sources.IndexStore.read(s, path, t)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("tbl"), col("n_rows")))
      .reduce(_ unionByName _)
  }

  /** q235's oracle: each table's cardinality recomputed from raw text. */
  private[graft] val indexManifestSql =
    s"""WITH $toksSql
       |SELECT 'dict' AS tbl, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_rows FROM toks
       |UNION ALL
       |SELECT 'doclen', CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM toks
       |UNION ALL
       |SELECT 'positions', CAST(COUNT(*) AS BIGINT) FROM toks
       |UNION ALL
       |SELECT 'postings', (SELECT CAST(COUNT(*) AS BIGINT)
       |                    FROM (SELECT DISTINCT tok, doc_id FROM toks))""".stripMargin

  /** q170: exact phrase search over the POSITIONAL side of the persisted
    * index — the query LSH/BM25 cannot answer ("these words, adjacent, in
    * order"). Each probe phrase (3 consecutive tokens lifted from a
    * deterministic slice of the corpus, so every phrase has at least its
    * source doc as a match) resolves as a positional self-join: the first
    * term's postings anchor the probe, and each subsequent term must
    * appear in the same doc at pos+1 / pos+2 — equi-joins on (doc, pos)
    * after a term-keyed probe, the standard positional-intersection plan.
    * Overlapping occurrences count (position semantics, not substring
    * consumption). At scale each join leg scans only its term's
    * position rows (term-sorted files, min/max pruned); cost is the
    * postings of the PHRASE terms, like q164.
    */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val idx = searchIndex(s, dir)
    phraseProbe(phraseSet(docs(s, dir)), idx.positions)
  }

  /** The deterministic 3-token probe-phrase set (one per doc_id % 97 == 11
    * doc: tokens 2..4), shared by q170 and the q216 horizon probe. */
  private def phraseSet(d: DataFrame): DataFrame =
    d.filter(col("doc_id") % 97 === 11)
      .select(col("doc_id").as("qid"),
        slice(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)), 2, 3).as("ph"))
      .filter(size(col("ph")) === 3)
      .select(col("qid"), element_at(col("ph"), 1).as("t0"),
        element_at(col("ph"), 2).as("t1"), element_at(col("ph"), 3).as("t2"))

  /** The positional-intersection plan, one definition for every phrase
    * query: term-keyed probe on t0, then equi-joins on (doc, pos-1) /
    * (doc, pos-2) — each leg scans only its term's position rows. */
  private def phraseProbe(ph: DataFrame, pos: DataFrame): DataFrame =
    ph.join(pos.select(col("tok").as("t0"), col("doc_id"), col("pos")), "t0")
      .join(pos.select(col("tok").as("t1"), col("doc_id"), (col("pos") - 1).as("pos")),
        Seq("doc_id", "pos", "t1"))
      .join(pos.select(col("tok").as("t2"), col("doc_id"), (col("pos") - 2).as("pos")),
        Seq("doc_id", "pos", "t2"))
      .groupBy(col("qid"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))

  private val phraseSearchSql =
    """WITH ptoks AS (
      |  SELECT doc_id, l[i] AS tok, i AS pos
      |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS l FROM documents),
      |       LATERAL unnest(range(1, len(l) + 1)) AS u(i)),
      |ph AS (
      |  SELECT doc_id AS qid, l[2] AS t0, l[3] AS t1, l[4] AS t2
      |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS l
      |        FROM documents WHERE doc_id % 97 = 11)
      |  WHERE len(l) >= 4)
      |SELECT qid, CAST(COUNT(DISTINCT p0.doc_id) AS BIGINT) AS n_docs,
      |       COUNT(*) AS n_occ, MIN(p0.doc_id) AS first_doc
      |FROM ph
      |JOIN ptoks p0 ON p0.tok = ph.t0
      |JOIN ptoks p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.tok = ph.t1
      |JOIN ptoks p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.tok = ph.t2
      |GROUP BY qid""".stripMargin

  /** q216: phrase search AT A HORIZON — q214's audit story carried to the
    * POSITIONAL side of the segment store (the capability round 14's
    * segment-tagged positions layout exists for). The two-segment
    * refreshed branch answers the SAME probe-phrase set twice: horizon
    * `full` (both segments — equals a whole-corpus q170 by the disjoint-
    * doc-append contract) and horizon `asof0` (segment 0 only — exactly
    * the occurrences the index could prove BEFORE the refresh). The
    * horizon is [[asOfIndex]]'s pushed `segment <= 0` parquet filter on
    * the positions table, not a restore; at scale file-level min/max
    * stats on `segment` skip every appended file. Probe phrases come
    * from the WHOLE corpus, so phrases sourced from refreshed-quarter
    * docs (doc_id 11 exists at every SF: 11 % 97 == 11, 11 % 4 == 3)
    * lose at least their own occurrence at asof0 — the horizons differ
    * by construction. Oracle recomputes both horizons from raw text; a
    * leaked segment-1 position hash-mismatches the asof0 leg.
    */
  def phraseAsOf(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val idx = loadIndex(s, refreshedBranch(s, dir, "phasof"))
    val ph = phraseSet(docs(s, dir)).localCheckpoint()
    def leg(i: SearchIndex, name: String): DataFrame =
      phraseProbe(ph, i.positions)
        .select(lit(name).as("horizon"), col("qid"), col("n_docs"),
          col("n_occ"), col("first_doc"))
    leg(idx, "full").unionByName(leg(asOfIndex(idx, 0), "asof0"))
  }

  /** One suffixed positional chain over an optionally filtered corpus —
    * q216's oracle needs q170's chain twice (whole corpus and the
    * pre-refresh 3/4 subset) with disjoint CTE names. */
  private def phraseChainSql(sfx: String, docWhere: String): String =
    s"""ptoks$sfx AS (
       |  SELECT doc_id, l[i] AS tok, i AS pos
       |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS l FROM documents$docWhere),
       |       LATERAL unnest(range(1, len(l) + 1)) AS u(i))""".stripMargin

  private def phraseLegSql(h: String, sfx: String): String =
    s"""SELECT '$h' AS horizon, qid, CAST(COUNT(DISTINCT p0.doc_id) AS BIGINT) AS n_docs,
       |       COUNT(*) AS n_occ, MIN(p0.doc_id) AS first_doc
       |FROM ph
       |JOIN ptoks$sfx p0 ON p0.tok = ph.t0
       |JOIN ptoks$sfx p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1 AND p1.tok = ph.t1
       |JOIN ptoks$sfx p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2 AND p2.tok = ph.t2
       |GROUP BY qid""".stripMargin

  private val phraseAsOfSql =
    s"""WITH ${phraseChainSql("_f", "")},
       |${phraseChainSql("_a", " WHERE doc_id % 4 <> 3")},
       |ph AS (
       |  SELECT doc_id AS qid, l[2] AS t0, l[3] AS t1, l[4] AS t2
       |  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS l
       |        FROM documents WHERE doc_id % 97 = 11)
       |  WHERE len(l) >= 4)
       |${phraseLegSql("full", "_f")}
       |UNION ALL
       |${phraseLegSql("asof0", "_a")}""".stripMargin

  /** Shared fixture augmentation for the set-join: shifted copies (near
    * pairs) + exact copies guarantee qualifying pairs at every SF. Same
    * shape as the dedup family's rig, independent so this module stays
    * self-contained. */
  private def pjDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), expr("substr(text, 11)").as("text")))
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))

  private val pjDocsSql =
    """pj AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, substr(text, 11) FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** q167: EXACT all-pairs Jaccard >= 0.8 over word-3-gram shingle sets via
    * prefix filtering (the AllPairs/PPJoin scheme) — the exact-threshold
    * complement to the probabilistic MinHash-LSH family (q61): no false
    * negatives by construction, no signatures to tune.
    *
    * How it scales: order every set by GLOBAL shingle rarity (ascending
    * document frequency, shingle tiebreak). A pair with Jaccard >= t must
    * share a token within the first |x| - ceil(t|x|) + 1 tokens of each
    * side's ordering — so only those PREFIX tokens enter the candidate
    * equi-join, and because prefixes hold each set's RAREST tokens, bucket
    * sizes are the small document frequencies of rare terms, not the skewed
    * ones (contrast a naive token join, where one stopword bucket goes
    * quadratic). Candidates then verify with an exact intersection count.
    * Every step is an equi-join/groupBy: token-keyed shuffles, no cartesian.
    *
    * Exact-arithmetic thresholding: with t = 4/5, prefix length is
    * n - ceil(4n/5) + 1 computed as `n - ((4n + 4) div 5) + 1` (integer
    * ceiling), the length filter is `5 * least(na, nb) >= 4 * greatest`,
    * and the Jaccard gate c/(na+nb-c) >= 4/5 is `9c >= 4(na+nb)` — all
    * integers, so engine float behavior cannot move the boundary; the
    * reported `jac` is display-only (rounded, after the integer gate).
    * The oracle brute-forces all pairs (length-filtered token self-join)
    * — equality with the prefix-filtered result IS the no-false-negative
    * guarantee, machine-checked. */
  def prefixSetJoin(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    // word 3-gram shingles: discriminative enough that a set's rarest
    // tokens (the prefix) have genuinely small document frequencies —
    // the property prefix filtering's candidate bound lives on
    // every downstream operation keys on a 96-bit (xxhash64, murmur3)
    // pair of the shingle, computed ONCE here, never the ~25-byte
    // string — the same compact-exchange-key pattern (and the same
    // immaterial n^2/2^96 collision odds) as Similarity.vecGroups /
    // Dedup.dupGroups. The string is dropped at the substrate: the
    // prefix ordering ties break on (k1, k2) instead — still ONE global
    // total order on tokens, which is all the prefix-filter theorem
    // needs (candidates may differ, but verification is exact and the
    // oracle brute-forces all pairs, so results cannot move) — and the
    // cached frame, the window shuffle, and its sort all shrink to
    // fixed-width longs (guide §2.3: narrower types, project early).
    val sets = graft.SessionCache.cached(s, s"search:pjsets:$dir") {
      spread(pjDocs(docs(s, dir)))
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1), element_at(ws, i+2)))")).as("sh"))
        .select(col("doc_id"),
          xxhash64(col("sh")).as("k1"), hash(col("sh")).as("k2"))
        .distinct()
    }
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val gdf = sets.groupBy(col("k1"), col("k2")).agg(count(lit(1)).as("gdf"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("gdf"), col("k1"), col("k2"))
    val prefixes = sets.join(gdf, Seq("k1", "k2")).join(sizes, "doc_id")
      .withColumn("r", row_number().over(wOrd))
      .filter(col("r") <= col("n") - ((lit(4) * col("n") + 4) / 5).cast("long") + 1)
      .select(col("doc_id"), col("k1"), col("k2"), col("n"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2") &&
          col("a.doc_id") < col("b.doc_id") &&
          lit(5) * least(col("a.n"), col("b.n")) >= lit(4) * greatest(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()
    val c = cand
      .join(sets.select(col("doc_id").as("da"), col("k1"), col("k2")), "da")
      .join(sets.select(col("doc_id").as("db"), col("k1"), col("k2")), Seq("db", "k1", "k2"))
      .groupBy(col("da"), col("db"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .filter(lit(9) * col("n_inter") >= lit(4) * (col("n_a") + col("n_b")))
      .withColumn("jac",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6))
    // global top-20 via orderBy+limit so the plan is TakeOrderedAndProject
    // (per-partition heaps + driver merge of 20), never a single-partition
    // sort of every verified pair; the rank column is then assigned over
    // the 20 surviving rows only — constant cost at any scale.
    val top = c.orderBy(col("jac").desc, col("da"), col("db")).limit(20)
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("jac").desc, col("da"), col("db"))
    top.withColumn("rn", row_number().over(wRank))
      .select(col("da"), col("db"), col("n_a"), col("n_b"),
        col("n_inter"), col("jac"), col("rn"))
  }

  private val prefixSetJoinSql =
    s"""WITH $pjDocsSql,
       |sh AS (
       |  SELECT DISTINCT doc_id, s[i] || ' ' || s[i+1] || ' ' || s[i+2] AS sh
       |  FROM (SELECT doc_id, s, unnest(range(1, len(s) - 1)) AS i
       |        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM pj)
       |        WHERE len(s) >= 3)),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |pairs AS (
       |  SELECT i.da, i.db, na.n AS n_a, nb.n AS n_b, i.c
       |  FROM inter i
       |  JOIN sz na ON na.doc_id = i.da
       |  JOIN sz nb ON nb.doc_id = i.db
       |  WHERE 9 * i.c >= 4 * (na.n + nb.n))
       |SELECT da, db, n_a, n_b, n_inter, jac, rn FROM (
       |  SELECT da, db, n_a, n_b, c AS n_inter,
       |         round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) AS jac,
       |         CAST(ROW_NUMBER() OVER (
       |           ORDER BY round(CAST(c AS DOUBLE) / (n_a + n_b - c), 6) DESC, da, db) AS INT) AS rn
       |  FROM pairs)
       |WHERE rn <= 20""".stripMargin

  /** q190: hashed-linear quality-classifier inference SERVED FROM THE
    * PERSISTED INDEX — the fastText-style "model-based quality filter"
    * step of a curation pipeline (score every document with a linear
    * bag-of-words model, keep above threshold), with two scale properties
    * the naive form lacks:
    *  - inference reads the postings table, not the corpus: the tf
    *    aggregation already happened at index-build time, so scoring is
    *    one weighted sum per (tok, doc) posting with map-side combine —
    *    re-tokenizing 100 TB to apply a filter would dwarf the model math;
    *  - the model is the HASHING TRICK taken to its limit: the token's
    *    portable 60-bit digest indexes the weight table implicitly
    *    (w = md5_60('qw'||tok) % 2001 - 1000, integer micro-units), so
    *    there is no weight vector to ship — stand-in weights for a
    *    trained model delivered the same way (a broadcast dictionary or
    *    a second hash salt), with the plumbing identical.
    * Integer logits end-to-end: keep/drop decisions and per-lang sums are
    * bit-exact cross-engine — no sigmoid needed for a threshold gate
    * (monotone transform, same decision boundary). Docs with no tokens
    * score 0 via the left join and fail the strict > 0 keep gate.
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val idx = searchIndex(s, dir)
    val scored = idx.postings
      .withColumn("w", md5Long(concat(lit("qw"), col("tok"))) % 2001 - 1000)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("logit_micro"))
    docs(s, dir).select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("logit_micro", coalesce(col("logit_micro"), lit(0L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("logit_micro") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum(col("logit_micro")).as("sum_logit"))
  }

  private val qualityClassifierSql =
    s"""WITH $toksSql,
       |tfs AS (
       |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks GROUP BY doc_id, tok),
       |scored AS (
       |  SELECT doc_id,
       |         CAST(SUM(tf * (((('0x' || substr(md5('qw' || tok), 1, 15))::BIGINT) % 2001) - 1000)) AS BIGINT) AS logit_micro
       |  FROM tfs GROUP BY doc_id)
       |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN COALESCE(s.logit_micro, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |       CAST(SUM(COALESCE(s.logit_micro, 0)) AS BIGINT) AS sum_logit
       |FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
       |GROUP BY d.lang""".stripMargin

  /** Text-side classifier scoring for ARRIVING documents (the streaming
    * admission path, q194): tokenizes the batch directly — an arrival is
    * not in the index yet, so unlike [[qualityClassifier]]'s corpus
    * scoring (which reads the persisted postings) this pays O(batch)
    * tokenization, the right cost for an admission gate. Same implicit
    * hashed weights, same integer micro-logits: a document's logit is a
    * pure function of its own text, so any micro-batching yields
    * identical decisions — streaming == batch by construction.
    */
  private[graft] def classifyDocs(d: DataFrame): DataFrame = {
    val scored = toks(d)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("w", md5Long(concat(lit("qw"), col("tok"))) % 2001 - 1000)
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("w")).as("logit_micro"))
    d.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .withColumn("logit_micro", coalesce(col("logit_micro"), lit(0L)))
  }

  /** q193: hybrid retrieval — the BM25 lexical ranker (from the persisted
    * inverted index) and the exact cosine vector ranker fused by
    * Reciprocal Rank Fusion (Cormack et al. 2009), the standard trick for
    * combining rankers whose scores live on incomparable scales: each
    * ranker contributes 1/(60 + rank) for its top-10, summed per (query,
    * doc). Queries are a FIXED, deterministic probe sample: the first
    * `spark.graft.hybrid.probes` (default 16) ids of the q164 query
    * stream (doc_id % 50 = 7) that also carry an embedding — a probe
    * budget that does NOT grow with the corpus (the q64 16-probe
    * pattern), so corpus size only enters through what each probe reads.
    * Scale shape: the lexical leg rides the session-cached BM25 frame
    * (only query-term postings are read); the vector leg serves from the
    * PERSISTED IVF index (the q184 probe path — stored centroids, a
    * driver-side <= probes-long cluster cover, a cid-pruned scan of the
    * range-sorted assign table), so it reads only the probed clusters'
    * bytes and never touches the raw corpus at probe time. Fusion itself
    * joins two top-10-per-query frames — negligible. RRF contributions
    * are integer micro-units (10^9 div (60 + rank)) so fused scores and
    * tie-breaks are bit-exact cross-engine; vector ranks order by the
    * ROUNDED cosine (the q191 pattern) so sub-ulp fold-order noise
    * cannot flip a rank cross-engine.
    */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = org.apache.spark.sql.expressions.Window
    val probeBudget = s.conf.get("spark.graft.hybrid.probes", "16").toInt
    val maxQid = 50L * probeBudget // query ids 7, 57, ..., 7 + 50*(P-1)
    val embCount = table(s, dir, "embeddings").count()
    val wl = w.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    val lex = bm25Scores(s, dir, searchIndex(s, dir))
      .filter(col("qid") < embCount && col("qid") < maxQid)
      .withColumn("r", row_number().over(wl)).filter(col("r") <= 10)
      .select(col("qid"), col("doc_id"), col("r").as("rlex"))
    val (_, assign) = graft.operators.Similarity.corpusIvfIndex(s, dir)
    val qa = assign.filter(col("vec_id") % 50 === 7 && col("vec_id") < maxQid)
      .select(col("vec_id").as("qid"), col("cid"),
        col("embedding").as("qemb"), col("nrm").as("nq"))
    // driver-side cluster cover: <= probeBudget longs — the IN(cids)
    // predicate parquet min/max pruning applies to the cid-sorted
    // assign files, skipping every unprobed cluster's bytes
    val probeCids = qa.select(col("cid")).distinct().collect().map(_.getLong(0)).sorted
    val dotE = expr(
      "aggregate(zip_with(qemb, vemb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)")
    val cosv = assign.filter(col("cid").isInCollection(probeCids.toSeq))
      .select(col("vec_id").as("vid"), col("cid"),
        col("embedding").as("vemb"), col("nrm").as("nv"))
      .join(broadcast(qa), Seq("cid"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cosim0", dotE / (col("nq") * col("nv")))
    val wv = w.partitionBy(col("qid")).orderBy(round(col("cosim0"), 9).desc, col("vid"))
    val vec = cosv.withColumn("r", row_number().over(wv)).filter(col("r") <= 10)
      .select(col("qid"), col("vid").as("doc_id"), col("r").as("rvec"))
    val fused = lex.join(vec, Seq("qid", "doc_id"), "outer")
      .withColumn("rrf_micro",
        (coalesce(expr("1000000000 div (60 + rlex)"), lit(0)) +
          coalesce(expr("1000000000 div (60 + rvec)"), lit(0))).cast("long"))
    val wf = w.partitionBy(col("qid")).orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rn", row_number().over(wf)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("rrf_micro"), col("rn"))
  }

  private val hybridRrfSql =
    s"""WITH $bm25ScoresSql,
       |lex AS (
       |  SELECT qid, doc_id, r FROM (
       |    SELECT qid, doc_id,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS r
       |    FROM scored WHERE qid < (SELECT COUNT(*) FROM embeddings) AND qid < 800)
       |  WHERE r <= 10),
       |eflat AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS xd
       |  FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding)+1)) AS i
       |        FROM embeddings)),
       |enorms AS (
       |  SELECT vec_id, sqrt(CAST(SUM(CAST(xd*xd AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
       |  FROM eflat GROUP BY vec_id),
       |cent AS (SELECT vec_id AS cid, pos, xd AS cx FROM eflat
       |         WHERE vec_id % (SELECT CAST(ceil(sqrt(COUNT(*))) AS BIGINT) FROM embeddings) = 0),
       |adots AS (
       |  SELECT f.vec_id, c.cid, CAST(SUM(CAST(f.xd*c.cx AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM eflat f JOIN cent c ON f.pos = c.pos
       |  GROUP BY f.vec_id, c.cid),
       |acos AS (
       |  SELECT a.vec_id, a.cid, a.dot / (n2.nrm * n1.nrm) AS cosim
       |  FROM adots a JOIN enorms n1 ON n1.vec_id = a.vec_id JOIN enorms n2 ON n2.vec_id = a.cid),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosim DESC, cid) AS rn
       |    FROM acos)
       |  WHERE rn = 1),
       |qa AS (SELECT vec_id AS qid, cid FROM assign
       |       WHERE vec_id % 50 = 7 AND vec_id < 800),
       |vdots AS (
       |  SELECT p.qid, p.vid, CAST(SUM(CAST(a.xd*b.xd AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM (SELECT q.qid, v.vec_id AS vid
       |        FROM qa q JOIN assign v ON v.cid = q.cid AND v.vec_id <> q.qid) p
       |  JOIN eflat a ON a.vec_id = p.qid
       |  JOIN eflat b ON b.vec_id = p.vid AND b.pos = a.pos
       |  GROUP BY p.qid, p.vid),
       |vcos AS (
       |  SELECT qid, vid, dot / (a.nrm * b.nrm) AS cosim
       |  FROM vdots JOIN enorms a ON a.vec_id = qid JOIN enorms b ON b.vec_id = vid),
       |vec AS (
       |  SELECT qid, vid AS doc_id, r FROM (
       |    SELECT qid, vid,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY round(cosim, 9) DESC, vid) AS INT) AS r
       |    FROM vcos)
       |  WHERE r <= 10),
       |fused AS (
       |  SELECT COALESCE(l.qid, v.qid) AS qid, COALESCE(l.doc_id, v.doc_id) AS doc_id,
       |         CAST(COALESCE(1000000000 // (60 + l.r), 0)
       |            + COALESCE(1000000000 // (60 + v.r), 0) AS BIGINT) AS rrf_micro
       |  FROM lex l FULL JOIN vec v ON v.qid = l.qid AND v.doc_id = l.doc_id)
       |SELECT qid, doc_id, rrf_micro, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, doc_id) AS INT) AS rn
       |  FROM fused)
       |WHERE rn <= 5""".stripMargin

  /** q209: MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversity rerank — the context-assembly step between retrieval and
    * a prompt: the BM25 top-6 per query is greedily re-picked so each
    * selection balances relevance against redundancy with what is
    * already selected (three near-identical top hits waste two context
    * slots; MMR spends them on coverage). Three greedy picks, fully
    * unrolled (the selection depth is a constant, so the "loop" is
    * three dataflow steps — no driver iteration):
    *   pick 1 = argmax rel; pick t = argmax 7*rel_u - 3*max_cos_u over
    *   the already-picked set; ties by doc_id.
    * Relevance is RANK-based in integer micro-units (10^6 div (1+rank))
    * and redundancy is the candidates' pairwise embedding cosine in
    * micro-units, so the scores are integers and the argmaxes are exact
    * cross-engine. Candidate cosines are computed on the ≤6x6 pair
    * frame per query (broadcast candidate list into the embedding
    * fetch) — the corpus-side cost stays the q164 postings read
    * regardless of corpus size. Queries restricted to ids covered by
    * both rankers (the q193 convention).
    */
  def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val w = org.apache.spark.sql.expressions.Window
    val embCount = table(s, dir, "embeddings").count()
    val wl = w.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    // the candidate frame (<= 16 queries x 6 docs) and its pairwise
    // cosine frame (<= 6x6 per query) are referenced by SEVEN greedy-step
    // branches below — without truncation every branch re-runs the full
    // BM25 scoring + ranking and the embedding fetch. Session-cache the
    // two checkpointed substrates (the bm25Scores pattern; eviction
    // unpersists the blocks) so the expensive derivations run once per
    // (session, corpus) and the registered plan stays the real selection
    // dataflow over cached scans.
    val (cands, pc) = graft.SessionCache.cachedValue[(DataFrame, DataFrame)](
      s, s"search:mmr:$dir")({
      val cands = bm25Scores(s, dir, searchIndex(s, dir))
        .filter(col("qid") < embCount && col("qid") < 800 && col("doc_id") < embCount)
        .withColumn("r", row_number().over(wl)).filter(col("r") <= 6)
        .withColumn("rel_u", expr("1000000 div (1 + r)"))
        .select(col("qid"), col("doc_id"), col("rel_u"))
        .localCheckpoint(true)
      val dotE = expr(
        "aggregate(zip_with(qemb, vemb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)")
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          expr("sqrt(graft_dot(embedding, embedding))").as("nrm"))
      val ea = emb.join(broadcast(cands.select(col("qid"), col("doc_id").as("a"))),
          col("vec_id") === col("a"))
        .select(col("qid"), col("a"), col("embedding").as("qemb"), col("nrm").as("na"))
      val eb = emb.join(broadcast(cands.select(col("qid").as("q2"), col("doc_id").as("b"))),
          col("vec_id") === col("b"))
        .select(col("q2"), col("b"), col("embedding").as("vemb"), col("nrm").as("nb"))
      val pc = ea.join(eb, col("qid") === col("q2") && col("a") =!= col("b"))
        .withColumn("cos_u",
          round(dotE / (col("na") * col("nb")) * 1000000).cast("long"))
        .select(col("qid"), col("a"), col("b"), col("cos_u"))
        .localCheckpoint(true)
      (cands, pc)
    })({ case (a, b) => a.unpersist(); b.unpersist(); () })
    val s1 = cands
      .withColumn("rk", row_number().over(
        w.partitionBy(col("qid")).orderBy(col("rel_u").desc, col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("qid"), col("doc_id").as("s1"), (col("rel_u") * 7).as("m1"))
    val c2 = cands.join(broadcast(s1), Seq("qid")).filter(col("doc_id") =!= col("s1"))
      .join(pc.select(col("qid"), col("a").as("doc_id"), col("b").as("s1"),
        col("cos_u")), Seq("qid", "doc_id", "s1"))
      .withColumn("mmr_u", col("rel_u") * 7 - col("cos_u") * 3)
    val s2 = c2
      .withColumn("rk", row_number().over(
        w.partitionBy(col("qid")).orderBy(col("mmr_u").desc, col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("qid"), col("doc_id").as("s2"), col("mmr_u").as("m2"))
    val c3 = cands.join(broadcast(s1.select(col("qid"), col("s1"))), Seq("qid"))
      .join(broadcast(s2.select(col("qid"), col("s2"))), Seq("qid"))
      .filter(col("doc_id") =!= col("s1") && col("doc_id") =!= col("s2"))
      .join(pc.select(col("qid"), col("a").as("doc_id"), col("b").as("s1"),
        col("cos_u").as("cu1")), Seq("qid", "doc_id", "s1"))
      .join(pc.select(col("qid"), col("a").as("doc_id"), col("b").as("s2"),
        col("cos_u").as("cu2")), Seq("qid", "doc_id", "s2"))
      .withColumn("mmr_u", col("rel_u") * 7 - greatest(col("cu1"), col("cu2")) * 3)
    val s3 = c3
      .withColumn("rk", row_number().over(
        w.partitionBy(col("qid")).orderBy(col("mmr_u").desc, col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("qid"), col("doc_id").as("s3"), col("mmr_u").as("m3"))
    s1.select(col("qid"), col("s1").as("doc_id"), lit(1).as("pick"), col("m1").as("mmr_u"))
      .unionByName(s2.select(col("qid"), col("s2").as("doc_id"), lit(2).as("pick"),
        col("m2").as("mmr_u")))
      .unionByName(s3.select(col("qid"), col("s3").as("doc_id"), lit(3).as("pick"),
        col("m3").as("mmr_u")))
  }

  private val mmrRerankSql =
    s"""WITH $bm25ScoresSql,
       |cands AS (
       |  SELECT qid, doc_id, CAST(1000000 // (1 + r) AS BIGINT) AS rel_u FROM (
       |    SELECT qid, doc_id,
       |           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS INT) AS r
       |    FROM scored
       |    WHERE qid < (SELECT COUNT(*) FROM embeddings) AND qid < 800
       |      AND doc_id < (SELECT COUNT(*) FROM embeddings))
       |  WHERE r <= 6),
       |eflat AS (
       |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS xd
       |  FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding)+1)) AS i
       |        FROM embeddings)),
       |enorms AS (
       |  SELECT vec_id, sqrt(CAST(SUM(CAST(xd*xd AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
       |  FROM eflat GROUP BY vec_id),
       |pc AS (
       |  SELECT p.qid, p.a, p.b,
       |         CAST(round((CAST(SUM(CAST(x.xd*y.xd AS DECIMAL(38,20))) AS DOUBLE)
       |                     / (na.nrm * nb.nrm)) * 1000000) AS BIGINT) AS cos_u
       |  FROM (SELECT c1.qid, c1.doc_id AS a, c2.doc_id AS b
       |        FROM cands c1 JOIN cands c2 ON c1.qid = c2.qid AND c1.doc_id <> c2.doc_id) p
       |  JOIN eflat x ON x.vec_id = p.a
       |  JOIN eflat y ON y.vec_id = p.b AND y.pos = x.pos
       |  JOIN enorms na ON na.vec_id = p.a
       |  JOIN enorms nb ON nb.vec_id = p.b
       |  GROUP BY p.qid, p.a, p.b, na.nrm, nb.nrm),
       |s1 AS (SELECT qid, doc_id AS s1, 7 * rel_u AS m1 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel_u DESC, doc_id) AS rk
       |    FROM cands) WHERE rk = 1),
       |c2 AS (SELECT c.qid, c.doc_id, 7 * c.rel_u - 3 * p.cos_u AS mmr_u
       |       FROM cands c
       |       JOIN s1 ON s1.qid = c.qid AND c.doc_id <> s1.s1
       |       JOIN pc p ON p.qid = c.qid AND p.a = c.doc_id AND p.b = s1.s1),
       |s2 AS (SELECT qid, doc_id AS s2, mmr_u AS m2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr_u DESC, doc_id) AS rk
       |    FROM c2) WHERE rk = 1),
       |c3 AS (SELECT c.qid, c.doc_id,
       |              7 * c.rel_u - 3 * GREATEST(p1.cos_u, p2.cos_u) AS mmr_u
       |       FROM cands c
       |       JOIN s1 ON s1.qid = c.qid
       |       JOIN s2 ON s2.qid = c.qid
       |       JOIN pc p1 ON p1.qid = c.qid AND p1.a = c.doc_id AND p1.b = s1.s1
       |       JOIN pc p2 ON p2.qid = c.qid AND p2.a = c.doc_id AND p2.b = s2.s2
       |       WHERE c.doc_id <> s1.s1 AND c.doc_id <> s2.s2),
       |s3 AS (SELECT qid, doc_id AS s3, mmr_u AS m3 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr_u DESC, doc_id) AS rk
       |    FROM c3) WHERE rk = 1)
       |SELECT qid, s1 AS doc_id, CAST(1 AS INT) AS pick, m1 AS mmr_u FROM s1
       |UNION ALL SELECT qid, s2, CAST(2 AS INT), m2 FROM s2
       |UNION ALL SELECT qid, s3, CAST(3 AS INT), m3 FROM s3""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q209_mmr_rerank",
      "MMR diversity rerank: greedy relevance-vs-redundancy picks over the BM25 top-6 with integer micro scores, 3 unrolled steps",
      mmrRerank, Some(mmrRerankSql)),
    GQuery("q193_hybrid_rrf",
      "hybrid retrieval: BM25 lexical + persisted-IVF vector rankers (fixed probe budget) fused by integer reciprocal-rank fusion",
      hybridRrf, Some(hybridRrfSql)),
    GQuery("q190_quality_classifier",
      "hashed-linear quality filter inference from the persisted index: integer logits, per-lang keep ledger",
      qualityClassifier, Some(qualityClassifierSql)),
    GQuery("q163_invindex_build",
      "persisted inverted index: build/validate via IndexStore, dictionary audit from stored tables",
      invindexBuild, Some(invindexBuildSql)),
    GQuery("q164_bm25_topk",
      "BM25 top-5 per query from the persisted index (broadcast query terms, decimal-exact sums)",
      bm25TopK, Some(bm25TopKSql)),
    GQuery("q165_bm25_negatives",
      "retrieval eval + hard-negative mining: positive rank + top-3 non-positive docs per query",
      bm25Negatives, Some(bm25NegativesSql)),
    GQuery("q166_segment_refresh",
      "Lucene-style segment refresh: append a batch segment, merged dict == fresh build",
      segmentRefresh, Some(segmentRefreshSql)),
    GQuery("q214_search_asof",
      "as-of BM25 over the segment store: horizon 0 reproduces the pre-refresh ranking (candidates AND collection stats) as a pushed-down segment filter",
      bm25AsOf, Some(bm25AsOfSql)),
    GQuery("q178_segment_compact",
      "segment compaction: refresh to two segments, compact in place, audited dict == fresh build at n_segments=1",
      segmentCompact, Some(segmentCompactSql)),
    GQuery("q167_prefix_setjoin",
      "exact Jaccard>=0.8 set-similarity join via prefix filtering (PPJoin), integer-exact gates",
      prefixSetJoin, Some(prefixSetJoinSql)),
    GQuery("q170_phrase_search",
      "exact phrase search via positional-intersection joins over the stored positions table",
      phraseSearch, Some(phraseSearchSql)),
    GQuery("q216_phrase_asof",
      "phrase search at a horizon: positional intersection over the segment store at full vs pre-refresh views via a pushed segment filter",
      phraseAsOf, Some(phraseAsOfSql)),
    GQuery("q222_search_takedown",
      "takedown erasure over the persisted index: O(index) one-pass rewrite (dict rebuilt from retained postings, never the corpus), oracled as equal to a rebuild from the filtered corpus with zero surviving traces",
      searchTakedown, Some(searchTakedownSql)),
    GQuery("q227_feed_synced_search",
      "feed-driven index sync: the lake's change feed applied O(delta) to the search index (D rows drive erasure, inserts land as the next segment), oracled as bit-equal to a rebuild from the lake's current state",
      feedSyncedSearch, Some(feedSyncedSearchSql)),
    GQuery("q235_index_manifest",
      "index-store manifest: one row per stored table with its cardinality, enumerated from the store's own table listing and oracled from raw text — a build that dropped or duplicated rows in any table hash-mismatches even when every probe still ranks",
      indexManifest, Some(indexManifestSql)),
    GQuery("q231_masked_feed_sync",
      "feed sync with O(delta) masked deletes: the sequence-scoped delete-mask sidecar replaces q227's per-window index rewrite; probes anti-join the broadcast mask after the term-keyed postings seek, stats stay physical until compaction folds the mask in (Lucene semantics, hash-pinned)",
      maskedFeedSync, Some(maskedFeedSyncSql)),
    GQuery("q237_autofold_feed_sync",
      "the delete-mask auto-fold policy firing: a deployment-tightened spark.graft.mask.maxDeletedFraction makes the feed's deleted fraction cross threshold at apply time, the policy runs the same fold a manual compaction would, and the probe audits the restored state (mask gone, stats live again) with the policy verdict itself re-derived by the oracle from raw counts",
      autoFoldFeedSync, Some(autoFoldFeedSyncSql)),
    GQuery("q238_evolved_feed_sync",
      "schema-evolution carry through the feed: an insert window bearing a column the v1 index layout lacks applies cleanly — the additive column lands in the mergeSchema-read docmeta side table (v1 tables and probes untouched), key/type changes still refuse — and the query reads the evolved column back through the synced index, carry completeness oracled from raw documents",
      evolvedFeedSync, Some(evolvedFeedSyncSql)),
  )
}

/** The stored frames of a search index; `positionsF` defers the positional
  * table's read to phrase probes. */
final case class SearchIndex(postings: DataFrame, doclen: DataFrame,
                             dict: DataFrame, positionsF: () => DataFrame) {
  def positions: DataFrame = positionsF()
}
