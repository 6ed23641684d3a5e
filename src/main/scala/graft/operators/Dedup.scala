package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM training-data pipelines: exact dedup,
  * MinHash+LSH near-dup candidates (Broder 1997, "On the resemblance and
  * containment of documents"; banding per Leskovec/Rajaraman/Ullman, Mining
  * of Massive Datasets ch.3), SimHash fingerprints (Charikar 2002,
  * "Similarity estimation techniques from rounding algorithms"), and exact
  * n-gram Jaccard verification of candidates.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - NO all-pairs crossJoin anywhere. Candidate pairs come from an LSH
  *    band-bucket equi-join: docs only meet if a 4-minhash band collides, so
  *    the shuffle key is the band signature and the join is linear in the
  *    number of colliding docs, not quadratic in the corpus.
  *  - MinHash signatures are 16 permutations of ONE md5 hash per shingle
  *    (cheap modular arithmetic), computed in a single groupBy with 16 min()
  *    partial aggregates — map-side combine collapses each doc to one row
  *    before the shuffle.
  *  - Exact Jaccard runs ONLY on the LSH candidates (semi-join pruned).
  *
  * The md5-based hash (Engine.md5Long) is engine-portable, so every stage is
  * verified bit-for-bit against the DuckDB oracle.
  *
  * Reference provenance: the reference has no dedup beyond its per-file
  * idempotency probe (/root/reference/data_pipeline.py:138-142); this module
  * is the LLM-pipeline extension surface (BASELINE.json north star).
  */
object Dedup extends QueryModule {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val A = Seq(2L, 3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L, 37L, 41L, 43L, 47L, 53L)
  private def B(j: Int): Long = 7919L * j + 13L

  /** Corpus with injected near-duplicates (prefix-truncated) and exact
    * duplicates, so dedup operators have real work at any SF. Both engines
    * build the identical frame.
    */
  def augmentedDocs(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
    val near = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), expr("substr(text, 11)").as("text"), col("lang"))
    val exact = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"), col("lang"))
    // one spread AFTER the union: everything downstream is a 50-300x CPU
    // expansion (shingling, char n-grams) over a compact input — spread it
    // by rows, not input bytes, with a single small shuffle
    spread(d.unionByName(near).unionByName(exact))
  }

  private val augmentedDocsSql =
    """docs AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, substr(text, 11), lang FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text, lang FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** Word 2-gram shingles, one row per (doc, shingle). */
  def shingles(docs: DataFrame): DataFrame =
    docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws)-1), i -> concat_ws(' ', element_at(ws, i), element_at(ws, i+1)))")).as("sh"))

  /** The shingle index, MinHash signatures, and LSH candidate pairs are the
    * shared substrate of the whole dedup family — build them once per
    * session+dir and reuse, exactly as a production pipeline materializes
    * its shingle/signature tables once and runs every dedup stage against
    * them. Caching sigs also matters within one query: the LSH band
    * self-join scans the signature table twice, and without materialization
    * each branch would recompute the full shingle+hash pipeline.
    *
    * Lifecycle is [[graft.SessionCache]]: bounded LRU over sessions with
    * explicit unpersist on eviction (a weak-keyed map cannot collect here —
    * a Dataset strongly references its own SparkSession).
    */
  private def sessionCached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    graft.SessionCache.cached(s, s"dedup:$key")(build)
  private final case class DedupFrames(
      sh: DataFrame, shd: DataFrame, sigs: DataFrame, cand: DataFrame)
  private def frames(s: SparkSession, dir: String): DedupFrames = {
    val sh = sessionCached(s, s"sh:$dir")(shingles(augmentedDocs(s, dir)))
    val sigs = sessionCached(s, s"sigs:$dir")(sigsFrom(sh))
    DedupFrames(sh,
      sessionCached(s, s"shd:$dir")(sh.distinct()),
      sigs,
      sessionCached(s, s"cand:$dir")(candFrom(sigs)))
  }
  private def cachedFps(s: SparkSession, dir: String): DataFrame =
    sessionCached(s, s"fps:$dir")(simhash(s, dir))

  private val shinglesSql =
    """sh AS (
      |  SELECT doc_id, s[i] || ' ' || s[i+1] AS sh
      |  FROM (SELECT doc_id, s, unnest(range(1, len(s))) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM docs)
      |        WHERE len(s) >= 2))""".stripMargin

  /** Exact dedup (hash-groupBy keep-first): group identical texts, keep the
    * min doc_id, summarize per language. One shuffle on the text hash.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    augmentedDocs(s, dir)
      .groupBy(col("lang"), col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_unique"),
           sum(col("copies")).as("n_docs"),
           sum(col("copies") - 1).as("n_dup_docs"),
           min(col("keep_id")).as("first_keep"))
  }

  private val dedupExactSql =
    s"""WITH $augmentedDocsSql
       |SELECT lang, COUNT(*) AS n_unique,
       |CAST(SUM(copies) AS BIGINT) AS n_docs,
       |CAST(SUM(copies - 1) AS BIGINT) AS n_dup_docs,
       |MIN(keep_id) AS first_keep
       |FROM (SELECT lang, text, MIN(doc_id) AS keep_id, COUNT(*) AS copies
       |      FROM docs GROUP BY lang, text)
       |GROUP BY lang""".stripMargin

  /** 16-permutation MinHash signatures, one row per doc. */
  private def sigsFrom(sh: DataFrame): DataFrame = {
    val hm = sh.withColumn("hm", md5Long(col("sh")) % P)
    val aggs = (0 until 16).map(j => min((lit(A(j)) * col("hm") + lit(B(j))) % P).as(s"m$j"))
    hm.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  private val minhashSigsSql = {
    val mins = (0 until 16)
      .map(j => s"MIN((${A(j)}*hm + ${B(j)}) % $P) AS m$j").mkString(", ")
    s"""hs AS (SELECT doc_id, ${MD5L("sh")} % $P AS hm FROM sh),
       |sigs AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id)""".stripMargin
  }

  /** LSH bands: 4 bands x 4 rows; docs collide iff one whole band matches. */
  private def bandRows(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until 4).map { b =>
      val ms = (0 until 4).map(i => s"m${4 * b + i}").mkString(", ")
      s"struct($b AS band, concat_ws('_', $ms) AS bk)"
    }
    sigs.select(col("doc_id"), explode(expr(s"array(${bandStructs.mkString(", ")})")).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bk").as("bk"))
  }

  private val bandRowsSql = {
    val selects = (0 until 4).map { b =>
      val ms = (0 until 4).map(i => s"CAST(m${4 * b + i} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $ms AS bk FROM sigs"
    }
    s"""bands AS (${selects.mkString(" UNION ALL ")})"""
  }

  private val candSql =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin

  /** Band-bucket equi-join: distinct colliding pairs (da < db). */
  private def candFrom(sigs: DataFrame): DataFrame = {
    val bands = bandRows(sigs)
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** MinHash near-dup candidates: band-bucket join + signature similarity. */
  def minhashCandidates(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    sessionCached(s, s"mhc:$dir") {
      val f = frames(s, dir)
      val (sigs, cand) = (f.sigs, f.cand)
      val sa = sigs.columns.foldLeft(sigs)((df, c) => df.withColumnRenamed(c, if (c == "doc_id") "da" else s"a_$c"))
      val sb = sigs.columns.foldLeft(sigs)((df, c) => df.withColumnRenamed(c, if (c == "doc_id") "db" else s"b_$c"))
      val simExpr = (0 until 16)
        .map(j => when(col(s"a_m$j") === col(s"b_m$j"), 1).otherwise(0))
        .reduce(_ + _) / lit(16.0)
      cand.join(sa, "da").join(sb, "db")
        .select(col("da"), col("db"), simExpr.as("sig_sim"))
    }
  }

  private val minhashCandidatesSql = {
    val sim = (0 until 16)
      .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH $augmentedDocsSql,
       |$shinglesSql,
       |$minhashSigsSql,
       |$bandRowsSql,
       |$candSql
       |SELECT da, db, ($sim) / 16.0 AS sig_sim
       |FROM cand JOIN sigs a ON a.doc_id = da JOIN sigs b ON b.doc_id = db""".stripMargin
  }

  /** Exact 2-gram Jaccard verification, computed ONLY for LSH candidates.
    * The shingle frame is computed once and reused for both the signatures
    * and the exact set intersection.
    */
  def jaccardVerify(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val f = frames(s, dir)
    val (cand, shd) = (f.cand, f.shd)
    val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val inter = cand
      .join(shd.select(col("doc_id").as("da"), col("sh")), "da")
      .join(shd.select(col("doc_id").as("db"), col("sh")), Seq("db", "sh"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("da"), col("nsh").as("na")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("nsh").as("nb")), "db")
      .select(col("da"), col("db"), col("n_inter"),
        (col("na") + col("nb") - col("n_inter")).as("n_union"),
        (col("n_inter") / (col("na") + col("nb") - col("n_inter"))).as("jacc"),
        (col("n_inter") / (col("na") + col("nb") - col("n_inter")) >= 0.6).as("is_dup"))
  }

  private val jaccardVerifySql = {
    s"""WITH $augmentedDocsSql,
       |$shinglesSql,
       |$minhashSigsSql,
       |$bandRowsSql,
       |$candSql,
       |shd AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shd GROUP BY doc_id),
       |inter AS (SELECT c.da, c.db, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN shd x ON x.doc_id = c.da
       |          JOIN shd y ON y.doc_id = c.db AND y.sh = x.sh
       |          GROUP BY c.da, c.db)
       |SELECT i.da, i.db, i.n_inter,
       |  sa.nsh + sb.nsh - i.n_inter AS n_union,
       |  i.n_inter / (sa.nsh + sb.nsh - i.n_inter) AS jacc,
       |  i.n_inter / (sa.nsh + sb.nsh - i.n_inter) >= 0.6 AS is_dup
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.da
       |JOIN sizes sb ON sb.doc_id = i.db""".stripMargin
  }

  /** 32-bit SimHash fingerprints from word-level hashes: per-bit majority
    * vote folded into one integer. 32 partial-agg sums, single shuffle.
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val toks = augmentedDocs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", md5Long(col("w")))
    val votes = (0 until 32).map(j =>
      sum(expr(s"(shiftright(h, $j) & 1) * 2 - 1")).as(s"sb$j"))
    val fp = (0 until 32)
      .map(j => when(col(s"sb$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("fp"))
  }

  // toks/votes/fps CTEs alone (over an existing `docs` CTE), so oracles
  // combining the simhash and minhash families don't redefine `docs`
  private val simhashCoreCtes = {
    val votes = (0 until 32)
      .map(j => s"SUM(((h >> $j) & 1) * 2 - 1) AS sb$j").mkString(", ")
    val fp = (0 until 32)
      .map(j => s"(CASE WHEN sb$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""toks AS (SELECT doc_id, ${MD5L("w")} AS h
       |         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs)),
       |votes AS (SELECT doc_id, $votes FROM toks GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM votes)""".stripMargin
  }

  private val simhashCtes = s"$augmentedDocsSql,\n$simhashCoreCtes"

  private val simhashSql =
    s"WITH $simhashCtes\nSELECT doc_id, fp FROM fps"

  /** SimHash near-dup pairs: byte-band blocking (docs within hamming
    * distance d of each other must agree on at least one of the 4 bytes
    * when d < 4 per the pigeonhole principle) then exact hamming distance
    * via bit_count(xor). Equi-join on (band, byte) — never all-pairs.
    */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    sessionCached(s, s"shp:$dir") { simhashPairsUncached(s, dir) }
  }

  private def simhashPairsUncached(s: SparkSession, dir: String): DataFrame = {
    val fps = cachedFps(s, dir)
    val bandStructs = (0 until 4)
      .map(j => s"struct($j AS band, shiftright(fp, ${8 * j}) & 255 AS bkey)")
    val bands = fps.select(col("doc_id"), col("fp"),
      explode(expr(s"array(${bandStructs.mkString(", ")})")).as("bs"))
      .select(col("doc_id"), col("fp"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        expr("bit_count(a.fp ^ b.fp)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  private val simhashPairsSql = {
    val bandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, fp, $j AS band, (fp >> ${8 * j}) & 255 AS bkey FROM fps")
      .mkString(" UNION ALL ")
    s"""WITH $simhashCtes,
       |bands AS ($bandSelects)
       |SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |FROM bands a JOIN bands b
       |ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  /** Near-dup cluster formation: connected components over the SimHash
    * pair graph (hamming <= 3), then per-cluster canonical selection
    * (min doc_id) — the step that turns pairwise near-dup hits into "keep
    * one per family" for corpus curation.
    *
    * Algorithm: iterative min-label propagation to fixpoint — each round,
    * every node takes the min label among itself and its neighbors; rounds
    * needed = component diameter (near-dup families are shallow). This is
    * the standard distributed CC shape (GraphX/Pregel run the same
    * supersteps); data never leaves the executors — the driver only sees
    * the per-round convergence count. The oracle computes the same
    * components with a recursive CTE.
    */
  /** Connected components over an undirected pair list `(da, db)`:
    * returns one row per node with its component label (the minimum
    * reachable node id). Reusable across any near-dup pair source
    * (SimHash, MinHash, embedding LSH).
    *
    * Iterative min-label propagation with pointer jumping, the standard
    * distributed CC shape (GraphX/Pregel run the same supersteps); the
    * driver only ever sees the per-round convergence count.
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    val Seq(a, b) = pairs.columns.toSeq.take(2)
    // localCheckpoint (not cache): iterative plans must CUT lineage each
    // round — a cache only short-circuits execution, the analyzed plan
    // still nests the full history and grows exponentially with rounds.
    val edges = pairs.select(col(a).as("n"), col(b).as("m"))
      .unionByName(pairs.select(col(b).as("n"), col(a).as("m")))
      .localCheckpoint()
    var labels = edges.select(col("n")).distinct()
      .withColumn("lab", col("n")).localCheckpoint()
    // The label frame is tiny relative to the corpus (only docs that hit a
    // near-dup pair); per-round shuffles at full width would be pure
    // scheduling overhead — size the loop's parallelism to the frame:
    // ~500k edge rows per partition, floor 8 (edges is already
    // materialized by the localCheckpoint, so the count is a cheap scan).
    val edgeRows = edges.count() // already includes both directions
    val loopParts = math.max(8L, edgeRows / 500000L).min(100000L).toString
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {
      var iter = 0
      var changed = 1L
      val maxIter = 20
      while (changed > 0 && iter < maxIter) {
        // the self rows carry the previous label through the aggregate
        // (max(old) — only self rows are non-null), so no extra join is
        // needed to detect convergence
        val neighborMin = edges
          .join(labels.select(col("n").as("m"), col("lab")), "m")
          .select(col("n"), col("lab"), lit(null).cast("long").as("old"))
          .unionByName(labels.select(col("n"), col("lab"), col("lab").as("old")))
          .groupBy(col("n")).agg(min(col("lab")).as("lab"), max(col("old")).as("old"))
          .cache() // shallow plan (labels is checkpointed); used twice below
        // pointer jumping: replace each label by its label's label
        // (label(x) <= x), collapsing chains in O(log diameter) rounds
        // instead of one hop per round; convergence is then a filter over
        // the checkpointed frame — one materializing job per round.
        val next = neighborMin
          .join(neighborMin.select(col("n").as("lab"), col("lab").as("lab2")), Seq("lab"))
          .select(col("n"), col("lab2").as("lab"), col("old"))
          .localCheckpoint()
        changed = next.filter(col("lab") =!= col("old")).count()
        neighborMin.unpersist()
        labels = next.select(col("n"), col("lab"))
        iter += 1
      }
      // With pointer jumping, rounds ~ log2(component diameter): 20 rounds
      // covers diameters up to ~2^20. Hitting the cap unconverged would
      // silently return WRONG labels — that must be fatal, not a log line.
      if (changed > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds ($changed labels still moving)")
      System.err.println(s"[graft] connectedComponents converged in $iter rounds")
      labels
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val labels = connectedComponents(simhashPairs(s, dir).select(col("da"), col("db")))
    val out = labels.groupBy(col("lab").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
           min(col("n")).as("min_doc"),
           max(col("n")).as("max_doc"))
    out
  }

  private val dedupClustersSql = {
    val bandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, fp, $j AS band, (fp >> ${8 * j}) & 255 AS bkey FROM fps")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE $simhashCtes,
       |bands AS ($bandSelects),
       |prs AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
       |edges AS (SELECT da AS n, db AS m FROM prs UNION SELECT db, da FROM prs),
       |reach(n, lab) AS (
       |  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
       |  UNION
       |  SELECT e.n, r.lab FROM edges e JOIN reach r ON r.n = e.m),
       |labels AS (SELECT n, MIN(lab) AS lab FROM reach GROUP BY n)
       |SELECT lab AS cluster_id, COUNT(*) AS n_members,
       |MIN(n) AS min_doc, MAX(n) AS max_doc
       |FROM labels GROUP BY lab""".stripMargin
  }

  /** Multi-signal dedup clustering: union the MinHash-LSH candidate pairs
    * (signature similarity >= 0.75) with the SimHash pairs (hamming <= 3),
    * form connected components over the combined evidence, and report the
    * cluster-size histogram — the "one family per near-dup group across
    * ALL detectors" rollup a curation pipeline actually dedupes against.
    * Both pair sources come from the session-cached substrate, so the
    * marginal cost is the union + the component loop.
    */
  def multiSignalClusters(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val mh = minhashCandidates(s, dir)
      .filter(col("sig_sim") >= 0.75)
      .select(col("da"), col("db"))
    val sh = simhashPairs(s, dir).select(col("da"), col("db"))
    val labels = connectedComponents(mh.unionByName(sh).distinct())
    labels.groupBy(col("lab")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
  }

  private val multiSignalClustersSql = {
    val sim = (0 until 16)
      .map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END").mkString(" + ")
    val sbandSelects = (0 until 4)
      .map(j => s"SELECT doc_id, fp, $j AS band, (fp >> ${8 * j}) & 255 AS bkey FROM fps")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE $augmentedDocsSql,
       |$shinglesSql,
       |$minhashSigsSql,
       |$bandRowsSql,
       |$candSql,
       |$simhashCoreCtes,
       |sbands AS ($sbandSelects),
       |mh AS (SELECT da, db FROM (
       |  SELECT da, db, ($sim) / 16.0 AS sig_sim
       |  FROM cand JOIN sigs a ON a.doc_id = da JOIN sigs b ON b.doc_id = db)
       |  WHERE sig_sim >= 0.75),
       |sp AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |       FROM sbands a JOIN sbands b
       |       ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |       WHERE bit_count(xor(a.fp, b.fp)) <= 3),
       |allp AS (SELECT da, db FROM mh UNION SELECT da, db FROM sp),
       |edges AS (SELECT da AS n, db AS m FROM allp UNION SELECT db, da FROM allp),
       |reach(n, lab) AS (
       |  SELECT n, n FROM (SELECT DISTINCT n FROM edges)
       |  UNION
       |  SELECT e.n, r.lab FROM edges e JOIN reach r ON r.n = e.m),
       |labels AS (SELECT n, MIN(lab) AS lab FROM reach GROUP BY n)
       |SELECT sz AS cluster_size, COUNT(*) AS n_clusters
       |FROM (SELECT lab, COUNT(*) AS sz FROM labels GROUP BY lab)
       |GROUP BY sz""".stripMargin
  }

  override val queries: Seq[GQuery] = Seq(
    GQuery("q60_dedup_exact", "exact dedup via hash-groupBy keep-first, per-lang summary",
      dedupExact, Some(dedupExactSql)),
    GQuery("q61_minhash_lsh", "MinHash signatures + LSH band-bucket candidate pairs (no crossJoin)",
      minhashCandidates, Some(minhashCandidatesSql)),
    GQuery("q62_simhash", "32-bit SimHash fingerprint per doc (bit-majority vote)",
      simhash, Some(simhashSql)),
    GQuery("q63_jaccard_verify", "exact n-gram Jaccard on LSH candidates only",
      jaccardVerify, Some(jaccardVerifySql)),
    GQuery("q89_simhash_pairs", "SimHash near-dup pairs: byte-band blocking + hamming(bit_count^xor)",
      simhashPairs, Some(simhashPairsSql)),
    GQuery("q90_dedup_clusters", "near-dup clusters: connected components (min-label propagation) + canonical pick",
      dedupClusters, Some(dedupClustersSql)),
    GQuery("q94_multi_signal_clusters", "clusters over combined MinHash + SimHash evidence, size histogram",
      multiSignalClusters, Some(multiSignalClustersSql)),
  )
}
