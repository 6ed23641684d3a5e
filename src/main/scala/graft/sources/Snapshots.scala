package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-manifest table layout over plain parquet — the minimal table
  * format an ingest pipeline needs once concurrent readers exist:
  *
  *   dir/data/seg_<tag>/part-*.parquet    immutable data segments
  *   dir/manifests/v00001.txt             one line per data file
  *
  * A snapshot IS its manifest: readers resolve a version to a file list
  * and read exactly those files, so they see a committed snapshot in
  * full or not at all — never a half-written table. Commits stage their
  * segment first (invisible until referenced), then publish the next
  * manifest with an EXCLUSIVE create: two racing committers cannot both
  * create `v N+1`, the loser re-reads the new latest and retries on top
  * (optimistic concurrency, the Iceberg/Delta commit model on nothing
  * but a filesystem with create-if-absent). A crash between segment
  * write and manifest publish leaves an orphaned segment no reader can
  * see; [[expire]] collects it.
  *
  * Scale posture: a manifest lists files, not rows — O(files) bytes,
  * read once per query plan. Appends carry the prior file list forward
  * (no data rewrite, no read-modify-write of data); time travel is
  * "read an older manifest" and costs nothing until expiry. At 100 TB
  * the data plane is untouched parquet — all coordination happens on
  * kilobyte manifest files.
  *
  * Reference provenance: the reference overwrites its outputs in place
  * (/root/reference/data_pipeline.py:338-350) — no versioning, readers
  * can observe torn state; this is the LLM-pipeline extension surface.
  */
object Snapshots {

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long): Path =
    new Path(new Path(dir, "manifests"), f"v$v%05d.txt")

  /** Highest committed version, 0 if the table has no snapshot yet. */
  def latestVersion(s: SparkSession, dir: String): Long = {
    val md = new Path(dir, "manifests")
    val fs = fsOf(s, md)
    if (!fs.exists(md)) 0L
    else fs.listStatus(md).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.txt") => n.stripPrefix("v").stripSuffix(".txt").toLong }
      .foldLeft(0L)(math.max)
  }

  private def manifestLines(s: SparkSession, dir: String, v: Long): Seq[String] = {
    val fs = fsOf(s, manifestPath(dir, v))
    val in = fs.open(manifestPath(dir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  private def readManifest(s: SparkSession, dir: String, v: Long): Seq[String] =
    manifestLines(s, dir, v).filterNot(_.startsWith("#"))

  /** The `#key=value` metadata a commit attached to snapshot `v`. */
  def manifestMeta(s: SparkSession, dir: String, v: Long): Map[String, String] =
    manifestLines(s, dir, v).filter(_.startsWith("#"))
      .map(_.stripPrefix("#").split("=", 2)).collect { case Array(k, w) => k -> w }.toMap

  /** Every value committed under meta `key` across live manifests —
    * the replay ledger [[commitIfAbsent]] consults. O(versions)
    * kilobyte reads, driver-side. */
  def committedValues(s: SparkSession, dir: String, key: String): Set[String] =
    (1L to latestVersion(s, dir))
      .filter(v => fsOf(s, manifestPath(dir, v)).exists(manifestPath(dir, v)))
      .flatMap(v => manifestMeta(s, dir, v).get(key)).toSet

  /** Commit `df` as the next snapshot. `append=true` carries the current
    * snapshot's files forward (logical append, zero data rewrite);
    * `append=false` makes the new segment the whole table (logical
    * overwrite — old files stay on disk for time travel until expired).
    * Returns the committed version. Concurrency-safe: the manifest is
    * published with create-if-absent; on collision the commit retries on
    * top of the winner, so both snapshots land, linearized. */
  def commit(df: DataFrame, dir: String, append: Boolean,
             meta: Map[String, String] = Map.empty): Long = {
    val s = df.sparkSession
    require(meta.forall { case (k, v) =>
      !k.contains("=") && !k.contains("\n") && !v.contains("\n") },
      "manifest meta: no '=' in keys, no newlines anywhere")
    val tag = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
      .replaceAll("[^A-Za-z0-9]", "") + "_" + System.nanoTime()
    val seg = new Path(dir, s"data/seg_$tag")
    val fs = fsOf(s, seg)
    df.write.parquet(seg.toString) // fresh dir: staged, invisible until referenced
    val files = fs.listStatus(seg)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath.toString).sorted
    var attempt = 0
    while (true) {
      val base = latestVersion(s, dir)
      val carried = if (append && base > 0) readManifest(s, dir, base) else Seq.empty
      val v = base + 1
      val mp = manifestPath(dir, v)
      fs.mkdirs(mp.getParent)
      try {
        val out = fs.create(mp, false) // exclusive: the optimistic lock
        val metaLines = meta.toSeq.sorted.map { case (k, w) => s"#$k=$w" }
        try out.write((metaLines ++ carried ++ files).mkString("\n").getBytes("UTF-8"))
        finally out.close()
        return v
      } catch {
        case _: java.io.IOException => // lost the race: retry on the winner
          attempt += 1
          require(attempt < 100, s"snapshot commit: $attempt failed attempts at $dir")
      }
    }
    -1L // unreachable
  }

  /** Exactly-once commit for replayable producers (a streaming
    * foreachBatch, a retried job): the commit is tagged
    * `#<key>=<value>` in its manifest, and a later call with the same
    * tag is a NO-OP returning None — so a replayed micro-batch cannot
    * append its rows twice. This is the snapshot-table form of the
    * batchId-scoped admission log (q134): idempotence lives in the
    * table's own commit ledger, not in the producer. */
  def commitIfAbsent(df: DataFrame, dir: String, append: Boolean,
                     key: String, value: String): Option[Long] =
    if (committedValues(df.sparkSession, dir, key).contains(value)) None
    else Some(commit(df, dir, append, Map(key -> value)))

  /** Read a snapshot — `version < 0` means latest. Time travel is just
    * naming an older version; the plan reads exactly that manifest's
    * files, so concurrent later commits are invisible. */
  def read(s: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion(s, dir) else version
    require(v > 0, s"no snapshot at $dir")
    s.read.parquet(readManifest(s, dir, v): _*)
  }

  /** Rewrite the CURRENT snapshot into ~`targetBytes`-sized files and
    * commit the result as a new snapshot (logical overwrite) tagged
    * `#compaction=true` — the "rewrite data files" maintenance op an
    * append-forever table eventually needs. Older versions are
    * untouched: their manifests still name the old files, which
    * [[expire]] collects once they leave the retention window. Rows are
    * identical by construction (one repartition, no predicate), so
    * readers switching to the compacted snapshot see the same table in
    * fewer, right-sized files. */
  def compact(s: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val latest = latestVersion(s, dir)
    require(latest > 0, s"no snapshot to compact at $dir")
    val files = readManifest(s, dir, latest)
    val fs = fsOf(s, new Path(dir))
    val total = files.map(f => fs.getFileStatus(new Path(f)).getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    commit(read(s, dir, latest).repartition(n), dir, append = false,
      Map("compaction" -> "true"))
  }

  /** Drop manifests older than `keepFrom` (the latest snapshot is always
    * kept) and delete every data file no kept manifest references —
    * including orphaned segments from crashed commits. Returns
    * (manifests dropped, data files deleted). The walk is metadata-only:
    * file listings, never file contents. */
  def expire(s: SparkSession, dir: String, keepFrom: Long): (Int, Int) = {
    val fs = fsOf(s, new Path(dir))
    val latest = latestVersion(s, dir)
    val keepStart = math.max(1L, math.min(keepFrom, latest))
    val dropped = (1L until keepStart).filter(v => fs.exists(manifestPath(dir, v)))
    val keptFiles = (keepStart to latest)
      .filter(v => fs.exists(manifestPath(dir, v)))
      .flatMap(v => readManifest(s, dir, v)).toSet
    dropped.foreach(v => fs.delete(manifestPath(dir, v), false))
    val dataDir = new Path(dir, "data")
    var deleted = 0
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { segSt =>
      val parts = fs.listStatus(segSt.getPath)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      val (kept, dead) = parts.partition(p => keptFiles.contains(p.getPath.toString))
      dead.foreach { p => if (fs.delete(p.getPath, false)) deleted += 1 }
      if (kept.isEmpty) fs.delete(segSt.getPath, true) // now-empty or orphaned segment
    }
    (dropped.size, deleted)
  }
}
