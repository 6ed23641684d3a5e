package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable on-disk store for frozen screening indexes (the dedup signature
  * index behind q131/q134 and the vector sign-LSH index behind q140):
  * named parquet tables under one directory, validated by a source stamp.
  *
  * Why this exists: a session-cached index survives queries, not process
  * restarts — and at 100 TB a restart that rescans the corpus to rebuild
  * signatures costs more than every screening batch it will ever serve.
  * Persisting the index makes "corpus never rescanned" true across
  * process lifetimes: a new job validates the stamp (filesystem metadata
  * only — no data read) and probes the stored tables directly.
  *
  * Consistency model — deliberately simpler than [[Storage.guardedSwap]]:
  * an index is DERIVED data, always rebuildable from its source, so the
  * recovery story is "rebuild on miss", not "never lose it". [[write]]
  * stages everything (stamp included) into a temp dir and swaps it in
  * with delete+rename; any crash leaves either the old valid index, no
  * index, or a stampless partial — the first validates, the other two
  * fail [[isCurrent]] and trigger a rebuild. The one non-atomic window
  * (between delete and rename) can strand concurrent READERS of the old
  * index, which is why the fixture rigs serialize build-vs-load under a
  * JVM lock; a multi-writer production deployment would version the
  * directory name instead (write `path.v{n+1}`, flip a pointer file).
  *
  * Reference provenance: the reference persists nothing between runs —
  * its idempotency state IS a database table it re-queries per file
  * (/root/reference/data_pipeline.py:138-142). This store is that idea
  * applied to the derived signature tables of the LLM-pipeline extension
  * surface.
  */
object IndexStore {

  private def fsOf(s: SparkSession, p: Path): FileSystem =
    FileSystem.get(p.toUri, s.sparkContext.hadoopConfiguration)

  /** Cheap source fingerprint: per input path, total file bytes + max
    * modification time (filesystem metadata only — never a data scan).
    * A regenerated fixture or a rewritten lake partition changes the
    * stamp, so a stale index can never silently serve wrong screens.
    */
  def sourceStamp(s: SparkSession, paths: Seq[String]): String =
    paths.map { p =>
      val path = new Path(p)
      val fs = fsOf(s, path)
      val files =
        if (!fs.exists(path)) Seq.empty
        else if (fs.getFileStatus(path).isFile) Seq(fs.getFileStatus(path))
        else fs.listStatus(path).filter(_.isFile).toSeq
      val len = files.map(_.getLen).sum
      val mt = if (files.isEmpty) 0L else files.map(_.getModificationTime).max
      s"$p:$len:$mt"
    }.mkString(";")

  private def stampFile(path: String) = new Path(path, "_STAMP")

  private def readStampLines(s: SparkSession, path: String): Seq[String] = {
    val sf = stampFile(path)
    val fs = fsOf(s, sf)
    if (!fs.exists(sf)) Seq.empty
    else {
      val in = fs.open(sf)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
  }

  /** True iff the index at `path` exists and was built from sources
    * matching `stamp`. The stamp is written as part of the atomic swap,
    * so a half-built index never validates. */
  def isCurrent(s: SparkSession, path: String, stamp: String): Boolean =
    readStampLines(s, path).headOption.contains(stamp)

  /** Key=value metadata recorded at [[write]] time (e.g. the LSH bit
    * width — an index property that probes must reuse verbatim). */
  def readMeta(s: SparkSession, path: String): Map[String, String] =
    readStampLines(s, path).drop(1).flatMap { line =>
      line.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap

  /** Build-or-replace the index: write every table + the stamp/meta file
    * into a temp dir, then swap it over `path`. See the object scaladoc
    * for the consistency model. */
  def write(s: SparkSession, path: String, stamp: String,
            tables: Seq[(String, DataFrame)],
            meta: Map[String, String] = Map.empty): Unit = {
    require(!stamp.contains("\n"), "stamp must be a single line")
    val live = new Path(path)
    val fs = fsOf(s, live)
    val tmp = new Path(live.getParent, s".${live.getName}_building")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(new Path(tmp, name).toString)
    }
    val txt = (stamp +: meta.toSeq.sorted.map { case (k, v) => s"$k=$v" })
      .mkString("\n")
    val out = fs.create(new Path(tmp, "_STAMP"), true)
    try out.write(txt.getBytes("UTF-8")) finally out.close()
    if (fs.exists(live)) fs.delete(live, true)
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"index swap: cannot rename $tmp -> $live")
  }

  /** Read one named table of a stored index. */
  def read(s: SparkSession, path: String, table: String): DataFrame =
    s.read.parquet(new Path(new Path(path), table).toString)

  /** Append rows to one named table of a stored index — the refresh path:
    * an ingest loop appends the signatures of the docs it just ACCEPTED,
    * so the next batch screens against corpus + accepted without anything
    * being rebuilt. Leaves the stamp untouched (the stamp fingerprints
    * the BASE corpus; refreshed rows are additions beyond it). */
  def append(s: SparkSession, path: String, table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(new Path(new Path(path), table).toString)
}
