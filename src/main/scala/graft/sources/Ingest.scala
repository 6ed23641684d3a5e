package graft.sources

import org.apache.spark.sql.Dataset
import scala.reflect.ClassTag

/** Chunked, retrying, dead-lettering sink semantics (C1/C2/C3) —
  * the reference's upload_dataframe_in_chunks + retry + spill
  * (/root/reference/data_pipeline.py:501-572), distributed:
  *
  *  - chunking happens per partition (no driver-side iteration), so
  *    the write parallelism is the data parallelism;
  *  - a failed chunk is retried once at a smaller size (the reference's
  *    5000 -> 1000 fallback);
  *  - rows that still fail are RETURNED as a dataset — the dead-letter
  *    side the caller persists (CSV spill, S9) — so
  *    rows_in == rows_written + rows_dead always holds.
  *
  * The writer callback stands in for the reference's REST/JDBC batch call;
  * at scale it would hold one connection per partition.
  */
object ChunkedIngest {

  /** Push `ds` through `write` in chunks; returns the dead-lettered rows.
    * `write` must be serializable (it runs on executors) and is expected to
    * be atomic per call: it either persists the whole chunk or throws.
    */
  def chunkedWrite[T: ClassTag](ds: Dataset[T], chunkSize: Int, retrySize: Int)(
      write: Seq[T] => Unit): Dataset[T] = {
    require(chunkSize > 0 && retrySize > 0 && retrySize <= chunkSize)
    import ds.sparkSession.implicits._
    implicit val enc = ds.encoder
    ds.mapPartitions { rows =>
      rows.grouped(chunkSize).flatMap { chunk =>
        try { write(chunk); Iterator.empty }
        catch {
          case _: Exception =>
            chunk.grouped(retrySize).flatMap { small =>
              try { write(small); Nil }
              catch { case _: Exception => small }
            }.iterator
        }
      }
    }
  }
}

/** Landing-zone maintenance (S10/C6/P5): list a directory, skip dotfiles,
  * delete the rest in bounded batches — the reference's removeexistingfiles
  * (/root/reference/data_pipeline.py:305-336) over any Hadoop filesystem.
  */
object Storage {

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Deletes all non-dotfiles under `dir` in batches; returns count deleted. */
  def resetLandingZone(spark: org.apache.spark.sql.SparkSession, dir: String,
                       batchSize: Int = 20): Int = {
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return 0
    val files = fs.listStatus(path).toSeq
      .filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith(".")) // dotfile filter (P5)
    // count only deletes the filesystem confirmed, so a failed delete
    // (permissions, concurrent removal) can't overstate the tally
    files.grouped(batchSize)
      .map(_.count(f => fs.delete(f.getPath, false)))
      .sum
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetBytes) files. The lake-maintenance job every
    * streaming/incremental sink eventually needs — thousands of
    * micro-batch files kill scan planning (one task + one open per file);
    * compaction restores O(data/target) tasks. Write-then-swap so readers
    * never observe a half-written directory.
    */
  /** Recover stale swap dirs from a crashed prior run BEFORE touching
    * anything. Hadoop rename signals failure by returning false, so a
    * stale bak/tmp must be resolved explicitly or the swap renames fail
    * and could strand (or worse, delete) the only live copy.
    */
  private[sources] def recoverStaleSwap(fs: FileSystem, path: Path, tmp: Path, bak: Path): Unit = {
    if (fs.exists(bak)) {
      if (!fs.exists(path)) {
        // prior run died between the two swap renames: bak IS the live data
        if (!fs.rename(bak, path))
          throw new java.io.IOException(s"swap recovery: cannot restore $bak -> $path")
      } else fs.delete(bak, true) // prior run died after the swap: bak is garbage
    }
    if (fs.exists(tmp)) fs.delete(tmp, true): Unit
  }

  /** Atomic-as-available directory swap: path -> bak, tmp -> path, drop
    * bak; every rename return value checked, rollback before any delete.
    */
  private[sources] def guardedSwap(fs: FileSystem, path: Path, tmp: Path, bak: Path): Unit = {
    if (!fs.rename(path, bak)) {
      fs.delete(tmp, true)
      throw new java.io.IOException(s"swap: rename $path -> $bak failed; original untouched")
    }
    if (!fs.rename(tmp, path)) {
      // bak is now the ONLY live copy — roll it back before any delete
      if (!fs.rename(bak, path))
        throw new java.io.IOException(s"swap failed AND rollback failed; live data is at $bak")
      fs.delete(tmp, true)
      throw new java.io.IOException(s"swap: rename $tmp -> $path failed; original restored")
    }
    fs.delete(bak, true): Unit
  }

  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int =
    compactSorted(spark, dir, targetBytes, Seq.empty)

  /** Compaction that (re)establishes CLUSTERING while it resizes files:
    * with `sortCols`, rows are range-partitioned on the key before the
    * rewrite, so the output files carry pairwise NON-OVERLAPPING key
    * ranges — plain `compact` would hash rows to files and destroy
    * exactly the locality a z-order or time-ordered writer produced
    * (every compacted file would span the whole key space again,
    * un-pruning every future scan). Use the Morton key column from
    * [[Lake.mortonKey]] as the sort key to compact a z-ordered lake
    * without losing its dual-dim envelopes. File-boundary placement
    * comes from range sampling, so boundaries are not bit-reproducible
    * across runs — the non-overlap invariant is (IngestSpec-pinned),
    * which is what pruning needs.
    */
  def compactSorted(spark: org.apache.spark.sql.SparkSession, dir: String,
                    targetBytes: Long, sortCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.col
    val path = new Path(dir)
    val fs = FileSystem.get(path.toUri, spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.getParent, s".${path.getName}_compacting")
    val bak = new Path(path.getParent, s".${path.getName}_old")
    recoverStaleSwap(fs, path, tmp, bak)
    val total = fs.listStatus(path).filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith(".")).map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val out =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    out.write.mode("overwrite").parquet(tmp.toString)
    guardedSwap(fs, path, tmp, bak)
    n
  }
}

/** Durable partition-scoped MERGE on a hive-partitioned parquet lake — the
  * reference's upsert sink (/root/reference/data_pipeline.py:501-535) as an
  * actual lake operation, not just q14's pure-query semantics. Delta or
  * Iceberg would be the idiomatic transactional answer; the offline build
  * carries no such dependency, so the guarded write-then-swap protocol
  * from [[Storage.compact]] is the available equivalent.
  */
object Lake {

  import org.apache.hadoop.fs.{FileSystem, Path}
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

  /** Upsert `updates` into the lake at `dir` (layout `dir/part=value/`):
    * per affected partition, rows are resolved by `keyCol` (update wins,
    * new keys insert) and the partition directory is rewritten through a
    * temp dir + guarded swap, so readers never observe a half-written
    * partition and a crashed run is recovered on the next apply.
    *
    * Scale contract: the unit of work is O(affected partitions) — only
    * partitions PRESENT IN THE UPDATES are listed, read, or rewritten; a
    * 10-partition update against a 100k-partition lake touches 10
    * directories. The resolution is a pure function of (partition
    * content, updates), so applying the same batch twice leaves identical
    * content — reruns after a crash are safe (proven in IngestSpec).
    * Assumes keys don't move across partitions (stable key->partition
    * mapping) and path-safe partition values; returns #partitions written.
    */
  def mergeUpsert(spark: SparkSession, dir: String, updates: DataFrame,
                  keyCol: String, partCol: String): Int = {
    // `updates` is consumed once for partition discovery plus twice per
    // affected partition — without a persist the (possibly expensive)
    // update computation re-runs for every consumer. Tolerate callers who
    // already persisted at a different level.
    val cachedHere =
      try { updates.persist(); true }
      catch { case _: IllegalArgumentException | _: UnsupportedOperationException => false }
    try mergeUpsertImpl(spark, dir, updates, keyCol, partCol)
    finally if (cachedHere) { updates.unpersist(false): Unit }
  }

  private def mergeUpsertImpl(spark: SparkSession, dir: String, updates: DataFrame,
                              keyCol: String, partCol: String): Int = {
    val parts = updates.select(col(partCol)).distinct().collect()
      .map(_.get(0).toString).sorted
    require(parts.forall(p => !p.exists("/\\:*?\"<>|%".contains(_))),
      s"partition values must be path-safe, got: ${parts.mkString(",")}")
    val base = new Path(dir)
    val fs = FileSystem.get(base.toUri, spark.sparkContext.hadoopConfiguration)
    def mergeOne(p: String): Unit = {
      val live = new Path(base, s"$partCol=$p")
      val tmp = new Path(base, s".$partCol=$p.merging")
      val bak = new Path(base, s".$partCol=$p.old")
      Storage.recoverStaleSwap(fs, live, tmp, bak)
      val upd = updates.filter(col(partCol) === p).drop(partCol)
      val merged =
        if (fs.exists(live)) {
          val old = spark.read.parquet(live.toString)
          upd.unionByName(
            old.join(upd.select(col(keyCol)), Seq(keyCol), "left_anti"))
        } else upd
      merged.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(live)) Storage.guardedSwap(fs, live, tmp, bak)
      else if (!fs.rename(tmp, live))
        throw new java.io.IOException(s"mergeUpsert: cannot create partition $live")
    }
    // Partition merges are independent (disjoint directories, disjoint
    // update slices), so run them concurrently from driver threads: the
    // Spark scheduler interleaves the per-partition jobs and an
    // N-partition apply costs ~one partition's latency, not N. Failure in
    // any partition propagates; completed partitions stay applied —
    // which is safe because the apply is idempotent per partition
    // (rerun == same content, proven in IngestSpec).
    val par = math.min(parts.length, 8)
    if (par <= 1) parts.foreach(mergeOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        val all = scala.concurrent.Future.traverse(parts.toList) { p =>
          scala.concurrent.Future(mergeOne(p))
        }
        scala.concurrent.Await.result(all, scala.concurrent.duration.Duration.Inf): Unit
      } finally pool.shutdown()
    }
    parts.length
  }

  /** Morton (z-order) interleave of two pre-bucketed integer columns
    * (each in [0, 2^bits)): bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Pure integer column arithmetic — deterministic in any
    * engine, exactly the formula the q138 audit scores. */
  def mortonKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int = 8): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** WRITE the z-ordered layout the q138 audit scores — rows are routed to
    * output files by an explicit integer z-bucket id and written
    * hive-partitioned on it, so each physical file's (min, max) envelope
    * on BOTH interleaved dims is tight and parquet row-group/file pruning
    * skips most files for a predicate on EITHER dim. `zfile` must be a
    * deterministic non-negative integer (typically the top bits of
    * [[mortonKey]]).
    *
    * Layout contract: rows are repartitioned ON the file id before the
    * write, so every `zfile=N` directory is produced by exactly one task
    * and holds exactly one parquet part — file count and per-file content
    * are a pure function of the data, never of parallelism. At 100 TB the
    * same shape holds per lake partition: the z-bucket count bounds file
    * size (pick `zfile` span so buckets ~ 128 MB), the shuffle is one
    * exchange keyed on a small integer, and readers prune by directory
    * before ever opening a footer. */
  def writeZOrdered(df: DataFrame, dir: String,
                    zfile: org.apache.spark.sql.Column): Unit =
    df.withColumn("zfile", zfile)
      .repartition(col("zfile"))
      .write.mode("overwrite").partitionBy("zfile").parquet(dir)

  /** Enumerate the z-bucket ids whose Morton-code range can contain a
    * point of the rectangle [aLo,aHi] x [bLo,bHi] (bucketed dims, each in
    * [0, 2^bits)). Bucket id = morton code >> bucketShift, matching a
    * [[writeZOrdered]] call keyed on `shiftright(mortonKey(a,b), shift)`.
    * Runs driver-side over the 2^(2*bits) code space — 65k iterations at
    * the default 8 bits, microseconds, and INDEPENDENT of data size: the
    * same call plans the scan of a 100 TB lake. */
  def zBuckets(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
               bits: Int = 8, bucketShift: Int = 8): Seq[Long] = {
    val out = scala.collection.mutable.SortedSet.empty[Long]
    val maxCode = 1L << (2 * bits)
    var code = 0L
    while (code < maxCode) {
      var i = 0; var a = 0L; var b = 0L
      while (i < bits) {
        a |= ((code >> (2 * i)) & 1L) << i
        b |= ((code >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      if (a >= aLo && a <= aHi && b >= bLo && b <= bHi) out += (code >> bucketShift)
      code += 1
    }
    out.toSeq
  }

  /** Pruned scan of a [[writeZOrdered]] lake: the buckets that can hold
    * the query rectangle come from [[zBuckets]] (pure bucket math, zero
    * data access) and land as a PARTITION filter on the hive `zfile`
    * column, so every non-matching directory is dropped before a single
    * parquet footer is opened. Callers still apply the row-level
    * predicate afterwards — the bucket set is a superset cover. This is
    * the scan-side payoff of the z-order writer: a selective rectangle
    * on BOTH dims reads a few percent of the files, where a date-linear
    * layout reads every file for any predicate on its second dim. */
  def readZOrdered(spark: SparkSession, dir: String, buckets: Seq[Long]): DataFrame =
    spark.read.parquet(dir).where(col("zfile").isin(buckets: _*))
}

/** Notification gating (C5/S11): the reference proceeds with the upload only
  * if the "started" notification succeeded (EMAIL_STATUS global,
  * /root/reference/data_pipeline.py:153-160). Modeled as plain driver-side
  * control flow around a pluggable notifier — notifications are not a
  * data-plane concern.
  */
trait Notifier extends Serializable {
  def send(subject: String, body: String): Boolean
}

object Pipeline {

  /** Runs `action` only if the start notification succeeds; sends the
    * completion notification afterwards. Returns None when gated off.
    */
  def withNotification[T](n: Notifier, job: String)(action: => T): Option[T] = {
    if (!n.send(s"$job started", s"pipeline $job starting")) None
    else {
      val out = action
      n.send(s"$job completed", s"pipeline $job done")
      Some(out)
    }
  }
}
