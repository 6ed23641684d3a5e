package graft

import graft.operators.Search
import graft.sources.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The delete-mask sidecar's contract (q231):
  *
  *  1. EQUALITY AFTER FOLD — a store whose feed deletes landed as the
  *     sequence-scoped mask, once compacted (mask folded into the
  *     physical layout and dropped), is bit-identical to the store whose
  *     deletes were applied physically at feed time (q227's): same table
  *     contents, same BM25 rows. This is what licenses the O(delta)
  *     delete leg — nothing is lost by deferring the rewrite.
  *  2. SEQUENCE SCOPING — the mask hides only rows of segments at or
  *     below its seq; a re-used doc_id arriving in a NEWER segment is
  *     visible through the mask (the lake's Iceberg-v2 rule, q151).
  *  3. DELTA-SIZED DELETE LEG — the mask table's bytes are key-rows, not
  *     index rows (the thing the rung row evidences at 10x).
  */
class MaskFoldSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def top5(path: String): Array[org.apache.spark.sql.Row] = {
    val idx = Search.loadIndex(s, path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    Search.bm25(idx, Search.querySet(Engine.table(s, sf, "documents")
        .select(col("doc_id"), col("text"), col("lang"))))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
      .orderBy(col("qid"), col("rn")).collect()
  }

  test("folding the mask reproduces the physically-rewritten store bit-for-bit") {
    // build both warm substrates through their public probes
    SparkEntry.queries("q231_masked_feed_sync")(s, sf).collect()
    SparkEntry.queries("q227_feed_synced_search")(s, sf).collect()
    val maskPath = Search.maskSyncStore(s, sf)
    val physPath = Search.feedSyncStore(s, sf)
    // fold on a COPY: the shared warm substrate must stay masked for
    // later q231 probes in this process
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    Search.foldDeleteMask(s, fold)
    graft.operators.Similarity.cleanupAtExit(fold)
    // the sidecar is gone...
    assert(IndexStore.readDeleteMask(s, fold).isEmpty,
      "fold must drop the delete-mask table")
    // ...every table's content equals the physically-rewritten store's
    for (t <- Seq("postings", "doclen", "dict", "positions")) {
      // compare by NAME: the physical apply's `join(ids, Seq("doc_id"))`
      // fronts the join key in the stored column order (cosmetic — every
      // reader selects by name); exceptAll is positional
      val cols = IndexStore.read(s, fold, t).columns.sorted.map(col)
      val a = IndexStore.read(s, fold, t).select(cols.toIndexedSeq: _*)
      val b = IndexStore.read(s, physPath, t).select(cols.toIndexedSeq: _*)
      val onlyA = a.exceptAll(b).limit(5).collect().toSeq
      val onlyB = b.exceptAll(a).limit(5).collect().toSeq
      assert(onlyA.isEmpty && onlyB.isEmpty,
        s"table '$t' differs between folded-mask and physical-rewrite stores; " +
          s"fold-only rows: $onlyA; physical-only rows: $onlyB")
    }
    // ...and the probe is bit-equal (scores included: stats converged)
    val got = top5(fold)
    val want = top5(physPath)
    assert(got.sameElements(want),
      "post-fold BM25 top-5 must equal the physically-rewritten store's")
  }

  test("mask scoping: a masked doc_id re-inserted in a newer segment stays visible") {
    import s.implicits._
    val path = s"target/tmp/maskscope_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.operators.Similarity.cleanupAtExit(path)
    // segment 0: docs 1, 2; then doc 1 is deleted (mask seq=0); then a
    // NEW doc 1 arrives in segment 1 (a re-ingestion after delete)
    Search.persistIndex(s, path, "scopespec",
      Seq((1L, "red fox"), (2L, "blue fox")).toDF("doc_id", "text"))
    IndexStore.appendDeleteMask(s, path, Seq(1L).toDF("doc_id").withColumn("seq", lit(0L)))
    Search.applyFeedToIndex(s, path, seg = 1,
      inserts = Seq((1L, "green fox")).toDF("doc_id", "text"),
      deleteIds = Seq.empty[Long].toDF("doc_id"))
    val mask = IndexStore.readDeleteMask(s, path).get
    val post = IndexStore.read(s, path, "postings")
    val live = post.join(broadcast(mask),
      post("doc_id") === mask("doc_id") && post("segment") <= mask("seq"), "left_anti")
    // the seg-0 "red" row is hidden, the seg-1 "green" row of the SAME id is not
    assert(live.filter(col("tok") === "red").isEmpty, "seg-0 rows of a masked id must hide")
    assert(!live.filter(col("tok") === "green" && col("doc_id") === 1L).isEmpty,
      "a re-inserted id in a newer segment must stay visible through the mask")
    assert(live.filter(col("doc_id") === 2L).count() == 2L, "unmasked docs unaffected")
    // ...and the fold preserves exactly that visibility physically
    Search.foldDeleteMask(s, path)
    val folded = IndexStore.read(s, path, "postings")
    assert(folded.filter(col("tok") === "red").isEmpty)
    assert(!folded.filter(col("tok") === "green").isEmpty)
  }

  test("vector family: folding the mask reproduces q229's physically-rewritten assign") {
    import graft.operators.Similarity
    SparkEntry.queries("q232_masked_feed_sync_ann")(s, sf).collect()
    SparkEntry.queries("q229_feed_synced_ann")(s, sf).collect()
    val maskPath = Similarity.ivfMaskSyncStore(s, sf)
    val physPath = Similarity.ivfSyncStore(s, sf)
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    Similarity.foldVecMask(s, fold, "assign", Seq("cid", "vec_id"))
    Similarity.cleanupAtExit(fold)
    assert(IndexStore.readDeleteMask(s, fold).isEmpty)
    val cols = Seq("cid", "vec_id", "embedding", "nrm").map(col)
    val a = IndexStore.read(s, fold, "assign").select(cols.toIndexedSeq: _*)
    val b = IndexStore.read(s, physPath, "assign").select(cols.toIndexedSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "folded assign must equal the physically-rewritten store's")
  }

  test("pq family: folding the mask reproduces q230's physically-rewritten codes") {
    import graft.operators.Similarity
    SparkEntry.queries("q233_masked_feed_sync_adc")(s, sf).collect()
    SparkEntry.queries("q230_feed_synced_adc")(s, sf).collect()
    val maskPath = Similarity.pqMaskSyncStore(s, sf)
    val physPath = Similarity.pqSyncStore(s, sf)
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    Similarity.foldVecMask(s, fold, "codes", Seq("vec_id", "j"))
    Similarity.cleanupAtExit(fold)
    assert(IndexStore.readDeleteMask(s, fold).isEmpty)
    val cols = Seq("vec_id", "j", "code", "d2").map(col)
    val a = IndexStore.read(s, fold, "codes").select(cols.toIndexedSeq: _*)
    val b = IndexStore.read(s, physPath, "codes").select(cols.toIndexedSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "folded codes must equal the physically-rewritten store's")
  }

  test("dedup family: folding the group-survival masks reproduces q228's rewritten store") {
    import graft.operators.Dedup
    SparkEntry.queries("q234_masked_feed_sync_screen")(s, sf).collect()
    SparkEntry.queries("q228_feed_synced_screen")(s, sf).collect()
    val maskPath = Dedup.dedupMaskSyncStore(s, sf)
    val physPath = Dedup.dedupSyncStore(s, sf)
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    Dedup.foldDedupMask(s, fold)
    graft.operators.Similarity.cleanupAtExit(fold)
    assert(IndexStore.readDeleteMask(s, fold).isEmpty)
    for (t <- Seq("digests", "sigs", "bands", "keys")) {
      val cols = IndexStore.read(s, physPath, t).columns.sorted.map(col)
      val a = IndexStore.read(s, fold, t).select(cols.toIndexedSeq: _*)
      val b = IndexStore.read(s, physPath, t).select(cols.toIndexedSeq: _*)
      val onlyA = a.exceptAll(b).limit(5).collect().toSeq
      val onlyB = b.exceptAll(a).limit(5).collect().toSeq
      assert(onlyA.isEmpty && onlyB.isEmpty,
        s"dedup table '$t' differs after fold; fold-only: $onlyA; physical-only: $onlyB")
    }
  }

  test("a schema-evolved feed batch is refused loudly, never silently projected") {
    import s.implicits._
    // the lake accepts mergeSchema'd commits, so a feed window can carry
    // a column the v1 index layout has no home for; the apply must
    // refuse (VERDICT r14 item 7) — silently dropping it would desync
    // index from lake without anyone noticing
    val path = s"target/tmp/feedschema_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.operators.Similarity.cleanupAtExit(path)
    Search.persistIndex(s, path, "schemaspec",
      Seq((1L, "red fox")).toDF("doc_id", "text"))
    val evolved = Seq((2L, "blue fox", "en")).toDF("doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      Search.applyFeedToIndex(s, path, seg = 1,
        inserts = evolved, deleteIds = Seq.empty[Long].toDF("doc_id"))
    }
    assert(e.getMessage.contains("schema-evolved feed"),
      s"refusal must name the schema problem, got: ${e.getMessage}")
    // the projected form of the same batch applies cleanly
    Search.applyFeedToIndex(s, path, seg = 1,
      inserts = evolved.select("doc_id", "text"),
      deleteIds = Seq.empty[Long].toDF("doc_id"))
    assert(graft.sources.IndexStore.read(s, path, "doclen").count() == 2L)
  }

  test("the delete leg writes delta-sized bytes, not index-sized rewrites") {
    SparkEntry.queries("q231_masked_feed_sync")(s, sf).collect()
    val path = Search.maskSyncStore(s, sf)
    def dirBytes(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(path, sub)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }
    // the mask is kilobytes; the postings table it spares is much larger
    assert(dirBytes(IndexStore.DeleteMaskTable) * 10 < dirBytes("postings"),
      "delete mask must be small relative to the table a physical delete would rewrite")
  }
}
