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

  test("mixadm family: folding the masks reproduces q260's physically-rewritten store") {
    import graft.operators.ScaleOps
    SparkEntry.queries("q265_masked_mixadm_sync")(s, sf).collect()
    SparkEntry.queries("q260_feed_synced_mixadm")(s, sf).collect()
    val maskPath = ScaleOps.mixAdmMaskSyncStore(s, sf)
    val physPath = ScaleOps.mixAdmitSyncStore(s, sf)
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    ScaleOps.foldMixAdmMask(s, fold)
    graft.operators.Similarity.cleanupAtExit(fold)
    assert(IndexStore.readDeleteMask(s, fold).isEmpty,
      "fold must drop the delete-mask sidecar")
    assert(!IndexStore.tableNames(s, fold).contains("mask_gone"),
      "fold must drop the gone-digest mask")
    // the two stores saw the SAME drained feed (shared fixture), so every
    // table must converge: keys/digests (the folded erasure), counts and
    // rates (they telescoped across the masked legs)
    for (t <- Seq("keys", "digests", "counts", "rates")) {
      val cols = IndexStore.read(s, fold, t).columns.sorted.map(col)
      val a = IndexStore.read(s, fold, t).select(cols.toIndexedSeq: _*)
      val b = IndexStore.read(s, physPath, t).select(cols.toIndexedSeq: _*)
      val onlyA = a.exceptAll(b).limit(5).collect().toSeq
      val onlyB = b.exceptAll(a).limit(5).collect().toSeq
      assert(onlyA.isEmpty && onlyB.isEmpty,
        s"table '$t' differs between folded-mask and physical stores; " +
          s"fold-only: $onlyA; physical-only: $onlyB")
    }
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

  test("knn-graph family: folding the masks reproduces q244's physically-synced edges") {
    import graft.operators.Similarity
    SparkEntry.queries("q245_masked_feed_sync_knn")(s, sf).collect()
    SparkEntry.queries("q244_feed_synced_knn")(s, sf).collect()
    val maskPath = Similarity.knnMaskSyncStore(s, sf)
    val physPath = Similarity.knnSyncStore(s, sf)
    val fold = maskPath + "_foldspec"
    IndexStore.copy(s, maskPath, fold)
    Similarity.foldKnnMask(s, fold)
    graft.operators.Similarity.cleanupAtExit(fold)
    assert(IndexStore.readDeleteMask(s, fold).isEmpty,
      "fold must drop the delete-mask sidecar")
    assert(Similarity.knnStaleMask(s, fold).isEmpty,
      "fold must drop the stale-list mask")
    // the folded edges equal the physical sync's (seg is provenance on
    // the fold side only — the physical store collapses legs in place)
    val cols = Seq("src", "nbr", "cosim", "rn").map(col)
    val a = IndexStore.read(s, fold, "edges").select(cols.toIndexedSeq: _*)
    val b = IndexStore.read(s, physPath, "edges").select(cols.toIndexedSeq: _*)
    val onlyA = a.exceptAll(b).limit(5).collect().toSeq
    val onlyB = b.exceptAll(a).limit(5).collect().toSeq
    assert(onlyA.isEmpty && onlyB.isEmpty,
      s"folded edges must equal the physically-synced store's; " +
        s"fold-only: $onlyA; physical-only: $onlyB")
    // membership too: folded assign equals the physical store's
    val mcols = Seq("cid", "vec_id", "nrm").map(col)
    val ma = IndexStore.read(s, fold, "assign").select(mcols.toIndexedSeq: _*)
    val mb = IndexStore.read(s, physPath, "assign").select(mcols.toIndexedSeq: _*)
    assert(ma.exceptAll(mb).isEmpty && mb.exceptAll(ma).isEmpty,
      "folded assign must equal the physically-synced store's")
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

  test("an ADDITIVE schema-evolved feed batch is carried into docmeta, v1 tables untouched") {
    import s.implicits._
    // VERDICT r15 item 5: the lake itself carries additive columns
    // (mergeSchema=true), so the feed apply must too — the extra column
    // lands in the docmeta side table; every v1 table keeps its schema
    val path = s"target/tmp/feedcarry_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.operators.Similarity.cleanupAtExit(path)
    Search.persistIndex(s, path, "carryspec",
      Seq((1L, "red fox")).toDF("doc_id", "text"))
    val evolved = Seq((2L, "blue fox", "en")).toDF("doc_id", "text", "lang")
    Search.applyFeedToIndex(s, path, seg = 1,
      inserts = evolved, deleteIds = Seq.empty[Long].toDF("doc_id"))
    val dl = graft.sources.IndexStore.read(s, path, "doclen")
    assert(dl.count() == 2L, "the evolved doc must be indexed")
    assert(dl.columns.sorted.sameElements(Array("dl", "doc_id", "segment")),
      "doclen's v1 schema must be untouched by the carry")
    val dm = Search.readDocMeta(s, path).collect()
    assert(dm.length == 1 && dm(0).getAs[Long]("doc_id") == 2L
      && dm(0).getAs[String]("lang") == "en",
      s"docmeta must carry exactly the evolved row, got: ${dm.toSeq}")
    // a SECOND window evolving DIFFERENTLY: mergeSchema union, absent null
    Search.applyFeedToIndex(s, path, seg = 2,
      inserts = Seq((3L, "green fox", 7L)).toDF("doc_id", "text", "score"),
      deleteIds = Seq.empty[Long].toDF("doc_id"))
    val dm2 = Search.readDocMeta(s, path)
    assert(dm2.columns.toSet == Set("doc_id", "lang", "score", "segment"))
    assert(dm2.filter(col("doc_id") === 3L && col("lang").isNull
      && col("score") === 7L).count() == 1L)
    // ...and the erasure leg maintains docmeta like any doc-keyed table
    Search.applyFeedToIndex(s, path, seg = 3,
      inserts = Seq.empty[(Long, String)].toDF("doc_id", "text"),
      deleteIds = Seq(2L).toDF("doc_id"))
    assert(Search.readDocMeta(s, path).filter(col("doc_id") === 2L).isEmpty,
      "a deleted doc's carried row must be erased with it")
  }

  test("a KEY/TYPE-changed feed batch is still refused loudly, never silently cast") {
    import s.implicits._
    val path = s"target/tmp/feedschema_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.operators.Similarity.cleanupAtExit(path)
    Search.persistIndex(s, path, "schemaspec",
      Seq((1L, "red fox")).toDF("doc_id", "text"))
    // doc_id retyped to string: not evolution, a different feed
    val retyped = Seq(("2", "blue fox")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Search.applyFeedToIndex(s, path, seg = 1,
        inserts = retyped, deleteIds = Seq.empty[Long].toDF("doc_id"))
    }
    assert(e.getMessage.contains("schema-evolved feed"),
      s"refusal must name the schema problem, got: ${e.getMessage}")
    // missing text refuses the same way
    val e2 = intercept[IllegalArgumentException] {
      Search.applyFeedToIndex(s, path, seg = 1,
        inserts = Seq((2L, "en")).toDF("doc_id", "lang"),
        deleteIds = Seq.empty[Long].toDF("doc_id"))
    }
    assert(e2.getMessage.contains("schema-evolved feed"))
    assert(graft.sources.IndexStore.read(s, path, "doclen").count() == 1L,
      "a refused batch must leave the store untouched")
  }

  test("auto-fold policy: fold-at-threshold equals manual fold, and below threshold the mask stays") {
    import s.implicits._
    val base = s"target/tmp/autofold_${java.util.UUID.randomUUID().toString.take(8)}"
    def mkStore(sfx: String): String = {
      val p = s"${base}_$sfx"
      graft.operators.Similarity.cleanupAtExit(p)
      Search.persistIndex(s, p, "afspec",
        (1L to 10L).map(i => (i, s"fox number $i")).toDF("doc_id", "text"))
      IndexStore.appendDeleteMask(s, p,
        Seq(3L, 7L).toDF("doc_id").withColumn("seq", lit(0L)))
      p
    }
    // BELOW threshold: with the knob at 0.5 the store's 20% masked
    // fraction does NOT fire the fold; the mask stays
    val cold = mkStore("cold")
    val knob = "spark.graft.mask.maxDeletedFraction"
    val prev = s.conf.getOption(knob)
    try {
      s.conf.set(knob, "0.5")
      assert(!IndexStore.autoFoldIfNeeded(s, cold, "doclen", "doc_id")(
        Search.foldDeleteMask(s, cold)), "20% < 50%: must not fire")
      assert(IndexStore.readDeleteMask(s, cold).nonEmpty,
        "below threshold the mask must stay (the delete leg stays O(delta))")
      // ABOVE threshold: fires, and the result equals a MANUAL fold
      s.conf.set(knob, "0.1")
      val auto = mkStore("auto")
      val manual = mkStore("manual")
      Search.foldDeleteMask(s, manual)
      assert(IndexStore.autoFoldIfNeeded(s, auto, "doclen", "doc_id")(
        Search.foldDeleteMask(s, auto)), "20% > 10%: must fire")
      assert(IndexStore.readDeleteMask(s, auto).isEmpty,
        "the fired fold must drop the sidecar")
      for (t <- Seq("postings", "doclen", "dict", "positions")) {
        val cols = IndexStore.read(s, auto, t).columns.sorted.map(col)
        val a = IndexStore.read(s, auto, t).select(cols.toIndexedSeq: _*)
        val b = IndexStore.read(s, manual, t).select(cols.toIndexedSeq: _*)
        assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
          s"fold-at-threshold must equal manual fold for table '$t'")
      }
      // the post-fold probe path degrades gracefully: missing mask = empty
      val m = IndexStore.readDeleteMaskOrEmpty(s, auto, "doc_id")
      assert(m.isEmpty && m.columns.sameElements(Array("doc_id", "seq")),
        "a folded store's mask must read as EMPTY, not hard-fail (ADVICE r15)")
    } finally prev.fold(s.conf.unset(knob))(v => s.conf.set(knob, v))
  }

  test("as-of x mask: a horizon read applies only masks visible at that horizon (search)") {
    import s.implicits._
    val path = s"target/tmp/maskasof_${java.util.UUID.randomUUID().toString.take(8)}"
    graft.operators.Similarity.cleanupAtExit(path)
    // seg 0: docs 1, 2; mask(1, seq=0) lands with the seg-0 view;
    // seg 1: doc 3 arrives; mask(2, seq=1) drains AFTER segment 1
    Search.persistIndex(s, path, "asofspec",
      Seq((1L, "red fox"), (2L, "blue fox")).toDF("doc_id", "text"))
    Search.applyFeedToIndex(s, path, seg = 1,
      inserts = Seq((3L, "green fox")).toDF("doc_id", "text"),
      deleteIds = Seq.empty[Long].toDF("doc_id"))
    IndexStore.appendDeleteMask(s, path,
      Seq((1L, 0L), (2L, 1L)).toDF("doc_id", "seq"))
    val dl = IndexStore.read(s, path, "doclen")
    val mask = IndexStore.readDeleteMask(s, path).get
    def visible(h: Long): Set[Long] =
      Search.maskedAsOf(dl, mask, h).select("doc_id").collect().map(_.getLong(0)).toSet
    // horizon 0: the seq-1 mask is FROM THE FUTURE — doc 2 must be visible
    assert(visible(0L) == Set(2L),
      "at h=0 only the seq<=0 mask applies: doc 1 hidden, doc 2 served, doc 3 not yet committed")
    // horizon 1: both masks visible — only the arrival survives
    assert(visible(1L) == Set(3L),
      "at h=1 both masks apply: docs 1 and 2 hidden, arrival 3 served")
    // the unbounded read equals the full-horizon read
    assert(visible(Long.MaxValue) == Set(3L))
  }

  test("as-of x mask: horizon-before-mask vs horizon-after-mask (IVF family)") {
    import s.implicits._
    import graft.operators.Similarity
    // same timeline on a seg-tagged assign frame: vecs 1,2 at seg 0,
    // arrival 3 at seg 1; mask(1, seq=0) then mask(2, seq=1)
    val assign = Seq((0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 1L))
      .toDF("cid", "vec_id", "seg")
    val mask = Seq((1L, 0L), (2L, 1L)).toDF("vec_id", "seq")
    def visible(h: Long): Set[Long] =
      Similarity.applyVecMaskAsOf(assign, mask, h)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(visible(0L) == Set(2L),
      "at h=0 the seq-1 mask must not reach back: vec 2 visible")
    assert(visible(1L) == Set(3L))
    assert(visible(Long.MaxValue) == Set(3L))
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
