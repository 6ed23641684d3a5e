package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5.3) using scalacheck generators directly
  * (the scalatest bridge artifact is not available offline): 200 seeded
  * samples per property, evaluated through the real Spark expression engine
  * in a single batch.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => gen.apply(params, Seed(42L + i)))
  }

  test("money round-trip: format cents -> clean -> parse recovers the value") {
    val cents = samples(Gen.chooseNum(0L, 999999999L), 200)
    val rows = cents.map { c =>
      val dollars = c / 100
      val rem = c % 100
      // explicit US locale: %,d grouping is locale-dependent otherwise
      val grouped = String.format(java.util.Locale.US, "%,d", Long.box(dollars))
      (f"$$$grouped.$rem%02d", dollars + rem / 100.0)
    }
    val bad = rows.toDF("raw", "expected")
      .select(regexp_replace(col("raw"), "[$,]", "").cast("double").as("v"), col("expected"))
      .filter(col("v") =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("date parser is total: arbitrary strings never throw, bad -> null") {
    val junk = samples(Gen.alphaNumStr.map(_.take(39)), 200) ++
      Seq("", "99/99/9999 99:99", "0/0/0 0:0", " ", "\u0000", "🙂", "1//2")
    val parse = coalesce(
      to_date(col("raw"), "d/M/yyyy H:mm"),
      to_date(col("raw"), "yyyy-MM-dd"))
    val out = junk.toDF("raw").select(parse.as("d")).collect()
    out.foreach(r => assert(r.get(0) == null || r.get(0).isInstanceOf[java.sql.Date]))
  }

  test("dsum is exact for decimal-cents values regardless of partitioning") {
    val cents = samples(Gen.chooseNum(-10000000L, 10000000L), 400)
    val expected = cents.sum / 100.0
    val df1 = cents.map(_ / 100.0).toDF("v").repartition(1)
    val df7 = cents.map(_ / 100.0).toDF("v").repartition(7)
    val a = df1.agg(Engine.dsum(col("v"))).collect()(0).getDouble(0)
    val b = df7.agg(Engine.dsum(col("v"))).collect()(0).getDouble(0)
    assert(a == expected && b == expected)
  }

  test("IVM merge == direct recompute for random insert/delete histories") {
    import graft.sources.Snapshots
    // random base table + random inserted rows + random deleted keys: the
    // maintained aggregate must equal aggregating the final rows directly,
    // including groups that vanish entirely
    val rowGen = for {
      k <- Gen.chooseNum(0L, 60L)                 // key
      g <- Gen.chooseNum(0L, 5L).map(g => s"g$g") // group
      v <- Gen.chooseNum(-50L, 50L)               // value
    } yield (k, g, v)
    (0 until 5).foreach { round =>
      val base = samples(rowGen, 60).zipWithIndex
        .map { case ((k, g, v), i) => (k * 100 + i + round, g, v) } // unique keys
      val ins = samples(rowGen, 25).zipWithIndex
        .map { case ((k, g, v), i) => (1000000L + k * 100 + i + round, g, v) }
      val delKeys = samples(Gen.oneOf(base.map(_._1)), 30).distinct
      val baseDf = base.toDF("k", "g", "v")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val state = agg(baseDf)
      val insDelta = agg(ins.toDF("k", "g", "v"))
      val delDelta = agg(baseDf.join(delKeys.toDF("k"), Seq("k")))
        .select(col("g"), (-col("n")).as("n"), (-col("sv")).as("sv"))
      val maintained = Snapshots.mergeAggDeltas(state, Seq(insDelta, delDelta),
        Seq("g"), "n").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      val finalRows = base.filterNot(r => delKeys.contains(r._1)) ++ ins
      val direct = agg(finalRows.toDF("k", "g", "v")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(maintained == direct, s"round $round: $maintained vs $direct")
    }
  }

  test("BPE training: every rule fires and the merged corpus shrinks accordingly") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextOps.bpeTrain(s, TestSpark.sf).cache()
    val rules = out.filter(col("iter") > 0).collect()
    assert(rules.length == 5 && rules.forall(_.getLong(3) > 0),
      "each round must select a pair that actually occurs")
    val after = out.filter(col("iter") === 0).collect()(0).getLong(3)
    val before = s.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    // each applied merge removes exactly one token; overlapping pair
    // counts can exceed applied merges, never the reverse
    val cntSum = rules.map(_.getLong(3)).sum
    assert(after < before, "merges must shrink the corpus")
    assert(before - after <= cntSum, "applied merges cannot exceed counted pairs")
    out.unpersist()
  }

  test("BPE encode agrees with the training run's totals, merge accounting exact") {
    import org.apache.spark.sql.functions._
    val enc = graft.operators.TextOps.bpeEncode(s, TestSpark.sf).cache()
    val trainAfter = graft.operators.TextOps.bpeTrain(s, TestSpark.sf)
      .filter(col("iter") === 0).collect()(0).getLong(3)
    val (tb, ta, nm) = {
      val r = enc.agg(sum("tok_before"), sum("tok_after"), sum("n_merged_tok")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // cross-query consistency: encode consumes the SAME run q171 reports
    assert(ta == trainAfter, s"encode total $ta != train total $trainAfter")
    // every merge removes one token and leaves >=1 underscore in the
    // merged token; a doubly-merged token carries 2 underscores, so the
    // token deficit bounds the merged-token count from above
    assert(tb > ta, "merges must shrink the corpus")
    assert(nm > 0 && nm <= tb - ta, s"merged-token accounting broken: $nm vs ${tb - ta}")
    // per-lang rows cover every language exactly once
    val langs = enc.select("lang").collect().map(_.getString(0)).sorted
    assert(langs.sameElements(langs.distinct) && langs.length == 5)
    enc.unpersist()
  }

  test("curriculum interleave: every position carries its decile, corpus covered once") {
    import org.apache.spark.sql.functions._
    val cur = graft.operators.TextOps.curriculum(s, TestSpark.sf).cache()
    // the decile cycle is positional: pos mod 10 == bucket for every doc,
    // so it must hold at both group extremes
    assert(cur.filter(pmod(col("min_pos"), lit(10)) =!= col("bucket")).count() == 0)
    assert(cur.filter(pmod(col("max_pos"), lit(10)) =!= col("bucket")).count() == 0)
    val total = cur.agg(sum("n_docs")).collect()(0).getLong(0)
    val docs = s.read.parquet(s"${TestSpark.sf}/documents.parquet").count()
    assert(total == docs, "every doc gets exactly one curriculum position")
    cur.unpersist()
  }

  test("decontamination repair drops exactly the docs the audit flags") {
    import org.apache.spark.sql.functions._
    val audit = graft.operators.TextOps.contamination(s, TestSpark.sf)
      .select(col("lang"), col("n_contaminated"))
    val repair = graft.operators.TextOps.decontaminate(s, TestSpark.sf).cache()
    val joined = repair.join(audit, "lang")
    assert(joined.filter(col("n_dropped") =!= col("n_contaminated")).count() == 0,
      "q183 must drop per lang exactly what q48 counts as contaminated")
    // conservation: kept + dropped covers the whole non-benchmark corpus
    val total = repair.agg(sum(col("n_kept") + col("n_dropped"))).collect()(0).getLong(0)
    val corpus = s.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(col("doc_id") % 100 =!= 0).count()
    assert(total == corpus, s"repair must cover the corpus: $total vs $corpus")
    repair.unpersist()
  }

  test("bigram surprisal scoring: sane ranges and complete per-lang coverage") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextOps.lmPerplexity(s, TestSpark.sf).cache()
    val total = out.agg(sum("n_docs")).collect()(0).getLong(0)
    val docs = s.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(total == docs, "every >=2-token doc must be scored exactly once")
    assert(out.filter(col("avg_sp_micro") <= 0).count() == 0,
      "surprisal is positive (P < 1 for every smoothed bigram)")
    assert(out.filter(col("n_low") > col("n_docs")).count() == 0)
    out.unpersist()
  }

  test("pagerank differential: distributed integer iteration == exact local reference on random graphs") {
    // The DuckDB oracle only covers the fixture graph; this drives the
    // SAME integer formula through a sequential in-memory reference on
    // generated graphs (multi-edges, dangling sinks, hubs, disconnected
    // nodes) and demands EXACT equality — any divergence in the div/sum
    // order contract between the distributed plan and the definition
    // shows up as a femto-level mismatch, not an epsilon.
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L))).map(_.take(40))
    samples(edgeGen, 25).foreach { edges =>
      val df = edges.toDF("src", "dst").repartition(3)
      val got = graft.operators.Analytics.pageRankOn(df, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // exact local reference, same formula: r/deg and (85*sum)/100 are
      // Long divisions, base = 0.15e15/n with n = nodes that have out-edges
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size.toLong
      val base = 150000000000000L / n
      var ranks: Map[Long, Long] = deg.map { case (s0, _) => s0 -> 1000000000000000L / n }
      for (_ <- 1 to 3) {
        val sums = scala.collection.mutable.Map.empty[Long, Long]
        edges.foreach { case (s0, d0) =>
          ranks.get(s0).foreach { r =>
            sums(d0) = sums.getOrElse(d0, 0L) + r / deg(s0)
          }
        }
        ranks = sums.map { case (d0, c) => d0 -> (base + (85L * c) / 100L) }.toMap
      }
      assert(got == ranks,
        s"distributed != reference for edges=$edges\n got=$got\n want=$ranks")
    }
  }
}
