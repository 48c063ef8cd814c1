package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation

/** Curation operators: deterministic stratified sampling (fraction
  * accuracy, reproducibility, salt independence) and benchmark
  * contamination (exact shared-shingle threshold). */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-curation")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stratified sample: per-stratum fractions, deterministic, salt-independent") {
    import spark.implicits._
    val df = (1 to 30000).map(i => (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
    val fracs = Map("a" -> 0.5, "b" -> 0.1)
    val out = Curation.stratifiedSample(df, "id", "s", fracs).cache()
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 10k 'a' rows at 0.5, 20k 'b' rows at 0.1 — md5 is uniform, so ±10%
    assert(math.abs(byStratum("a") - 5000) < 500, s"a: ${byStratum("a")}")
    assert(math.abs(byStratum("b") - 2000) < 300, s"b: ${byStratum("b")}")

    // deterministic: the same call selects the same ids
    val again = Curation.stratifiedSample(df, "id", "s", fracs)
    assert(out.select("id").except(again.select("id")).count() == 0)
    assert(again.select("id").except(out.select("id")).count() == 0)

    // a different salt draws an independent sample (overlap ≈ frac², not 1)
    val other = Curation.stratifiedSample(df, "id", "s", fracs, salt = "other")
    val overlap = out.select("id").intersect(other.select("id")).count()
    assert(overlap < out.count(), "different salts must not select identically")
    out.unpersist()
  }

  test("stratified sample: default fraction and 0/1 edges") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, "x")).toDF("id", "s")
    assert(Curation.stratifiedSample(df, "id", "s", Map("x" -> 1.0)).count() == 1000)
    assert(Curation.stratifiedSample(df, "id", "s", Map("x" -> 0.0)).count() == 0)
    // stratum not listed → default (0.0 unless given)
    assert(Curation.stratifiedSample(df, "id", "s", Map("y" -> 1.0)).count() == 0)
    val d = Curation.stratifiedSample(df, "id", "s", Map("y" -> 1.0), default = 0.2).count()
    assert(d > 100 && d < 300, s"default-fraction stratum kept $d of 1000")
  }

  test("packChunks: distributed two-phase cumsum equals the global layout") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // irregular token counts; many partitions so the offset join matters
    val df = (1 to 5000).map(i => (i.toLong, (i % 97 + 1).toLong)).toDF("id", "tok")
    val out = graft.llm.Curation.packChunks(df, "id", "tok", budget = 1000, nParts = 16)
      .orderBy("id").collect()
    var cum = 0L
    out.foreach { r =>
      val (id, tok, off, first, last) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(off == cum, s"doc $id: offset $off != expected $cum")
      assert(first == off / 1000)
      assert(last == math.max(first, (off + tok - 1) / 1000), s"doc $id")
      cum += tok
    }
    // straddlers exist (a 1000-budget with ~49-token docs crosses bounds)
    assert(out.exists(r => r.getLong(3) != r.getLong(4)))
  }

  test("contamination: exact shared-shingle threshold, no self-noise") {
    import spark.implicits._
    val base = "w1 w2 w3 w4 w5 w6 w7" // 5 trigram shingles
    val corpus = Seq(
      (1L, base),                           // verbatim benchmark copy: 5 shared
      (2L, "w1 w2 w3 w4 w5 w6 zz"),         // 4 shared trigrams — below threshold
      (3L, "a b c d e f g")                 // disjoint
    ).toDF("doc_id", "text")
    val bench = Seq((100L, base)).toDF("bench_id", "text")
    val out = Curation.contamination(corpus, "doc_id", "text",
        bench, "bench_id", "text", shingleSize = 3, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 100L, 5L)), s"got ${out.toSeq}")
  }

  test("mixtureSample: rates track weights; undersized domain keeps all; deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // domain a: 1000 docs × 10 tokens = 10000; domain b: 10 docs × 10 = 100;
    // domain c unlisted (must be dropped entirely)
    val rows = (1 to 1000).map(i => (i.toLong, "a", 10L)) ++
      (2001 to 2010).map(i => (i.toLong, "b", 10L)) ++
      (3001 to 3010).map(i => (i.toLong, "c", 10L))
    val df = rows.toDF("id", "dom", "tok")
    def run() = Curation.mixtureSample(df, "id", "dom", col("tok"),
      Map("a" -> 0.5, "b" -> 0.5), tokenBudget = 2000, salt = "t")
    val out = run().collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    // per-domain target = 1000 tokens: a rate 0.1 → ~100 of 1000 docs;
    // b total (100) under target → rate capped at 1, ALL kept
    assert(byDom("b") == 10, s"b: $byDom")
    assert(byDom("a") > 50 && byDom("a") < 200, s"a: $byDom")
    assert(!byDom.contains("c"), s"unlisted domain kept: $byDom")
    assert(run().collect().map(_.getLong(0)).toSet == out.map(_._1).toSet,
      "mixtureSample not deterministic")
  }

  test("leakFreeSplit: clusters never span splits, fractions honored, deterministic") {
    import spark.implicits._
    // 600 docs, every 3rd has a near-dup pair partner (id+10000)
    val docs = (1L to 600L).map(i => Tuple1(i)).toDF("id")
      .unionByName((3L to 600L by 3).map(i => Tuple1(i + 10000)).toDF("id"))
    val pairs = (3L to 600L by 3).map(i => (i, i + 10000)).toDF("id_a", "id_b")
    def run() = graft.llm.Curation.leakFreeSplit(docs, "id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
      .select("id", "cluster", "split").as[(Long, Long, String)].collect()
    val out = run()
    assert(out.length == 800)
    // leakage freedom: every cluster maps to exactly one split
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c spans splits")
    }
    // paired docs share their partner's split
    val byId = out.map(r => r._1 -> r._3).toMap
    (3L to 600L by 3).foreach(i => assert(byId(i) == byId(i + 10000)))
    // fractions roughly honored at the CLUSTER level (600 clusters)
    val clusterSplits = out.groupBy(_._2).map(_._2.head._3)
    val train = clusterSplits.count(_ == "train").toDouble / clusterSplits.size
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
    assert(clusterSplits.exists(_ == "val") && clusterSplits.exists(_ == "test"))
    assert(run().sortBy(_._1).sameElements(out.sortBy(_._1)), "not deterministic")
    intercept[IllegalArgumentException] {
      graft.llm.Curation.leakFreeSplit(docs, "id", pairs,
        Seq("a" -> 0.5, "b" -> 0.4), "s")
    }
  }

  test("shuffleShards: exact permutation, deterministic, salt reshuffles, null-safe") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i: java.lang.Long, s"d$i")).toDF("id", "v")
    def run(salt: String) =
      graft.llm.Curation.shuffleShards(df, "id", nShards = 8, salt)
        .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    val a = run("e0")
    // every row present exactly once; positions within each shard are 1..n
    assert(a.length == 500 && a.map(_._1).toSet.size == 500)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // deterministic per salt; a new salt actually reshuffles
    assert(run("e0").sortBy(_._1).sameElements(a.sortBy(_._1)))
    val b = run("e1")
    assert(a.sortBy(_._1).map(r => (r._2, r._3)).toSeq !=
      b.sortBy(_._1).map(r => (r._2, r._3)).toSeq)
    // rough balance: no shard holds more than half the corpus
    assert(a.groupBy(_._2).values.map(_.length).max < 250)
    // NULL id is kept, not dropped
    val withNull = df.unionByName(Seq((null: java.lang.Long, "dnull")).toDF("id", "v"))
    assert(graft.llm.Curation.shuffleShards(withNull, "id", 8, "e0").count() == 501)
  }

  test("capPerGroup: best-N per group, deterministic tiebreak, NULLs last") {
    import spark.implicits._
    // group g0 has 30 rows, quality = id % 7 (heavy ties); g1 has 2 rows
    // (below the cap); one row carries a NULL quality
    val rows = (1 to 30).map(i => (i.toLong, "g0", java.lang.Long.valueOf(i % 7L))) ++
      Seq((31L, "g1", java.lang.Long.valueOf(9L)), (32L, "g1", null: java.lang.Long),
        (33L, "g0", null: java.lang.Long))
    val df = rows.toDF("id", "grp", "q")
    val out = Curation.capPerGroup(df, "id", "grp", "q", maxPerGroup = 5)
      .select("id", "grp", "q", "group_rank")
      .as[(Long, String, Option[Long], Long)].collect().sortBy(r => (r._2, r._4))
    // g1 keeps both rows (cap not reached), NULL quality ranked last
    assert(out.filter(_._2 == "g1").map(r => (r._1, r._4)).toSeq == Seq((31L, 1L), (32L, 2L)))
    val g0 = out.filter(_._2 == "g0")
    assert(g0.length == 5 && g0.map(_._4).toSeq == (1L to 5L))
    // expected order: quality desc, id asc — q=6 at ids 6,13,20,27 then q=5 at id 5
    assert(g0.map(_._1).toSeq == Seq(6L, 13L, 20L, 27L, 5L))
    // deterministic across runs
    val again = Curation.capPerGroup(df, "id", "grp", "q", 5)
      .select("id", "grp", "q", "group_rank")
      .as[(Long, String, Option[Long], Long)].collect().sortBy(r => (r._2, r._4))
    assert(again.sameElements(out))
    // the rank filter must compile to a WindowGroupLimit (partial top-k
    // before the exchange) — the 100 TB skew story depends on it
    val plan = Curation.capPerGroup(df, "id", "grp", "q", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("budgetSelect: maximal quality-ordered prefix under the budget") {
    import spark.implicits._
    // quality == id for a transparent expected order: 100 docs, cost 10
    // each → budget 255 keeps the best 25 (cum 250), the 26th would hit 260
    val df = (1 to 100).map(i => (i.toLong, 10L, i.toLong)).toDF("id", "cost", "q")
    val out = Curation.budgetSelect(df, "id", "cost", "q", budget = 255, nParts = 7)
      .select("id", "q", "cost", "cum_cost")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(out.length == 25)
    assert(out.map(_._1).toSeq == (100L to 76L by -1L))
    assert(out.head._4 == 10L && out.last._4 == 250L)
    // distributed two-phase cumsum equals the single global window
    val expected = df.withColumn("cum",
      org.apache.spark.sql.functions.sum($"cost")
        .over(org.apache.spark.sql.expressions.Window
        .orderBy($"q".desc_nulls_last, $"id".asc)
        .rowsBetween(Long.MinValue, 0)))
      .filter($"cum" <= 255).select("id", "cum")
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(r => (r._1, r._4)).sameElements(expected))
    // budget below the best doc's cost → empty, not an error
    assert(Curation.budgetSelect(df, "id", "cost", "q", budget = 5).count() == 0)
    // NULL cost counts 0; NULL quality sorts last but is admitted when
    // budget remains
    val withNulls = Seq((1L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(5L)),
      (2L, null: java.lang.Long, java.lang.Long.valueOf(4L)),
      (3L, java.lang.Long.valueOf(10L), null: java.lang.Long))
      .toDF("id", "cost", "q")
    val nOut = Curation.budgetSelect(withNulls, "id", "cost", "q", budget = 20)
      .select("id", "cum_cost").as[(Long, Long)].collect().sortBy(_._2).toSeq
    assert(nOut == Seq((2L, 10L), (1L, 10L), (3L, 20L)) ||
      nOut == Seq((1L, 10L), (2L, 10L), (3L, 20L)),
      s"got $nOut") // id=2 costs 0 so shares cum 10 with id=1; id=3 (NULL q) last
  }

  test("budgetSelect: negative costs total per-partition as sum, not running max") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sum => fsum}
    // every third cost is negative, so partition cumsums peak mid-stream:
    // a max(__cum)-based partition total would inflate later offsets and
    // drop in-budget rows
    val df = (1 to 60)
      .map(i => (i.toLong, if (i % 3 == 0) -7L else 10L, (100 - i).toLong))
      .toDF("id", "cost", "q")
    val got = Curation.budgetSelect(df, "id", "cost", "q", budget = 150, nParts = 5)
      .select("id", "cum_cost").as[(Long, Long)].collect().sortBy(_._1)
    val ref = df.withColumn("cum",
      fsum($"cost").over(org.apache.spark.sql.expressions.Window
        .orderBy($"q".desc_nulls_last, $"id".asc_nulls_first)
        .rowsBetween(Long.MinValue, 0)))
      .filter($"cum" <= 150).select("id", "cum")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(ref))
  }

  test("epochMixture: upsampled domains repeat whole epochs + fractional draw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // domain a: 5 docs × 10 tokens = 50; domain b: 20 docs × 10 = 200.
    // equal weights, budget 250 → share 125 each → r_a = 2.5, r_b = 0.625
    val docs = ((1 to 5).map(i => (i.toLong, "a", 10L)) ++
      (101 to 120).map(i => (i.toLong, "b", 10L))).toDF("id", "dom", "tok")
    def run() = Curation.epochMixture(docs, "id", "dom", col("tok"),
      Map("a" -> 1.0, "b" -> 1.0), tokenBudget = 250, salt = "e")
      .select("id", "dom", "epoch").as[(Long, String, Long)].collect().sortBy(r => (r._1, r._3))
    val out = run()
    // every a-doc gets epochs 0 and 1; epoch 2 only via the fractional draw,
    // so per-doc epoch sets are contiguous prefixes {0,1} or {0,1,2}
    val aEpochs = out.filter(_._2 == "a").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(aEpochs.keySet == (1L to 5L).toSet)
    aEpochs.values.foreach(es => assert(es == Seq(0L, 1L) || es == Seq(0L, 1L, 2L), s"epochs $es"))
    // b-docs appear at most once (epoch 0) and the kept set is EXACTLY what
    // mixtureSample selects at the same rate/salt (shared draw function)
    val bRows = out.filter(_._2 == "b")
    assert(bRows.forall(_._3 == 0L) && bRows.map(_._1).distinct.length == bRows.length)
    val viaSample = Curation.mixtureSample(docs, "id", "dom", col("tok"),
      Map("a" -> 1.0, "b" -> 1.0), tokenBudget = 250, salt = "e")
      .filter(col("dom") === lit("b")).select("id").as[Long].collect().sorted.toSeq
    assert(bRows.map(_._1).toSeq == viaSample)
    // deterministic
    assert(run().sameElements(out))
    // a tiny domain against a huge budget fails loudly instead of exploding
    val ex = intercept[IllegalArgumentException] {
      Curation.epochMixture(docs, "id", "dom", col("tok"),
        Map("a" -> 1.0), tokenBudget = 100000)
    }
    assert(ex.getMessage.contains("maxEpochs"))
  }

  test("mixture ops: zero-token domain keeps everything; NULL ids share one draw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // domain z has docs but 0 total tokens (all-NULL token counts): the
    // shortfall rule rates it 1.0 — every doc kept, exactly one epoch
    val docs = ((1 to 10).map(i => (java.lang.Long.valueOf(i.toLong), "z", null: java.lang.Long)) ++
      (11 to 20).map(i => (java.lang.Long.valueOf(i.toLong), "w", java.lang.Long.valueOf(10L))))
      .toDF("id", "dom", "tok")
    val em = Curation.epochMixture(docs, "id", "dom", col("tok"),
      Map("z" -> 1.0, "w" -> 1.0), tokenBudget = 50)
      .select("id", "dom", "epoch").as[(Long, String, Long)].collect()
    assert(em.count(_._2 == "z") == 10 && em.filter(_._2 == "z").forall(_._3 == 0L))
    val ms = Curation.mixtureSample(docs, "id", "dom", col("tok"),
      Map("z" -> 1.0, "w" -> 1.0), tokenBudget = 50)
    assert(ms.filter(col("dom") === "z").count() == 10)
    // NULL ids are not silently dropped: they share the ''-keyed draw, so
    // a sub-1 rate keeps either all of them or none — never a crash, and
    // at rate 1 (epoch floor) they are all present
    val withNullIds = ((1 to 10).map(_ => (null: java.lang.Long, "n", java.lang.Long.valueOf(10L))))
      .toDF("id", "dom", "tok")
    val ne = Curation.epochMixture(withNullIds, "id", "dom", col("tok"),
      Map("n" -> 1.0), tokenBudget = 150) // r = 1.5: epoch 0 for all + one shared draw
      .select("dom", "epoch").as[(String, Long)].collect()
    assert(ne.count(_._2 == 0L) == 10)
    assert(ne.count(_._2 == 1L) == 0 || ne.count(_._2 == 1L) == 10,
      s"NULL ids must share one fractional draw, got ${ne.count(_._2 == 1L)}")
  }

  test("temperatureWeights: sqrt smoothing flattens, alpha=1 is proportional, order pinned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // high-resource a: 9 docs × 1600 = 14400 tokens; low-resource b: 100
    val rows = (1 to 9).map(i => (i.toLong, "a", 1600L)) ++
      Seq((100L, "b", 100L), (200L, "c", 50L))
    val df = rows.toDF("id", "dom", "tok")

    val w1 = Curation.temperatureWeights(df, "dom", col("tok"), Seq("a", "b"), alpha = 1.0)
    assert(w1 == Map("a" -> 14400.0, "b" -> 100.0), s"alpha=1 must be raw totals: $w1")

    val w5 = Curation.temperatureWeights(df, "dom", col("tok"), Seq("a", "b"))
    assert(w5("a") == 120.0 && w5("b") == 10.0, s"sqrt weights: $w5")
    // smoothing: b's share rises from 100/14500 (~0.7%) to 10/130 (~7.7%)
    assert(w5("b") / (w5("a") + w5("b")) > 10 * (100.0 / 14500.0))
    // iteration order = domains order (the weight-sum fold contract)
    assert(Curation.temperatureWeights(df, "dom", col("tok"),
      Seq("b", "a")).keys.toSeq == Seq("b", "a"))
    // absent domain weighs 0 but stays in the map (participates in the fold)
    val wAbs = Curation.temperatureWeights(df, "dom", col("tok"), Seq("a", "zz"))
    assert(wAbs("zz") == 0.0 && wAbs.keys.toSeq == Seq("a", "zz"))
    // NULL token counts contribute 0, not NULL-poisoned totals
    val wNull = Curation.temperatureWeights(
      Seq((1L, "a", java.lang.Long.valueOf(100L)), (2L, "a", null: java.lang.Long))
        .toDF("id", "dom", "tok"), "dom", col("tok"), Seq("a"))
    assert(wNull("a") == 10.0, s"NULL tokens must coalesce to 0: $wNull")
    intercept[IllegalArgumentException](
      Curation.temperatureWeights(df, "dom", col("tok"), Seq("a", "a")))
    intercept[IllegalArgumentException](
      Curation.temperatureWeights(df, "dom", col("tok"), Seq("a"), alpha = 0.0))

    // composition: smoothed weights feed mixtureSample; the low-resource
    // domain is kept whole (its smoothed target exceeds its 100 tokens)
    // while the high-resource one downsamples
    val mixed = Curation.mixtureSample(df, "id", "dom", col("tok"),
      w5, tokenBudget = 2000, salt = "t5")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDom = mixed.groupBy(_._2).view.mapValues(_.length).toMap
    // b target = 2000·(10/130) ≈ 154 tokens > 100 → rate 1, all kept
    assert(byDom("b") == 1, s"low-resource domain must keep all: $byDom")
    assert(!byDom.contains("c"), "unlisted domain must drop")

    // the one-scan temperatureMixture is exactly the compose path
    val oneScan = Curation.temperatureMixture(df, "id", "dom", col("tok"),
      Seq("a", "b"), tokenBudget = 2000, alpha = 0.5, salt = "t5")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(oneScan == mixed.toSet, "temperatureMixture must equal temperatureWeights∘mixtureSample")
  }

  test("quantileBuckets: exact ntile split, deterministic, NULL scores last") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group g: 10 rows scored by id → terciles split 4/3/3 (SQL ntile:
    // ceil-sized leading buckets); one NULL score lands in the LAST bucket
    val rows = (1 to 10).map(i => (i.toLong, "g", java.lang.Long.valueOf(i.toLong))) :+
      ((11L, "g", null: java.lang.Long)) :+ ((12L, "h", java.lang.Long.valueOf(1L)))
    val df = rows.toDF("id", "grp", "score")
    val out = Curation.quantileBuckets(df, "id", "grp", "score", nBuckets = 3)
      .select("id", "grp", "bucket").as[(Long, String, Long)].collect()
    val g = out.filter(_._2 == "g").map(r => (r._1, r._3)).sortBy(_._1)
    // 11 rows in g → buckets sized 4/4/3; ids sorted by score asc, NULL last
    assert(g.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 2L,
      9L -> 3L, 10L -> 3L, 11L -> 3L), s"got ${g.toSeq}")
    // a single-row group is bucket 1, not an error
    assert(out.find(_._2 == "h").map(_._3).contains(1L))
    // deterministic across runs
    val again = Curation.quantileBuckets(df, "id", "grp", "score", 3)
      .select("id", "grp", "bucket").as[(Long, String, Long)].collect()
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }
}
