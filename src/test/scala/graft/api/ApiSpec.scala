package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The public extension-method surface: each method must agree with the
  * oracle-verified operator it wraps (or with a naive reference
  * computation). */
class ApiSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("lastWinsDedup keeps exactly the max-ord row per key") {
    val ev = graft.Tables(spark, sf, "events")
    val out = ev.lastWinsDedup("user_id", "event_id")
    assert(out.count() == ev.select("user_id").distinct().count())
    val expect = ev.groupBy("user_id").agg(max("event_id").as("last_id"))
    val chk = out.join(ev.select(col("user_id"), col("event_id"), col("value").as("v0")),
        Seq("user_id"))
      .join(expect, "user_id")
      .filter(col("event_id") === col("last_id"))
    assert(chk.filter(col("value") =!= col("v0")).count() == 0)
  }

  test("sessionize matches the rel_sessionize query's session count") {
    val ev = graft.Tables(spark, sf, "events")
    val api = ev.sessionize("user_id", "ts", 1800L)
      .groupBy("user_id").agg((max("session_idx") + 1).as("n_sessions"))
    val ref = graft.ops.Relational.queries("rel_sessionize")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_ref"))
    assert(api.join(ref, "user_id")
      .filter(col("n_sessions") =!= col("n_ref")).count() == 0)
  }

  test("asofJoinBackward matches rel_asof_join") {
    val ev = graft.Tables(spark, sf, "events").filter(col("event_id") % 20 === 0)
      .select("event_id", "user_id", "ts")
    val o = graft.Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val api = ev.asofJoinBackward(o, "event_id", "user_id", "ts",
        "o_custkey", "o_orderdate", "o_orderkey")
      .select("event_id", "o_orderkey")
    val ref = graft.ops.Relational.queries("rel_asof_join")(spark, sf)
      .select(col("event_id"), col("o_orderkey").as("ref_key"))
    assert(api.join(ref, "event_id")
      .filter(col("o_orderkey") =!= col("ref_key")).count() == 0)
    assert(api.count() == ref.count())
  }

  test("topkPerGroup matches the window top-k") {
    val j = graft.Tables(spark, sf, "orders")
      .join(broadcast(graft.Tables(spark, sf, "customer")),
        col("o_custkey") === col("c_custkey"))
    val api = j.topkPerGroup(col("c_mktsegment"), col("o_totalprice"),
        col("o_orderkey"), 3)
      .withColumnRenamed("group", "c_mktsegment")
      .withColumnRenamed("id", "o_orderkey")
      .select("c_mktsegment", "rk", "o_orderkey")
    val ref = graft.ops.Relational.queries("rel_window_topk")(spark, sf)
      .select("c_mktsegment", "rk", "o_orderkey")
    assert(api.exceptAll(ref).count() == 0 && ref.exceptAll(api).count() == 0)
  }

  test("nearDupPairs + clusterPairs agree with the corpus queries") {
    val d = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    val pairs = d.nearDupPairs(0.8)
    val ref = graft.ops.DedupOps.queries("dedup_lsh_neardup")(spark, sf)
    assert(pairs.select("d1", "d2").exceptAll(ref.select("d1", "d2")).count() == 0)
    assert(pairs.count() == ref.count())
    val clusters = pairs.clusterPairs()
    val refC = graft.ops.DedupOps.queries("dedup_clusters")(spark, sf)
    assert(clusters.exceptAll(refC).count() == 0 && clusters.count() == refC.count())
  }

  test("containmentPairs, piiRedact, removeFrequentLines, hashedLinearScore agree with the corpus queries") {
    val d = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    val cont = d.containmentPairs(0.9, k = 5)
    val contRef = graft.ops.DedupOps.queries("dedup_containment")(spark, sf)
    assert(cont.exceptAll(contRef).count() == 0 && cont.count() == contRef.count())

    val lines = d.removeFrequentLines("doc_id", "text", 3, 3)
    val linesRef = graft.ops.CleanOps.queries("text_line_dedup")(spark, sf)
    assert(lines.exceptAll(linesRef).count() == 0 && lines.count() == linesRef.count())

    val weights = spark.range(0, 64)
      .select(col("id").as("bucket"), (col("id") % 7 - 3).as("wgt"))
    val score = d.hashedLinearScore("doc_id", "text", weights)
    val scoreRef = graft.ops.CleanOps.queries("text_quality_classifier")(spark, sf)
    assert(score.exceptAll(scoreRef).count() == 0 && score.count() == scoreRef.count())

    // piiRedact preserves input columns and flags nothing on a PII-free corpus
    val pii = d.piiRedact("text")
    assert(pii.columns.toSet ==
      Set("doc_id", "text", "n_email", "n_phone", "n_ip", "redacted", "has_pii"))
    assert(pii.filter(col("has_pii")).count() == 0)
    assert(pii.filter(col("redacted") =!= col("text")).count() == 0)
  }

  test("splitAssign and packBins append deterministic columns") {
    val d = graft.Tables(spark, sf, "documents")
    val s1 = d.splitAssign("doc_id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.keySet.subsetOf(Set("train", "val", "test")) && s1("train") > s1.getOrElse("val", 0L))
    val binned = d.withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .packBins("lang", "doc_id", "n_tok", 2048L)
    // within each (lang, bin), the weight BEFORE each row stays under cap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "bin").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bad = binned.withColumn("before", coalesce(sum("n_tok").over(w), lit(0L)))
      .filter(col("before") >= 2048L)
    assert(bad.count() == 0)
  }

  test("cosineTopK matches sim_cosine_topk") {
    val e = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val api = e.filter(col("vec_id") >= 8)
      .cosineTopK(e.filter(col("vec_id") < 8), "vec_id", "v", 5)
      .select(col("q_id"), col("rk"), col("id").as("vec_id"),
        round(col("sim"), 6).as("sim"))
    val ref = graft.ops.Similarity.queries("sim_cosine_topk")(spark, sf)
    assert(api.exceptAll(ref).count() == 0 && api.count() == ref.count())
  }

  test("stratifiedSample: exact quotas, deterministic, subset of input") {
    val o = graft.Tables(spark, sf, "orders")
    val s1 = o.stratifiedSample("o_orderstatus", "o_orderkey", 50)
    val s2 = o.stratifiedSample("o_orderstatus", "o_orderkey", 50)
    val counts = s1.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = o.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (k, n) => assert(counts(k) == math.min(50L, n)) }
    assert(s1.exceptAll(s2).count() == 0 && s1.count() == s2.count())
  }

  test("decontaminateAgainst matches text_decontaminate") {
    val d = graft.Tables(spark, sf, "documents")
    val api = d.filter(col("doc_id") % 100 =!= 7)
      .decontaminateAgainst(d.filter(col("doc_id") % 100 === 7),
        "doc_id", "text", k = 3, threshold = 0.5)
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("contamination"), 6).as("contamination"), col("flagged"))
    val ref = graft.ops.TextOps.queries("text_decontaminate")(spark, sf)
    assert(api.exceptAll(ref).count() == 0 && api.count() == ref.count())
  }

  test("quantizeI8: values bounded, reconstruction close") {
    val e = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .quantizeI8("v")
    assert(e.filter(exists(col("v_i8"), q => abs(q) > 127)).count() == 0)
    val err = e.select(aggregate(
      zip_with(col("v"), col("v_i8"),
        (a, b) => abs(a - b.cast("double") * col("v_scale"))),
      lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
      .agg(max(col("maxerr"))).head().getDouble(0)
    assert(err < 0.005) // half a quantization step at unit norm
  }

  test("textQuality and profileColumns run and are sane") {
    val d = graft.Tables(spark, sf, "documents")
    val tq = d.textQuality("text")
    assert(tq.filter(col("ttr") > 1.0 || col("ttr") <= 0.0).count() == 0)
    val prof = d.profileColumns("doc_id", "lang")
    assert(prof.count() == 2 &&
      prof.filter(col("column") === "doc_id").head().getAs[Long]("n_distinct") == d.count())
  }

  test("temporalJoin matches a per-row as-of lookup") {
    import spark.implicits._
    val dim = Seq(
      (1L, "v1", 10L, Some(20L)), (1L, "v2", 20L, None),
      (2L, "w1", 5L, Some(15L)))
      .toDF("k", "attr", "valid_from", "valid_to")
    val facts = Seq((1L, 9L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 99L),
      (2L, 5L), (2L, 15L)).toDF("k", "at")
    val got = facts.temporalJoin(dim, "k", "at")
      .select(col("k"), col("at"), col("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "v1"), (1L, 19L, "v1"), (1L, 20L, "v2"),
      (1L, 99L, "v2"), (2L, 5L, "w1")))
  }

  test("maxConcurrent matches a brute-force sweep") {
    import spark.implicits._
    // k=a: [0,10) [5,15) [9,12) -> 3 concurrent first at t=9
    // k=b: [0,5) [5,10) -> half-open endpoints never overlap -> 1 at t=0
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 9L, 12L),
      ("b", 0L, 5L), ("b", 5L, 10L)).toDF("k", "st", "en")
    val got = iv.maxConcurrent(col("k"), col("st"), col("en"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 3L, 9L), ("b", 1L, 0L)))
  }

  test("moreLikeThis agrees with the hybrid lexical arm") {
    val got = graft.Tables(spark, sf, "documents")
      .moreLikeThis("doc_id", "text", Seq(0L, 1L, 2L, 3L), 20)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rk"))).toSet
    val ref = graft.ops.TextOps.lexArm(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("lex_rk"))).toSet
    assert(got == ref, "generic more-like-this must reproduce the corpus arm")
  }

  test("resampleFfill + lagFeatures agree with the corpus queries") {
    val ev = graft.Tables(spark, sf, "events")
    val rs = ev.resampleFfill("user_id", "ts", "event_id", "value")
    val rsRef = graft.ops.TimeSeriesOps.queries("ts_resample_ffill")(spark, sf)
    assert(rs.exceptAll(rsRef).count() == 0 && rs.count() == rsRef.count())
    val lf = ev.lagFeatures("user_id", "ts", "event_id", "value")
    val lfRef = graft.ops.TimeSeriesOps.queries("ts_lag_features")(spark, sf)
    assert(lf.exceptAll(lfRef).count() == 0 && lf.count() == lfRef.count())
  }

  test("round-11 stat/corpus wrappers agree with the corpus queries") {
    val ev = graft.Tables(spark, sf, "events")
    val tsn = ev.theilSen("user_id", "ts", "event_id", "value")
    val tsnRef = graft.ops.TimeSeriesOps.queries("ts_theil_sen")(spark, sf)
    assert(tsn.exceptAll(tsnRef).count() == 0 && tsn.count() == tsnRef.count())
    val sm = ev.sequenceMatch(col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type"),
        col("event_id"), col("ts"), Seq("view", "click", "purchase"))
      .withColumnRenamed("key", "user_id")
    val smRef = graft.ops.StatOps.queries("rel_sequence_match")(spark, sf)
    assert(sm.exceptAll(smRef).count() == 0 && sm.count() == smRef.count())
    val docs = graft.Tables(spark, sf, "documents")
    val cs = docs.select(col("doc_id"), col("n_chars"))
      .curriculumShards("n_chars", "doc_id", 64L)
    val csRef = graft.ops.CorpusOps.queries("text_curriculum_shards")(spark, sf)
    assert(cs.exceptAll(csRef).count() == 0 && cs.count() == csRef.count())
    val md = graft.Tables(spark, sf, "orders")
      .modeBy(col("o_orderpriority"), col("o_orderstatus"))
    assert(md.count() == graft.Tables(spark, sf, "orders")
      .select("o_orderpriority").distinct().count())
  }

  test("round-14 wrappers agree with the corpus queries") {
    val ev = graft.Tables(spark, sf, "events")
    val docs = graft.Tables(spark, sf, "documents")
    val ords = graft.Tables(spark, sf, "orders")
    def agree(a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame): Unit =
      assert(a.exceptAll(b).count() == 0 && a.count() == b.count())
    agree(ev.markovTransitions(col("user_id"), col("ts"),
        col("event_id"), col("event_type"))
        .withColumnRenamed("grp", "from_state"),
      graft.ops.StatOps.queries("rel_markov_transitions")(spark, sf))
    agree(docs.mutualInfo(col("lang"), col("source"))
        .withColumnRenamed("a", "lang").withColumnRenamed("b", "source"),
      graft.ops.StatOps.queries("rel_mutual_info")(spark, sf))
    agree(docs.entropyBy(col("source"), col("lang"))
        .withColumnRenamed("grp", "source"),
      graft.ops.StatOps.queries("rel_entropy")(spark, sf))
    agree(ords.benford(col("o_totalprice")),
      graft.ops.StatOps.queries("rel_benford")(spark, sf))
    agree(ords.cramersV(col("o_orderpriority"), col("o_orderstatus")),
      graft.ops.StatOps.queries("rel_cramers_v")(spark, sf))
    agree(ords.giniConcentration(col("o_custkey"), col("o_totalprice")),
      graft.ops.StatOps.queries("rel_gini_concentration")(spark, sf))
    agree(ev.survivalKm(col("user_id"), col("ts"),
        pmod(col("user_id"), lit(2))),
      graft.ops.StatOps.queries("rel_survival_km")(spark, sf))
    agree(ev.desForecast("user_id", "ts", "event_id", "value"),
      graft.ops.TimeSeriesOps.queries("ts_des_forecast")(spark, sf))
    agree(ev.crossCorr("ts", col("event_type"), col("value"),
        "click", "purchase"),
      graft.ops.TimeSeriesOps.queries("ts_cross_corr")(spark, sf))
    agree(ev.dominantPeriod("event_type", "ts", "value"),
      graft.ops.TimeSeriesOps.queries("ts_dominant_period")(spark, sf))
    agree(graft.Tables(spark, sf, "lineitem")
        .withColumn("q", col("l_quantity").cast("long"))
        .welchTTest(col("l_returnflag"), col("l_linestatus"), "F", "O",
          col("q"))
        .withColumnRenamed("grp", "l_returnflag"),
      graft.ops.StatOps.queries("rel_welch_ttest")(spark, sf))
  }

  test("round-15 wrappers agree with the corpus queries") {
    val ev = graft.Tables(spark, sf, "events")
    val docs = graft.Tables(spark, sf, "documents")
    def agree(a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame): Unit =
      assert(a.exceptAll(b).count() == 0 && a.count() == b.count())
    agree(ev.decisionStump(col("value"), col("event_type") === "purchase"),
      graft.ops.StatOps.queries("rel_decision_stump")(spark, sf))
    agree(ev.srmCheck(col("event_type"), col("user_id"),
        substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .withColumnRenamed("grp", "event_type"),
      graft.ops.StatOps.queries("rel_ab_srm")(spark, sf))
    agree(docs.pmiCollocations(col("text")),
      graft.ops.CorpusOps.queries("text_pmi_collocations")(spark, sf))
    agree(docs.heapsLaw(col("doc_id"), col("text")),
      graft.ops.CorpusOps.queries("text_heaps_law")(spark, sf))
    agree(ev.forecastBacktest("user_id", "ts", "event_id", "value"),
      graft.ops.TimeSeriesOps.queries("ts_forecast_backtest")(spark, sf))
    agree(graft.ops.GeoOps.derivePoints(ev)
        .trackSimplify(col("user_id"), col("ts"), col("event_id"),
          col("lat"), col("lon"))
        .withColumnRenamed("k", "user_id"),
      graft.ops.GeoOps.queries("geo_track_simplify")(spark, sf))
  }

  test("round-16 wrappers agree with the corpus queries") {
    val ev = graft.Tables(spark, sf, "events")
    def agree(a: org.apache.spark.sql.DataFrame,
              b: org.apache.spark.sql.DataFrame): Unit =
      assert(a.exceptAll(b).count() == 0 && a.count() == b.count())
    agree(ev.cupedAdjust(col("event_type"), col("user_id"),
        substring(md5(col("user_id").cast("string").cast("binary")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"),
        col("ts"), col("value"))
        .withColumnRenamed("grp", "event_type"),
      graft.ops.StatOps.queries("rel_cuped")(spark, sf))
    agree(ev.holtWinters("user_id", "ts", "event_id", "value"),
      graft.ops.TimeSeriesOps.queries("ts_holt_winters")(spark, sf))
  }
}
