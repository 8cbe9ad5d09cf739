package graft.bench

import org.apache.spark.sql.SparkSession

/** Scale rehearsal: run the heaviest queries at sf0.1 and the synthesized
  * sf1 (tools/gen_sf1.py), record min-of-3 per dir (all passes kept in the
  * artifact) plus the scale ratio, write BENCH_SF1.json. A query "holds"
  * if sf1 <= ~10x its sf0.1 time (10x data); super-linear blowups are
  * scale bugs to fix or explain. */
object BenchSf1 {
  private val QUERIES = Seq(
    "stream_geo_proximity", "stream_session_window", "stream_lsh_neardup",
    "stream_stream_join", "stream_running_counts", "stream_watermark_dedup",
    "stream_hourly_window", "dedup_containment", "dedup_clusters",
    "sim_knn_components", "rel_equidepth_hist", "text_lm_score",
    "text_lang_id_ngram", "cot_pipeline_corpus",
    "dedup_substring_spans", "rel_fuzzy_match_ed1", "sim_covariance",
    "text_inverted_index", "text_chunk_overlap", "graph_bfs_layers",
    // round-5 late additions: lakehouse runtime pruning, sketch algebra,
    // index lifecycle, outer-join state, write-time-CDF refresh
    "dedup_source_overlap", "src_dpp_join", "sim_ann_index_serve",
    "sim_ann_refresh", "stream_outer_join", "stream_bloom_dedup",
    "src_ivm_apply", "rel_kmv_setops",
    // round-5 final additions: streaming txn sink, partition-layout
    // evolution write, CDC subscription stream, plus the two remaining
    // >1s-at-sf0.1 queries the set never covered
    "stream_txn_sink", "src_partition_evolution", "stream_change_feed",
    "graph_triangles", "dedup_simhash_pairs")
  private val PASSES = 3

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(name: String, dir: String): Double = {
      graft.ops.Staging.clear(spark)
      val t0 = System.nanoTime()
      try { graft.SparkEntry.queries(name)(spark, dir).count() }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[sf1] $name @ $dir failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val dirs = Seq("/root/testdata/sf0.1", "/tmp/testdata_sf1")
    // warmup pass over BOTH dirs (session costs: codegen, parquet footers)
    dirs.foreach(d => QUERIES.foreach(run(_, d)))
    def minOk(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0); if (ok.isEmpty) -1.0 else ok.min
    }
    val measured = QUERIES.map { q =>
      val p01 = (1 to PASSES).map(_ => run(q, dirs(0)))
      val p1 = (1 to PASSES).map(_ => run(q, dirs(1)))
      val (s01, s1) = (minOk(p01), minOk(p1))
      val ratio = if (s01 > 0 && s1 > 0) s1 / s01 else -1.0
      println(f"SF1 $q%-24s sf0.1=$s01%7.2f s  sf1=$s1%7.2f s  ratio=$ratio%6.2f")
      val json = f""""$q":{"sf01_sec":$s01%.2f,"sf1_sec":$s1%.2f,"ratio":$ratio%.2f,""" +
        s""""sf01_passes":${p01.map(t => f"$t%.2f").mkString("[", ",", "]")},""" +
        s""""sf1_passes":${p1.map(t => f"$t%.2f").mkString("[", ",", "]")}}"""
      (q, ratio, json)
    }
    val rows = measured.map(_._3)
    val (worstQ, worstR, _) = measured.maxBy(_._2)
    val notes =
      if (measured.exists(_._2 < 0)) "FAILURES present; see -1 ratios"
      else f"all ${measured.size} ratios <= $worstR%.1fx at 10x data; worst = $worstQ"
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "unavailable" }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_SF1.json"),
      rows.mkString(
        s"""{"metric":"scale_rehearsal","stat":"min_of_$PASSES","sf1_dir":"${dirs(1)}","generator":"tools/gen_sf1.py","load":"${loadavg()}","notes":"$notes","queries":{""",
        ",", "}}"))
    spark.stop()
  }
}
