package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split the quality-gate training run into its two phases —
  * feature-frame materialization vs the GD step loop — so optimization
  * effort lands on the right one. */
object QtrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.balanced(spark, sfDir, "documents", "doc_id")
    val t = graft.ops.Tokens.toks(col("text"))
    val nTok = size(t).cast("long")
    val stopwords = Seq("the", "a", "of", "to", "and")
    val ttr = size(array_distinct(t)).cast("double") / nTok.cast("double")
    val stopRatio = size(filter(t, w => w.isin(stopwords.map(lit): _*)))
      .cast("double") / nTok.cast("double")
    val label = (ttr * 0.5 + least(lit(1.0), nTok.cast("double") / 100.0) * 0.3 +
      (lit(1.0) - stopRatio) * 0.2) >= 0.6
    (0 until 3).foreach { rep =>
      var featSec = 0.0
      val t0 = System.nanoTime()
      val curve = graft.ops.TrainOps.ridgeTrain(docs, "doc_id", "text", label,
        stage = { df =>
          val f0 = System.nanoTime()
          val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          p.count()
          featSec = (System.nanoTime() - f0) / 1e9
          p
        })
      val n = curve.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"[qtrain] rep=$rep rows=$n total=$total%.2f feats=$featSec%.2f " +
        f"steps=${total - featSec}%.2f")
    }
    spark.stop()
  }
}
