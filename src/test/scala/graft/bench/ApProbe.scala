package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split rel_approx_percentile's cost — sketch aggregate vs the
  * exact groupedQuantiles substrate — so optimization lands on the right
  * half. */
object ApProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Unit): Unit = (0 to 2).foreach { i =>
      val t0 = System.nanoTime()
      body
      println(f"[approbe] $tag run=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val li = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    time("scan_only") {
      li.write.format("noop").mode("overwrite").save()
    }
    time("sketch_array") {
      li.groupBy(col("l_returnflag"))
        .agg(approx_percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(10000)).as("ap"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sketch_two") {
      li.groupBy(col("l_returnflag"))
        .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"),
          approx_percentile(col("l_extendedprice"), lit(0.99), lit(10000)).as("b"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_grouped") {
      graft.ops.Relational2.groupedQuantiles(li,
        "l_returnflag", "l_extendedprice", Seq(("p50", 0.5), ("p99", 0.99)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
