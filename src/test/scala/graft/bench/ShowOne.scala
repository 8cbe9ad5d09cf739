package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch runner: print a query's full result (dev only). */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).show(100, false)
    }
    spark.stop()
  }
}
