package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object RankDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.Tables(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = graft.ops.Relational2.globalRank(df,
      col("o_totalprice"), col("o_orderkey"))
    val n = ranked.count()
    val distinct = ranked.select("__rank").distinct().count()
    val mx = ranked.agg(max("__rank"), min("__rank")).collect()(0)
    println(s"rows=$n distinctRanks=$distinct min=${mx.get(1)} max=${mx.get(0)}")
    // compare against the window row_number on a sample
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    val truth = df.withColumn("rn", row_number().over(w).cast("long"))
    val joined = ranked.join(truth, Seq("o_orderkey"))
      .filter(col("__rank") =!= col("rn"))
    println(s"mismatched ranks: ${joined.count()}")
    joined.orderBy("rn").show(10)
    spark.stop()
  }
}
