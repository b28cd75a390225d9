package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** VERDICT r10 #2 measurement: the round-11 bucketed negative-sampling
  * draw vs the retired users×catalog crossJoin + left-anti + per-user
  * window form, at replica scale with the catalog GROWN per replica
  * (the round-11 ScaleUp variant). Run with SPARK_GRAFT_SF_DIR set:
  * prints both times; results must row-count-match (StatsSpec pins full
  * value identity at sf0.001).
  */
object NegSamplingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(n: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = n
      println(f"[negbench] $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$r")
    }
    time("bucketed (shipped)") {
      Registry.all("q_negative_sampling").fn(spark, sfDir).count()
    }
    time("crossJoin (retired)") {
      val ev = Engine.table(spark, sfDir, "events").select(col("user_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("item"))
        .filter(col("item").isNotNull)
      val it = ev.select(col("item")).distinct()
      val u = ev.select(col("user_id")).distinct()
      val seen = ev.select(col("user_id"), col("item")).distinct()
      val cand = u.crossJoin(broadcast(it))
        .join(seen, Seq("user_id", "item"), "left_anti")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(md5(concat(col("user_id").cast(StringType), lit(":"),
          col("item").cast(StringType)).cast(BinaryType)), col("item"))
      cand.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 2)
        .select(col("user_id"), col("item").as("neg_item"), col("rk"))
        .count()
    }
    spark.stop()
  }
}
