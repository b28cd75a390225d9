package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q_negative_sampling_user stage costs (round-12 100× triage). */
object NegUserDiag {
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
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[negdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val e = Engine.table(spark, sfDir, "events")
    t("full draw cold-first")(
      operators.EventAnalytics.negativeSamplingUser(e).count())
    t("full draw again")(
      operators.EventAnalytics.negativeSamplingUser(e).count())
    val ev = e.select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
    t("json parse count")(ev.count())
    t("distinct count (no persist)")(ev.distinct().count())
    spark.stop()
  }
}
