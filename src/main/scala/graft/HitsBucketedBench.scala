package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** VERDICT r10 #4 experiment: does riding a bucketed-on-orderkey layout
  * make q_hits's dominant cost — the distinct (custkey, suppkey)
  * projection of the orders⋈lineitem join — cheaper at replica scale?
  *
  * Three timings over `SPARK_GRAFT_SF_DIR`:
  *   A. the shipped q_hits plan end-to-end (shuffle join + distinct);
  *   B. bucketed-table BUILD alone (both sides bucketBy(8, o_orderkey));
  *   C. the JOIN-ONLY phase reusing the already-built tables (the cost
  *      when the artifact is amortized across queries, the
  *      writePairGraph pattern). A COLD consumer pays B + C.
  *
  * Decision rule (CLAUDE.md): accept the bucketed plan only if B + C
  * beats A at 100× (cold) or C beats A decisively (amortized);
  * otherwise record the negative in-code at the q_hits site. Round-11
  * measurement: A 43.7 s min-of-2, B 9.1 s, C 39.6 s — cold loses
  * outright and even amortized C sits inside A's run spread, so the
  * negative is recorded.
  */
object HitsBucketedBench {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[hitsbkt] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def rounds(e: DataFrame): Long = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def normalize(scores: DataFrame, key: String, v: String): DataFrame = {
      val tot = scores.agg(sum(col(v)).cast(dec).as("t"))
      scores.crossJoin(broadcast(tot))
        .select(col(key),
          expr(s"cast((cast($v as decimal(38,0)) * 1000000000) div t" +
            " as bigint)").as(s"${v}n"))
    }
    val a1 = e.groupBy(col("s")).agg(count(lit(1)).as("a"))
    val a1n = normalize(a1, "s", "a")
    val h1 = e.join(a1n, "s").groupBy(col("c")).agg(sum(col("an")).as("h"))
    val h1n = normalize(h1, "c", "h")
    val a2 = e.join(h1n, "c").groupBy(col("s")).agg(sum(col("hn")).as("a"))
    normalize(a2, "s", "a")
      .select(col("s").as("s_suppkey"), col("an").as("auth_ppb"))
      .orderBy(col("auth_ppb").desc, col("s_suppkey")).limit(15).count()
  }

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

    // A: shipped plan
    time("A shipped q_hits") {
      val e = Engine.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey").as("s"))
        .distinct()
        .join(Engine.table(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("c")), "o_orderkey")
        .select(col("c"), col("s")).distinct()
      rounds(e)
    }

    // B: bucketed build of both join sides on the join key
    time("B bucketed build") {
      operators.Scale.writeBucketed(
        Engine.table(spark, sfDir, "lineitem")
          .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey").as("s"))
          .distinct(),
        "g_hits_li", "o_orderkey")
      operators.Scale.writeBucketed(
        Engine.table(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey").as("c")),
        "g_hits_ord", "o_orderkey")
    }

    // C: the bucketed variant, join phase only (artifact amortized)
    time("C bucketed join+rounds (artifact amortized)") {
      val e = spark.table("g_hits_li").join(spark.table("g_hits_ord"), "o_orderkey")
        .select(col("c"), col("s")).distinct()
      rounds(e)
    }
    spark.stop()
  }
}
