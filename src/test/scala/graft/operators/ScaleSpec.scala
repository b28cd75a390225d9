package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin returns the same result as the plain join") {
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val sup = graft.Engine.table(spark, TestSpark.sfDir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = li.join(sup, Seq("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Scale.saltedJoin(li, sup, "k", salt = 8).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("saltedJoin spreads a hot key across partitions") {
    import spark.implicits._
    val big = Seq.fill(1000)(1L).toDF("k")         // one pathological key
    val small = Seq((1L, "x")).toDF("k", "v")
    val parts = Scale.saltedJoin(big, small, "k", salt = 8)
      .withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    assert(parts > 1, "hot key should span multiple post-shuffle partitions")
  }

  test("partitioned layout prunes partitions at the scan") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val path = "/tmp/graft_test_stage/orders_by_year"
    Scale.writePartitioned(orders, path, "o_year")
    val pruned = spark.read.parquet(path).filter(col("o_year") === 1996)
    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"), plan)
    val years = pruned.select("o_year").distinct().collect().map(_.getInt(0)).toSeq
    assert(years == Seq(1996))
    assert(pruned.count() == orders.filter(col("o_year") === 1996).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.writeBucketed(orders, "t_bkt_orders", "o_orderkey")
    Scale.writeBucketed(li, "t_bkt_lineitem", "o_orderkey")
    val joined = spark.table("t_bkt_orders")
      .join(spark.table("t_bkt_lineitem"), "o_orderkey")
    // disable broadcast so the co-located path is what gets planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
