package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics edges of the event-analytics operators that the oracle gate
  * (which only sees the curated events table) can't isolate: the gap
  * boundary contract of sessionize and the step ORDER contract of the
  * funnel.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("q_dedup_window: decimal-ord min_by equals the struct-ordering reference (round 16)") {
    val fused = graft.Registry.all("q_dedup_window").fn(spark, TestSpark.sfDir)
    val ref = EventAnalytics.dedupWindowIslands(
        graft.Engine.table(spark, TestSpark.sfDir, "events"))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id")))
        .as("kept_event_id"),
        min(col("ts")).as("kept_ts"),
        (count(lit(1)) - 1).as("n_suppressed"))
      .select(col("user_id"), col("event_type"), col("kept_event_id"),
        col("kept_ts"), col("n_suppressed"))
    assert(fused.except(ref).isEmpty && ref.except(fused).isEmpty)
    assert(fused.count() > 0)
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"decimal-ord min_by regressed to a sort/object aggregate:\n$plan")
    val refPlan = ref.queryExecution.executedPlan.toString
    assert(refPlan.contains("ObjectHashAggregate") || refPlan.contains("SortAggregate"))
  }

  test("sessionize: a gap of exactly gapUs stays in-session; one more µs splits") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:30:00"), 2L), // exactly 30 min after -> same
      (1L, ts("2024-01-01 01:00:00.000001"), 3L), // 30 min + 1 µs -> new
      (2L, ts("2024-01-01 00:00:00"), 4L) // other key unaffected
    ).toDF("user_id", "t", "event_id")
    val got = EventAnalytics.sessionize(df, "user_id", "t", "event_id")
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionize: ordinal ids restart per key and count every break") {
    val df = Seq(
      (9L, ts("2024-01-01 00:00:00"), 1L),
      (9L, ts("2024-01-01 02:00:00"), 2L),
      (9L, ts("2024-01-01 04:00:00"), 3L)
    ).toDF("user_id", "t", "event_id")
    val ids = EventAnalytics.sessionize(df, "user_id", "t", "event_id")
      .orderBy($"event_id").select($"session_id").as[Long].collect().toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("funnel: a click BEFORE the first view does not advance the stage") {
    // user 1: click precedes every view -> stage stays 1; user 2 converts
    // fully in order; purchase-before-click (user 2's early purchase at
    // 00:01) must not count either.
    val df = Seq(
      (1L, "click", ts("2024-01-01 00:00:00"), 1L),
      (1L, "view", ts("2024-01-01 01:00:00"), 2L),
      (2L, "view", ts("2024-01-01 00:00:00"), 3L),
      (2L, "purchase", ts("2024-01-01 00:01:00"), 4L),
      (2L, "click", ts("2024-01-01 00:02:00"), 5L),
      (2L, "purchase", ts("2024-01-01 00:03:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    // the PRODUCTION composition, not a copy that could drift
    val stages = EventAnalytics.funnel(df)
      .select($"user_id", $"stage", $"t_purchase")
      .as[(Long, Int, Option[Timestamp])].collect()
      .map { case (k, v2, v3) => k -> ((v2, v3)) }.toMap
    assert(stages(1L)._1 === 1)
    assert(stages(2L)._1 === 3)
    // and the counted purchase is the one AFTER the click, not the early one
    assert(stages(2L)._2 === Some(ts("2024-01-01 00:03:00")))
  }

  test("mergeIntervals: touching intervals coalesce; a later short interval " +
      "inside an earlier long one does not split the island") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val df = Seq(
      // key 1: [01,10] then [05,07] (nested) then [10,12] (touching) -> one island
      (1L, d("2024-01-01"), d("2024-01-10"), 1L),
      (1L, d("2024-01-05"), d("2024-01-07"), 2L),
      (1L, d("2024-01-10"), d("2024-01-12"), 3L),
      // then a gap -> island 2
      (1L, d("2024-01-20"), d("2024-01-21"), 4L),
      // key 2 independent
      (2L, d("2024-01-01"), d("2024-01-02"), 5L)
    ).toDF("k", "s", "e", "id")
    val got = EventAnalytics.mergeIntervals(df, "k", "s", "e", "id")
      .select($"id", $"island_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("scd2: A->B->A yields three versions with a half-open valid_to chain") {
    val df = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "A", ts("2024-01-04 00:00:00"), 4L)
    ).toDF("k", "attr", "t", "id")
    val rows = EventAnalytics.scd2(df, "k", "attr", "t", "id")
      .orderBy($"version")
      .select($"version", $"attr", $"valid_from", $"valid_to", $"is_current", $"n_events")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._6)) === Seq((1L, "A", 2L), (2L, "B", 1L), (3L, "A", 1L)))
    // valid_to of version n == valid_from of version n+1; only the last is current
    assert(rows.init.zip(rows.tail).forall { case (a, b) => a._4 === Some(b._3) })
    assert(rows.map(_._5) === Seq(false, false, true))
  }

  test("cohort query: offset-0 head equals each cohort's signup population") {
    // every signup user has an event in their signup week (the signup
    // itself), so week_offset 0 rows must count the full cohort
    val out = EventAnalytics.queries("q_cohort")
      .fn(spark, TestSpark.sfDir)
      .filter($"week_offset" === 0L)
      .agg(sum($"n_active")).as[Long].head()
    val cohortTotal = graft.Engine.table(spark, TestSpark.sfDir, "events")
      .filter($"event_type" === "signup")
      .select($"user_id").distinct().count()
    assert(out === cohortTotal)
  }

  test("event transitions: counts conserve (rows - users) and ppm rows " +
      "sum to 1e6 within floor loss per from_type") {
    val events = graft.Engine.table(spark, TestSpark.sfDir, "events")
    val out = EventAnalytics.queries("q_event_transitions")
      .fn(spark, TestSpark.sfDir).collect()
    // each user contributes (n_events - 1) transitions
    val expected = events.count() - events.select($"user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n")).sum === expected)
    // per from_type, integer-division ppm sums land in (1e6 - fanout, 1e6]
    out.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rows) =>
      val s = rows.map(_.getAs[Long]("p_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$ft ppm sum $s outside floor-loss band")
    }
  }

  test("dau window: one row per observed day; a window-end's count is at " +
      "least that single day's distinct actives") {
    val events = graft.Engine.table(spark, TestSpark.sfDir, "events")
    val daily = events.select(to_date($"ts").as("d"), $"user_id").distinct()
      .groupBy($"d").agg(countDistinct($"user_id").as("n1"))
    val out = EventAnalytics.queries("q_dau_window").fn(spark, TestSpark.sfDir)
    assert(out.count() === daily.count(), "one window per observed day-end")
    val violations = out.join(daily, out("win_end") === daily("d"))
      .filter($"active_7d" < $"n1").count()
    assert(violations === 0L, "7-day active count must dominate the 1-day count")
  }

  test("latency dist: percentiles are ordered, non-negative, and bounded " +
      "by the converted-user count") {
    val row = EventAnalytics.queries("q_latency_dist")
      .fn(spark, TestSpark.sfDir).head()
    val (n, p50, p90) = (row.getAs[Long]("n_converted"),
      row.getAs[Long]("p50_us"), row.getAs[Long]("p90_us"))
    assert(n > 0L)
    assert(p50 >= 0L && p50 <= p90, s"p50=$p50 p90=$p90")
    val signups = graft.Engine.table(spark, TestSpark.sfDir, "events")
      .filter($"event_type" === "signup").select($"user_id").distinct().count()
    assert(n <= signups, "conversions cannot exceed signup users")
  }

  test("abtest lift: a zero-conversion control arm yields NULL lift, not an error") {
    // strip every purchase so conv_a = conv_b = 0: the guarded ratio must
    // emit NULL (DuckDB's // would raise on the zero divisor; the oracle
    // carries the same CASE guard so both engines agree)
    val dir = "/tmp/graft_test/abtest_zero"
    graft.util.Fs.deleteRecursively(dir)
    graft.Engine.table(spark, TestSpark.sfDir, "events")
      .filter($"event_type" =!= "purchase")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = EventAnalytics.queries("q_abtest_lift").fn(spark, dir).head()
    assert(row.getAs[Long]("conv_a") === 0L)
    assert(row.isNullAt(row.fieldIndex("lift_ppm")),
      "lift over a zero-conversion arm must be NULL")
    assert(row.getAs[Long]("cvr_a_ppm") === 0L,
      "cvr of a populated arm with zero conversions is exactly 0")
  }

  test("user growth: running total is monotone and lands on the distinct-user count") {
    val rows = EventAnalytics.queries("q_user_growth")
      .fn(spark, TestSpark.sfDir)
      .select($"n_new", $"cum_users").as[(Long, Long)].collect()
    val cums = rows.map(_._2)
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b },
      "cumulative curve must strictly increase (each day adds n_new >= 1)")
    assert(rows.map(_._1).sum === cums.last, "sum of news must equal the final total")
    val totalUsers = graft.Engine.table(spark, TestSpark.sfDir, "events")
      .select($"user_id").distinct().count()
    assert(cums.last === totalUsers)
  }
}
