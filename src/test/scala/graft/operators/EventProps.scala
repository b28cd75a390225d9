package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the gaps-and-islands kernels
  * ([[EventAnalytics.sessionize]] / [[EventAnalytics.mergeIntervals]]):
  * the window formulations must agree with a straightforward sequential
  * reference on ARBITRARY inputs — random keys, colliding timestamps,
  * any partition split — not just the curated example specs. Collisions
  * matter most: both kernels tie-break on an id column, and a drift
  * there would be invisible on distinct-timestamp data.
  */
object EventProps extends Properties("EventAnalytics") {

  private lazy val spark = TestSpark.spark

  private val gapUs = 1000000L // 1s session gap for compact test data

  // events on a handful of keys, timestamps coarse enough to collide
  private val genEvents: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1L, 3L)
      us <- Gen.chooseNum(0L, 20L).map(_ * 500000L) // 0.5s grid, 0..10s
    } yield (key, us))

  /** Sequential reference: per key, sort by (ts, id), increment the
    * session ordinal whenever the gap exceeds gapUs.
    */
  private def refSessions(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { case (_, us, id) =>
        if (prev == Long.MinValue || us - prev > gapUs) sid += 1
        prev = us
        id -> sid
      }
    }

  property("sessionize matches the sequential reference on any events, any split") =
    Prop.forAll(genEvents, Gen.chooseNum(1, 5)) { (evs, parts) =>
      val withIds = evs.zipWithIndex.map { case ((k, us), i) =>
        (k, us, i.toLong)
      }
      val rows = withIds.map { case (k, us, id) =>
        Row(k, new Timestamp(us / 1000), id)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts),
        StructType(Seq(StructField("k", LongType, nullable = false),
          StructField("t", TimestampType, nullable = false),
          StructField("id", LongType, nullable = false))))
      val got = EventAnalytics.sessionize(df, "k", "t", "id", gapUs)
        .select(col("id"), col("session_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == refSessions(withIds)
    }

  // intervals on a small grid so containment/touching/overlap all occur
  private val genIntervals: Gen[List[(Long, Long, Long)]] =
    Gen.nonEmptyListOf(for {
      key <- Gen.chooseNum(1L, 2L)
      start <- Gen.chooseNum(0L, 30L)
      len <- Gen.chooseNum(0L, 10L)
    } yield (key, start, start + len))

  /** Sequential reference: per key, sweep intervals by (start, end),
    * extending the current island while start <= running max end.
    */
  private def refIslands(ivs: Seq[(Long, Long, Long)]): Map[Long, Long] =
    ivs.groupBy(_._1).map { case (k, group) =>
      val sorted = group.map { case (_, s, e) => (s, e) }.sorted
      var islands = 0L
      var maxEnd = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (maxEnd == Long.MinValue || s > maxEnd) islands += 1
        maxEnd = math.max(maxEnd, e)
      }
      k -> islands
    }

  property("mergeIntervals island count matches the sweep reference on any intervals") =
    Prop.forAll(genIntervals, Gen.chooseNum(1, 5)) { (ivs, parts) =>
      val rows = ivs.zipWithIndex.map { case ((k, s, e), i) =>
        Row(k, s, e, i.toLong)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts),
        StructType(Seq(StructField("k", LongType, nullable = false),
          StructField("s", LongType, nullable = false),
          StructField("e", LongType, nullable = false),
          StructField("id", LongType, nullable = false))))
      val got = EventAnalytics.mergeIntervals(df, "k", "s", "e", "id")
        .groupBy(col("k")).agg(max(col("island_id")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == refIslands(ivs)
    }
}
