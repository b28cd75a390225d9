package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavior specs for the SQL-surface cleaning operators whose clamp
  * arithmetic the oracle gate exercises only at corpus scale.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("olsFit: exact fit on collinear points; hand-checked fit on a known set (round 7)") {
    import spark.implicits._
    // key 1: y = 2x exactly -> slope 2, intercept 0 (exact in IEEE)
    // key 2: points (1,1),(2,3),(3,4) -> slope 1.5, intercept -1/3
    val df = Seq(
      (1L, 1L, 2L), (1L, 2L, 4L), (1L, 3L, 6L),
      (2L, 1L, 1L), (2L, 2L, 3L), (2L, 3L, 4L)
    ).toDF("k", "x", "y")
    val got = Aggregates.olsFit(df, "k")
      .select($"k", $"slope", $"intercept")
      .as[(Long, Double, Double)].collect()
      .map { case (k, s, i) => k -> ((s, i)) }.toMap
    assert(got(1L) === ((2.0, 0.0)))
    val (s2, i2) = got(2L)
    assert(s2 === 1.5)
    // intercept = (sy - slope*sx)/n = (8 - 1.5*6)/3 = -1/3 in IEEE
    assert(i2 === (8.0 - 1.5 * 6.0) / 3.0)
  }

  test("q_winsorize: hand-computed p05/p95 clamp on 1..100 (round 7)") {
    import spark.implicits._
    // key A: values 1..100 → ANSI discrete p05 = 5 (smallest value whose
    // cume_dist reaches 0.05), p95 = 95. Clamp sends 1..4 up to 5
    // (n_lo = 4) and 96..100 down to 95 (n_hi = 5);
    // sum = 4*5 + (5+...+95) + 5*95 = 20 + 4550 + 475 = 5045.
    // key B: a single row is its own p05 and p95 — nothing clamps.
    val df = ((1 to 100).map(v => ("A", v.toDouble)) :+ (("B", 42.0)))
      .toDF("k", "v")
    val got = SqlSurface.winsorize(df, "k", "v")
      .select("k", "n_lo", "n_hi", "n", "sum_wins", "min_wins", "max_wins")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got("A") == ((4L, 5L, 100L, 5045.0, 5.0, 95.0)))
    assert(got("B") == ((0L, 0L, 1L, 42.0, 42.0, 42.0)))
  }

  test("q_mad_outliers: hand-computed median/MAD and the 3-MAD fence (round 7)") {
    import spark.implicits._
    // values 1..9 plus one wild 1000: med = 5 (ANSI discrete p50 of 10
    // values = 5th element), adevs sorted 0,1,1,2,2,3,3,4,4,995 → mad =
    // 2; fence 3·2 = 6 catches only the 1000 (adev 995).
    val df = ((1 to 9).map(v => ("X", v.toDouble)) :+ (("X", 1000.0)))
      .toDF("k", "v")
    val r = SqlSurface.madOutliers(df, "k", "v")
      .select("med", "mad", "n", "n_outliers")
      .as[(Double, Double, Long, Long)].head()
    assert(r == ((5.0, 2.0, 10L, 1L)))
  }

  test("q_winsorize: clamped output is always an element of the input (no interpolation)") {
    import spark.implicits._
    // 7 irregular values: discrete percentiles must select existing
    // doubles bit-for-bit, so min/max after clamping are members of the
    // input set — the property that makes the gate hash-safe on raw
    // doubles.
    val vals = Seq(3.25, -1.5, 99.875, 0.125, 17.0, 17.0, 42.0625)
    val df = vals.map(("X", _)).toDF("k", "v")
    val r = SqlSurface.winsorize(df, "k", "v")
      .select("min_wins", "max_wins").as[(Double, Double)].head()
    assert(vals.contains(r._1) && vals.contains(r._2))
    assert(r._1 <= r._2)
  }
}
