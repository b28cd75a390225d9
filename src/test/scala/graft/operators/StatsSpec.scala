package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Engine, Registry, TestSpark}

/** Brute-force recomputation of the event-statistics operators on
  * sf0.001: each test collects the tiny table and re-derives the
  * statistic with naive Scala (BigInt where the engine lifts to
  * decimal), so the cell/window algebra in the graded plans is checked
  * against the textbook definition — independently of the DuckDB oracle,
  * which runs the SAME closed form and so can't catch an algebra error
  * made identically on both sides.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def run(name: String) = Registry.all(name).fn(spark, dir)

  private lazy val evRows: Seq[(String, Long, Long, Long)] =
    Engine.table(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  private lazy val evCents: Seq[(String, Long)] =
    Engine.table(spark, dir, "events")
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  /** 2×average-rank of each value in the combined multiset: for the tie
    * group of v occupying 1-based positions [lo, hi], 2×avg = lo + hi.
    */
  private def rank2(all: Seq[Long]): Map[Long, Long] = {
    val sorted = all.sorted
    sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2 + 1L).min + xs.map(_._2 + 1L).max)
    }
  }

  test("q_mann_whitney equals the brute-force rank-sum U×2 per type") {
    val got = run("q_mann_whitney").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val base = evCents.filter(_._1 == "view").map(_._2)
    val types = evCents.map(_._1).distinct.filter(_ != "view")
    assert(got.keySet === types.toSet)
    types.foreach { t =>
      val a = evCents.filter(_._1 == t).map(_._2)
      val r2 = rank2(a ++ base)
      val r2a = a.map(r2).sum
      val u2a = r2a - a.size.toLong * (a.size + 1)
      val u2b = 2L * a.size * base.size - u2a
      assert(got(t) === ((a.size.toLong, base.size.toLong, u2a, u2b)), s"type $t")
      // U_a + U_b = n_a·n_b (doubled): the rank-sum identity
      assert(u2a + u2b === 2L * a.size * base.size)
    }
  }

  test("q_benford: digits from cents strings, shares conserved, CASE matches log10") {
    val rows = run("q_benford").collect()
    val exp = evCents.filter(_._2 > 0)
      .groupBy(_._2.toString.head.asDigit).view.mapValues(_.size.toLong).toMap
    val total = exp.values.sum
    assert(rows.map(r => r.getInt(0) -> r.getLong(1)).toMap === exp)
    rows.foreach { r =>
      val (d, n, share, bppm, dev) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(share === n * 1000000L / total)
      assert(bppm === math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
      assert(dev === math.abs(share - bppm))
    }
  }

  test("q_cusum_shift equals the brute-force max-|CUSUM| day per type") {
    val daily = evRows.groupBy(r => (r._1, r._4 / 86400000000L))
      .view.mapValues(_.size.toLong).toMap
    val got = run("q_cusum_shift").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    daily.keys.map(_._1).toSeq.distinct.foreach { t =>
      val days = daily.collect { case ((`t`, d), n) => (d, n) }.toSeq.sortBy(_._1)
      val nd = days.size.toLong
      val tot = days.map(_._2).sum
      var cum = 0L
      val s = days.zipWithIndex.map { case ((_, n), i) =>
        cum += n; math.abs(nd * cum - (i + 1) * tot)
      }
      assert(got(t) === ((s.max, nd, tot)), s"type $t")
    }
  }

  test("q_burstiness equals brute-force BigInt moments of per-user second gaps") {
    val gaps = evRows.groupBy(r => (r._2, r._1)).toSeq.flatMap { case ((_, t), rs) =>
      val o = rs.sortBy(r => (r._4, r._3)).map(_._4)
      o.zip(o.tail).map { case (a, b) => t -> (b - a) / 1000000L }
    }
    val got = run("q_burstiness").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    gaps.map(_._1).distinct.foreach { t =>
      val g = gaps.filter(_._1 == t).map(_._2).map(BigInt(_))
      val (n, sg, sg2) = (BigInt(g.size), g.sum, g.map(x => x * x).sum)
      val mean = if (n == 0) BigInt(0) else sg / n
      val cv2 = if (sg == 0) BigInt(0) else (n * sg2 - sg * sg) * 1000000 / (sg * sg)
      assert(got(t) === ((n.toLong, mean.toLong, cv2.toLong)), s"type $t")
    }
  }

  test("q_attribution: first/last are one per converting-touched user; credit conserved") {
    val purch = evRows.filter(_._1 == "purchase").groupBy(_._2)
      .view.mapValues(_.map(_._4).min).toMap
    val touches = evRows.filter(r => (r._1 == "click" || r._1 == "view")
      && purch.get(r._2).exists(r._4 < _))
    val byUser = touches.groupBy(_._2)
    val got = run("q_attribution").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val nUsers = byUser.size.toLong
    assert(got.values.map(_._2).sum === nUsers, "one first-touch per user")
    assert(got.values.map(_._3).sum === nUsers, "one last-touch per user")
    // linear credit conserved per user up to the documented floor: each
    // user contributes n·⌊1e6/n⌋ ∈ (1e6 − n, 1e6]
    val credit = got.values.map(_._4).sum
    val lost = byUser.values.map(rs => 1000000L - rs.size * (1000000L / rs.size)).sum
    assert(credit === 1000000L * nUsers - lost)
    // brute-force first/last channel counts
    val first = byUser.values.toSeq
      .map(rs => rs.minBy(r => (r._4, r._3))._1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val last = byUser.values.toSeq
      .map(rs => rs.maxBy(r => (r._4, r._3))._1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (t, (_, f, l, _)) =>
      assert(f === first.getOrElse(t, 0L) && l === last.getOrElse(t, 0L), s"type $t")
    }
  }

  /** (user_id, event_id, us, cents) ordered per user by (ts, event_id) —
    * the per-user series the TWA/EWMA brute forces replay.
    */
  private lazy val seriesByUser: Map[Long, Seq[(Long, Long, Long)]] =
    Engine.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.map(t => (t._2, t._3, t._4)).sortBy(t => (t._2, t._1)))
      .toMap

  test("q_abtest_cuped equals the brute-force staged BigInt CUPED adjustment " +
      "and reduces to the raw mean at theta=0") {
    val got = run("q_abtest_cuped").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): Long =
      Integer.parseInt(md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(1), 16) % 2
    val cents = Engine.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val days = cents.map(_._2 / 86400000000L)
    val mid = (days.min + days.max + 1) / 2
    val perUser = cents.groupBy(_._1).view.mapValues { es =>
      (es.filter(_._2 / 86400000000L < mid).map(_._3).sum,
        es.filter(_._2 / 86400000000L >= mid).map(_._3).sum)
    }.toMap
    val n = BigInt(perUser.size)
    val sx = BigInt(perUser.values.map(_._1).sum)
    val sy = BigInt(perUser.values.map(_._2).sum)
    val sxy = perUser.values.map(v => BigInt(v._1) * v._2).sum
    val sxx = perUser.values.map(v => BigInt(v._1) * v._1).sum
    val varp = n * sxx - sx * sx
    val theta = if (varp > 0) (n * sxy - sx * sy) * 1000000 / varp else BigInt(0)
    Seq(0L, 1L).foreach { a =>
      val us = perUser.filter(kv => arm(kv._1) == a).values.toSeq
      val nA = BigInt(us.size)
      val adj = us.map { case (x, y) =>
        BigInt(y) * n * 1000000 - theta * (BigInt(x) * n - sx) }.sum
      assert(got(a) === ((us.size.toLong, us.map(_._1).sum, us.map(_._2).sum,
        theta.toLong, (BigInt(us.map(_._2).sum) * 1000000 / nA).toLong,
        (adj / (nA * n)).toLong)), s"arm $a")
    }
    // theta = 0 would reduce mean_adj to mean_post exactly (the guard's
    // degenerate branch): verified algebraically on the same integers
    Seq(0L, 1L).foreach { a =>
      val us = perUser.filter(kv => arm(kv._1) == a).values.toSeq
      val nA = BigInt(us.size)
      val adj0 = us.map { case (_, y) => BigInt(y) * n * 1000000 }.sum
      assert(adj0 / (nA * n) === BigInt(us.map(_._2).sum) * 1000000 / nA)
    }
  }

  test("q_dq_checks detects injected violations of every check (dirty-frame drive)") {
    import spark.implicits._
    // dirty fixtures: one violation of each class, plus clean rows
    val cust = Seq((1L, "alice"), (2L, null.asInstanceOf[String]))
      .toDF("c_custkey", "c_name")
    val ord = Seq(
      (10L, 1L, 100.0), (10L, 1L, 50.0),   // duplicate pk
      (11L, 99L, 20.0),                     // fk orphan (custkey 99)
      (12L, 2L, -5.0))                      // non-positive price
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val li = Seq((10L, 10.0), (10L, 75.0), (77L, 5.0)) // qty range + fk orphan
      .toDF("l_orderkey", "l_quantity")
    val got = Relational.dqReport(cust, ord, li).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got("customer_name_notnull") === ((2L, 1L, false)))
    assert(got("orders_pk_unique") === ((4L, 1L, false)))
    assert(got("orders_custkey_fk") === ((4L, 1L, false)))
    assert(got("orders_totalprice_pos") === ((4L, 1L, false)))
    // lineitem fk check: rows joined against orders — dup orderkey 10
    // fans each of its two lineitem rows out to 2, so n_checked = 5
    assert(got("lineitem_orderkey_fk") === ((5L, 1L, false)))
    assert(got("lineitem_qty_range") === ((3L, 1L, false)))
    // and the graded clean-data report passes everything
    assert(run("q_dq_checks").collect().forall(_.getBoolean(3)))
  }

  test("q_match_pattern equals the brute-force consecutive-triple V scan") {
    val got = run("q_match_pattern").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val exp = seriesByUser.flatMap { case (u, s) =>
      val vs = s.map(_._3).sliding(3).collect {
        case Seq(a, b, c) if b < a && c > b => (a - b, c - b)
      }.toSeq
      if (vs.isEmpty) None
      else Some(u -> (vs.size.toLong, vs.map(_._1).max, vs.map(_._2).max))
    }
    assert(got === exp)
  }

  test("q_markov_stationary equals the brute-force integer power iteration " +
      "and conserves ppb mass up to per-term floors") {
    val got = run("q_markov_stationary").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute-force transition counts from per-user (ts, event_id) chains
    val trans = evRows.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._4, e._3)).map(_._1).sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = trans.keys.map(_._1).toSeq.distinct.sorted
    val rowsum = types.map(t => t ->
      trans.collect { case ((`t`, _), n) => n }.sum).toMap
    var p = types.map(t => t -> 1000000000L / types.size).toMap
    (1 to 3).foreach { _ =>
      p = types.map(to => to -> types.map(from =>
        trans.get((from, to)).fold(0L)(n => p(from) * n / rowsum(from))).sum).toMap
    }
    types.foreach { t =>
      assert(got(t) === ((rowsum(t), p(t))), s"type $t")
    }
    // mass conservation: each round loses < |types|² ppb to floors
    assert(math.abs(p.values.sum - 1000000000L) < 3L * types.size * types.size)
  }

  test("q_churn: per-(type,week) churned users equal the brute-force set difference") {
    val got = run("q_churn").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // week = Monday truncation of the event day
    def week(us: Long): java.time.LocalDate = {
      val d = java.time.LocalDate.ofEpochDay(us / 86400000000L)
      d.minusDays(d.getDayOfWeek.getValue - 1L)
    }
    val present = evRows.map(r => (r._1, r._2, week(r._4))).toSet
    val weeks = present.map(_._3)
    val maxWk = weeks.max
    val exp = present.groupBy(p => (p._1, p._3)).collect {
      case ((t, wk), xs) if wk.isBefore(maxWk) =>
        val users = xs.map(_._2)
        val churned = users.count(u => !present((t, u, wk.plusDays(7))))
        (t, wk.toString) -> (users.size.toLong, churned.toLong,
          churned * 1000000L / users.size)
    }.toMap
    assert(got === exp)
  }

  test("q_join_interval's grid equi-join equals the brute-force THETA overlap join") {
    // the substitution claim itself: exploding sessions to covered hours
    // and equi-joining busy hours is result-identical to the interval
    // overlap theta join the oracle states
    val got = run("q_join_interval").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // brute force entirely from raw rows
    val gap = EventAnalytics.sessionGapUs
    val rows = Engine.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sessions = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._3)).map(_._4)
      val spans = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { us =>
        if (spans.nonEmpty && us - spans.last._2 <= gap)
          spans(spans.size - 1) = (spans.last._1, us)
        else spans += ((us, us))
      }
      spans.map { case (s0, e0) => (u, s0, e0) }
    }
    val hourCounts = rows.groupBy(r => (r._2, r._4 / 3600000000L))
      .view.mapValues(_.size.toLong).toMap
    val byType = hourCounts.keys.map(_._1).toSeq.distinct.sorted
    byType.foreach { t =>
      val hs = hourCounts.collect { case ((`t`, h), c) => (h, c) }.toSeq
      val (total, nHours) = (hs.map(_._2).sum, hs.size.toLong)
      val busy = hs.collect { case (h, c) if c * nHours > 2 * total => h }.sorted
      // merge contiguous busy hours into intervals
      val ivs = busy.foldLeft(List.empty[(Long, Long)]) { (acc, h) =>
        acc match {
          case (a, b) :: rest if h == b + 1 => (a, h) :: rest
          case _ => (h, h) :: acc
        }
      }.reverse
      if (ivs.isEmpty) assert(!got.contains(t))
      else {
        val over = sessions.filter { case (_, s0, e0) =>
          ivs.exists { case (a, b) =>
            s0 < (b + 1) * 3600000000L && a * 3600000000L <= e0 }
        }
        assert(got(t) === ((ivs.size.toLong, over.size.toLong,
          over.map(_._1).distinct.size.toLong)), s"type $t")
      }
    }
  }

  test("q_lateness_audit equals the brute-force jittered-arrival frontier scan") {
    val got = run("q_lateness_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def delayUs(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      (java.lang.Long.parseLong(hex, 16) % 1800L) * 1000000L
    }
    val rows = Engine.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // per user: scan in (arrival, event_id) order against the event-time
    // frontier
    val perEvent = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e._4 + delayUs(e._3), e._3))
      var frontier = Long.MinValue
      ordered.map { e =>
        val late = frontier > e._4
        val lag = if (late) frontier - e._4 else 0L
        frontier = math.max(frontier, e._4)
        (e._2, late, lag)
      }
    }
    perEvent.groupBy(_._1).foreach { case (t, xs) =>
      val n = xs.size.toLong
      val nLate = xs.count(_._2).toLong
      val maxLag = if (nLate > 0) xs.map(_._3).max else 0L
      assert(got(t) === ((n, nLate, nLate * 1000000L / n, maxLag)), s"type $t")
    }
  }

  test("q_rolling_corr equals the brute-force staged BigInt Pearson over the day grid") {
    val got = run("q_rolling_corr").collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .toMap
    val byDay = evRows.groupBy(_._4 / 86400000000L)
    val days = byDay.keys.toSeq.sorted
    val grid = days.map { d =>
      val rs = byDay(d)
      (d, rs.count(_._1 == "view").toLong, rs.count(_._1 == "purchase").toLong)
    }
    assert(got.size === grid.size)
    grid.zipWithIndex.foreach { case ((d, _, _), i) =>
      val win = grid.slice(math.max(0, i - 6), i + 1)
      val k = BigInt(win.size)
      val (sx, sy) = (BigInt(win.map(_._2).sum), BigInt(win.map(_._3).sum))
      val sxy = win.map(w => BigInt(w._2) * w._3).sum
      val sxx = win.map(w => BigInt(w._2) * w._2).sum
      val syy = win.map(w => BigInt(w._3) * w._3).sum
      val (cov, vx, vy) = (k * sxy - sx * sy, k * sxx - sx * sx, k * syy - sy * sy)
      val r2 = if (vx > 0 && vy > 0)
        Some((((cov * cov) / vx * 1000000) / vy).toLong) else None
      val dayStr = java.time.LocalDate.ofEpochDay(d).toString
      assert(got(dayStr) === ((grid(i)._2, grid(i)._3, k.toLong, cov.toLong,
        cov.signum.toLong, r2)), s"day $dayStr")
    }
  }

  test("q_twa equals the brute-force BigInt step-function integral per user") {
    val got = run("q_twa").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val exp = seriesByUser.collect { case (u, s) if s.size >= 2 =>
      val steps = s.sliding(2).toSeq.map { case Seq(a, b) => (a._3, b._2 - a._2) }
      val dur = steps.map(_._2).sum
      val wsum = steps.map { case (c, dt) => c * dt }.sum
      u -> (steps.size.toLong, dur, wsum,
        (BigInt(wsum) * 1000000 / dur).toLong)
    }.filter(_._2._2 > 0)
    assert(got === exp)
  }

  test("q_ewma_smooth equals the brute-force 8-lag dyadic window per user") {
    val got = run("q_ewma_smooth").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val weights = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L)
    val exp = seriesByUser.collect { case (u, s) if s.size >= 8 =>
      // position i (0-based, i >= 7): weights over cents(i), ..., cents(i-7)
      val ewmas = (7 until s.size).map { i =>
        val wsum = weights.zipWithIndex.map { case (w, k) => w * s(i - k)._3 }.sum
        wsum * 1000000L / 255L
      }
      u -> (ewmas.size.toLong, ewmas.max, ewmas.min, ewmas.last)
    }
    assert(got === exp)
  }

  /** Daily revenue grid (type, epoch-day, cents-sum) — the shared input
    * of the trend operators.
    */
  private lazy val dailyCents: Map[String, Seq[(Long, Long)]] =
    Engine.table(spark, dir, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100).cast("long").as("c"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, xs) =>
        t -> xs.groupBy(_._2).map { case (d, ys) => (d, ys.map(_._3).sum) }
          .toSeq.sortBy(_._1)
      }

  test("q_mann_kendall equals the brute-force pairwise sign sum and " +
    "tie-corrected variance") {
    val got = run("q_mann_kendall").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val exp = dailyCents.map { case (t, s) =>
      val pairs = for {
        i <- s.indices; j <- s.indices if j > i
      } yield math.signum(s(j)._2 - s(i)._2).toLong
      val n = s.size.toLong
      val ties = s.groupBy(_._2).values.map(_.size.toLong)
      val var18 = n * (n - 1) * (2 * n + 5) -
        ties.map(g => g * (g - 1) * (2 * g + 5)).sum
      t -> (n, pairs.size.toLong, pairs.sum, var18)
    }
    assert(got === exp)
    // S bounded by the pair count; a constant series has S = 0
    got.foreach { case (t, (_, m, sStat, _)) =>
      assert(math.abs(sStat) <= m, s"type $t")
    }
  }

  test("q_theil_sen equals the brute-force median of floorDiv pair slopes") {
    val got = run("q_theil_sen").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = dailyCents.collect { case (t, s) if s.size >= 2 =>
      val slopes = (for {
        i <- s.indices; j <- s.indices if j > i
      } yield Math.floorDiv((s(j)._2 - s(i)._2) * 1000000L,
        s(j)._1 - s(i)._1)).sorted
      // lower median: 1-based rank (m+1)/2
      t -> (slopes.size.toLong, slopes((slopes.size + 1) / 2 - 1))
    }
    assert(got === exp)
  }

  test("q_kendall_tau equals the brute-force concordance partition and " +
    "the counts tile the pair set") {
    val r = run("q_kendall_tau").collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
    val byDay = Engine.table(spark, dir, "events")
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        col("event_type"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (d, xs) =>
        (d, xs.count(_._2 == "view").toLong, xs.count(_._2 == "purchase").toLong)
      }.toSeq.sortBy(_._1)
    val pairs = for {
      i <- byDay.indices; j <- byDay.indices if j > i
    } yield (byDay(j)._2 - byDay(i)._2, byDay(j)._3 - byDay(i)._3)
    val exp = (pairs.size.toLong,
      pairs.count(p => p._1 * p._2 > 0).toLong,
      pairs.count(p => p._1 * p._2 < 0).toLong,
      pairs.count(p => p._1 == 0 && p._2 != 0).toLong,
      pairs.count(p => p._1 != 0 && p._2 == 0).toLong,
      pairs.count(p => p._1 == 0 && p._2 == 0).toLong)
    assert(got === exp)
    // the five disjoint classes tile the pair set
    assert(got._2 + got._3 + got._4 + got._5 + got._6 === got._1)
  }

  test("q_runs_test equals the brute-force median-sign run count") {
    val r = run("q_runs_test").collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val daily = Engine.table(spark, dir, "events")
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
        floor(col("value") * 100).cast("long").as("c"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val m = daily.size
    val med = daily.map(_._2).sorted.apply((m + 1) / 2 - 1)
    val signs = daily.filter(_._2 != med).map(x => if (x._2 > med) 1L else 0L)
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    assert(got === ((signs.size.toLong, signs.count(_ == 1L).toLong,
      signs.count(_ == 0L).toLong, runs)))
  }

  test("q_kruskal_wallis equals the brute-force pooled ranking and the " +
    "BigInt tie correction; rank sums tile N(N+1)") {
    val got = run("q_kruskal_wallis").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val r2 = rank2(evCents.map(_._2))
    val exp = evCents.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.size.toLong, xs.map(x => r2(x._2)).sum)
    }
    val n = evCents.size.toLong
    val tiePpm = {
      val c3 = evCents.groupBy(_._2).values
        .map(g => { val t = BigInt(g.size); t * t * t - t }).sum
      (c3 * 1000000 / (BigInt(n) * n * n - n)).toLong
    }
    assert(got.keySet === exp.keySet)
    got.foreach { case (t, (gn, gr2, gnt, gtie)) =>
      assert((gn, gr2) === exp(t), s"type $t")
      assert(gnt === n)
      assert(gtie === tiePpm)
    }
    // pooled 2×rank-sums over all groups tile 2·(1+...+N) = N(N+1)
    assert(got.values.map(_._2).sum === n * (n + 1L))
  }

  test("q_survival_km equals the brute-force per-type risk table and the " +
    "risk sets telescope to each type's user count") {
    val got = run("q_survival_km").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byUserType = Engine.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(x => (x._1, x._2)).toSeq
      .map { case ((_, t), xs) => (t, xs.map(_._3).min, xs.map(_._3).max) }
    val frontier = byUserType.map(_._3).max
    val lts = byUserType.map { case (t, d0, d1) =>
      (t, d1 - d0, frontier - d1 >= Stats.churnGapDays) }
    val exp = lts.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, us) =>
      val grid = us.groupBy(_._2).toSeq.sortBy(_._1).map { case (lt, xs) =>
        (lt, xs.count(_._3).toLong, xs.count(!_._3).toLong) }
      var atRisk = us.size.toLong
      var haz = 0L
      val rows = grid.map { case (lt, d, c) =>
        haz += d * 1000000L / atRisk
        val row = (t, lt, atRisk, d, c, haz)
        atRisk -= d + c
        row
      }
      assert(atRisk === 0L, s"type $t risk set must telescope to zero")
      rows
    }
    assert(got.toSeq === exp)
    // non-degenerate: both churned and censored (user, type) chains exist
    assert(lts.exists(_._3) && lts.exists(!_._3))
  }

  test("q_fd_check equals the brute-force distinct arithmetic and " +
    "exercises both verdicts") {
    def counts(table: String, lhs: String, rhs: String): (Long, Long) = {
      val rows = Engine.table(spark, dir, table)
        .select(col(lhs).cast("string"), col(rhs).cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      (rows.map(_._1).distinct.size.toLong, rows.distinct.size.toLong)
    }
    val cands = Seq(
      ("nation", "n_nationkey", "n_regionkey"),
      ("customer", "c_nationkey", "c_mktsegment"),
      ("orders", "o_custkey", "o_orderpriority"),
      ("lineitem", "l_orderkey", "l_returnflag"))
    val got = graft.Registry.all("q_fd_check").fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    cands.foreach { case (tn, l, rr) =>
      val (nl, np) = counts(tn, l, rr)
      assert(got(s"$tn: $l -> $rr") === ((nl, np, nl == np)), s"$tn.$l->$rr")
    }
    assert(got("nation: n_nationkey -> n_regionkey")._3,
      "the true FD must hold")
    assert(got.values.exists(!_._3), "a negative candidate must fail")
  }

  test("q_calendar_anomaly equals the brute-force weekday-hour baseline walk") {
    val dayUs = 86400000000L
    val cells = evRows.map { case (_, _, _, us) =>
      (us / dayUs, (us % dayUs) / 3600000000L)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = run("q_calendar_anomaly").collect()
      .map { r =>
        val day = r.getDate(0).toLocalDate.toEpochDay
        (day, r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))
      }.toMap
    assert(got.keySet === cells.keySet.map(identity))
    cells.foreach { case (cell @ (day, hr), n) =>
      val dow = ((day + 3) % 7) + 1
      val others = cells.filter { case ((d2, h2), _) =>
        h2 == hr && (((d2 + 3) % 7) + 1) == dow && d2 != day
      }.values
      val (base, k) = (others.sum, others.size.toLong)
      assert(got(cell) === ((n, base, k, k > 0 && n * k > 2 * base)),
        s"cell $cell")
    }
    assert(got.values.exists(_._3 > 0), "some cell must have a baseline")
  }

  test("q_corr_matrix equals the BigInt brute force over the zero-filled " +
    "calendar grid, for every type pair") {
    val cells = evRows.map { case (t, _, _, us) => (t, us / 86400000000L) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val days = cells.keys.map(_._2).toSeq.distinct.sorted
    val types = cells.keys.map(_._1).toSeq.distinct.sorted
    val got = run("q_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val pairs = for (i <- types.indices; j <- (i + 1) until types.length)
      yield (types(i), types(j))
    assert(got.keySet === pairs.toSet)
    pairs.foreach { case (ta, tb) =>
      val xs = days.map(d => BigInt(cells.getOrElse((ta, d), 0L)))
      val ys = days.map(d => BigInt(cells.getOrElse((tb, d), 0L)))
      val k = BigInt(days.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val cov = k * sxy - sx * sy
      val vx = k * xs.map(x => x * x).sum - sx * sx
      val vy = k * ys.map(y => y * y).sum - sy * sy
      val sign = cov.signum.toLong
      val r2 = if (vx > 0 && vy > 0) Some(((cov * cov / vx * 1000000) / vy).toLong)
        else None
      assert(got((ta, tb)) === ((days.size.toLong, sign, r2)), s"pair ($ta,$tb)")
    }
  }

  test("q_ab_srm equals the brute-force md5-parity split arithmetic") {
    def arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) % 2
    }
    val users = evRows.map(_._2).distinct
    val nA = users.count(arm(_) == 0).toLong
    val nB = users.count(arm(_) == 1).toLong
    val chi2 = (BigInt(nA - nB) * (nA - nB) * 1000 / (nA + nB)).toLong
    val r = run("q_ab_srm").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getBoolean(4)) === ((nA, nB, nA + nB, chi2, chi2 > 3841L)))
    assert(nA > 0 && nB > 0)
  }

  test("q_calendar_heatmap equals the brute-force weekday×hour grid") {
    val got = graft.Registry.all("q_calendar_heatmap").fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val dayUs = 86400000000L
    val cells = evRows.map { case (_, user, _, us) =>
      val day = us / dayUs
      ((((day + 3) % 7) + 1, (us % dayUs) / 3600000000L), user)
    }
    val byCell = cells.groupBy(_._1)
    val byDow = cells.groupBy(_._1._1).map { case (d, xs) => d -> xs.size.toLong }
    assert(got.keySet === byCell.keySet)
    byCell.foreach { case (cell @ (dow, _), xs) =>
      val (n, nu, share) = got(cell)
      assert(n === xs.size.toLong)
      assert(nu === xs.map(_._2).distinct.size.toLong)
      assert(share === xs.size.toLong * 1000000L / byDow(dow))
    }
    // per-weekday shares sum to ~1e6 (floor slack < hours per weekday)
    byDow.keys.foreach { d =>
      val s = got.collect { case ((dd, _), (_, _, p)) if dd == d => p }.sum
      assert(s <= 1000000L && s > 1000000L - 24L, s"dow $d share sum $s")
    }
  }

  private lazy val evFull: Seq[(Long, Long, Long, String, Long)] =
    Engine.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))

  test("q_feature_lags equals the brute-force past-only per-user walk") {
    val got = graft.Registry.all("q_feature_lags").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getLong(6))).toMap
    val exp = evFull.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3, r._1))
      s.indices.map { i =>
        val prev3 = s.slice(math.max(0, i - 3), i).map(_._5)
        s(i)._1 -> (s(i)._5,
          if (i >= 1) Some(s(i - 1)._5) else None,
          if (i >= 2) Some(s(i - 2)._5) else None,
          if (prev3.nonEmpty) Some(prev3.sum) else None,
          prev3.size.toLong)
      }
    }.toMap
    assert(got === exp)
    // cold-start rows are real: some user has a NULL lag1
    assert(got.values.exists(_._2.isEmpty))
  }

  test("q_label_horizon equals the brute-force future-only label walk " +
    "and labels both classes") {
    val got = graft.Registry.all("q_label_horizon").fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val exp = evFull.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3, r._1))
      s.indices.collect { case i if s(i)._4 == "view" =>
        val nextP = s.drop(i + 1).collectFirst {
          case r if r._4 == "purchase" => r._3
        }
        // conditional min over the following frame = the FIRST purchase
        // in row order (rows are time-sorted, so min us == first)
        val tt = nextP.map(_ - s(i)._3)
          .filter(_ <= graft.operators.EventAnalytics.labelHorizonUs)
        s(i)._1 -> (tt.isDefined, tt)
      }
    }.toMap
    assert(got === exp)
    assert(got.values.exists(_._1) && got.values.exists(!_._1),
      "label must be non-degenerate at sf0.001")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("q_permutation_test equals a MessageDigest replay of the 20 reshuffles") {
    val rows = Engine.table(spark, dir, "events")
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) 0L else math.floor(r.getDouble(1) * 100).toLong))
    val perUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def arm(key: String): Int = Integer.parseInt(md5hex(key).take(1), 16) % 2
    def tOf(seed: Int): BigInt = {
      val as = perUser.toSeq.map { case (u, m) =>
        (arm(if (seed == 0) u.toString else s"p$seed:$u"), m)
      }
      val na = BigInt(as.count(_._1 == 0)); val nb = BigInt(as.count(_._1 == 1))
      val sa = BigInt(as.filter(_._1 == 0).map(_._2).sum)
      val sb = BigInt(as.filter(_._1 == 1).map(_._2).sum)
      if (na == 0 || nb == 0) BigInt(0)
      else ((sa * nb - sb * na).abs * 1000000) / (na * nb)
    }
    val t0 = tOf(0)
    val nGe = (1 to 20).count(i => tOf(i) >= t0).toLong
    val got = run("q_permutation_test").collect()
    assert(got.length === 1)
    assert((got.head.getLong(0), got.head.getLong(1),
      got.head.getLong(2), got.head.getLong(3)) ===
      ((20L, t0.toLong, nGe, (nGe + 1) * 1000 / 21)))
  }

  test("q_changepoint equals the brute-force argmax split per type") {
    val d = Engine.table(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val got = run("q_changepoint").collect()
      .map(r => r.getString(0) ->
        ((r.getDate(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val multi = d.groupBy(_._1).filter(_._2.length >= 2)
    assert(got.keySet === multi.keySet)
    multi.foreach { case (t, xs0) =>
      val xs = xs0.sortBy(_._2.getTime)
      val n = xs.length
      val total = xs.map(x => BigInt(x._3)).sum
      var bestKey = BigInt(-1); var bestK = -1
      for (k <- 1 until n) {
        val sl = xs.take(k).map(x => BigInt(x._3)).sum
        val dterm = sl * (n - k) - (total - sl) * k
        val key = (dterm * dterm) / (BigInt(k) * (n - k))
        if (key > bestKey) { bestKey = key; bestK = k } // day-asc tiebreak
      }
      val sl = xs.take(bestK).map(x => BigInt(x._3)).sum
      assert(got(t) === ((xs(bestK - 1)._2, n.toLong,
        (sl / bestK).toLong, ((total - sl) / (n - bestK)).toLong)), s"type $t")
    }
  }

  test("q_negative_sampling equals the MessageDigest-ranked complement draw") {
    val inter = Engine.table(spark, dir, "events")
      .select(col("user_id"), EventAnalytics.propsItem.as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val items = inter.map(_._2).distinct
    val seen = inter.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = seen.keys.toSeq.sorted.flatMap { u =>
      items.filterNot(seen(u))
        .map(i => (md5hex(s"$u:$i"), i))
        .sorted.take(2).zipWithIndex
        .map { case ((_, i), k) => (u, i, k + 1L) }
    }
    val got = run("q_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
    assert(got.nonEmpty, "complement draw must be non-empty at sf0.001")
    // a negative is never an interacted item
    got.foreach { case (u, i, _) => assert(!seen(u).contains(i)) }
  }

  test("q_negative_sampling bucketed draw is identical to the cross-join form") {
    // result-identity pin for the round-11 catalog-scale-safe rework:
    // the retired users×catalog crossJoin + left-anti + per-user window
    // plan, re-stated here as the reference implementation
    val ev = Engine.table(spark, dir, "events")
      .select(col("user_id"), EventAnalytics.propsItem.as("item"))
      .filter(col("item").isNotNull)
    val it = ev.select(col("item")).distinct()
    val u = ev.select(col("user_id")).distinct()
    val seen = ev.select(col("user_id"), col("item")).distinct()
    val cand = u.crossJoin(broadcast(it))
      .join(seen, Seq("user_id", "item"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(md5(concat(col("user_id").cast("string"), lit(":"),
        col("item").cast("string")).cast("binary")), col("item"))
    val exp = cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .select(col("user_id"), col("item").as("neg_item"), col("rk"))
      .orderBy(col("user_id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run("q_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
  }

  test("q_negative_sampling multi-bucket closure matches the cross-join form") {
    // round-11 ADVICE #1: every gated SF resolves to nBuckets = 1 at the
    // 2048-item default, leaving the >1-bucket per-bucket top-2 closure
    // and seen-array prune exercised only by the bucket-invariance
    // argument. Force a >= 3 bucket grid on the tiny test catalog and pin
    // identity with the retired cross-join reference THROUGH the real
    // multi-bucket plan.
    val ev = Engine.table(spark, dir, "events")
      .select(col("user_id"), EventAnalytics.propsItem.as("item"))
      .filter(col("item").isNotNull)
    val nItems = ev.select(col("item")).distinct().count()
    val forced = math.max(1L, nItems / 4L)
    assert(nItems / forced >= 3L,
      s"test catalog ($nItems items) must yield >= 3 buckets at size $forced")
    // the registry closure is negativeSampling(ev) at the default bucket
    // size; calling the shared function with a forced size exercises the
    // identical multi-bucket plan without mutating any global (the
    // round-12 var was a latent flake under suite parallelism)
    val got = EventAnalytics.negativeSampling(ev, bucketItems = forced)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val it = ev.select(col("item")).distinct()
    val u = ev.select(col("user_id")).distinct()
    val seen = ev.select(col("user_id"), col("item")).distinct()
    val cand = u.crossJoin(broadcast(it))
      .join(seen, Seq("user_id", "item"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(md5(concat(col("user_id").cast("string"), lit(":"),
        col("item").cast("string")).cast("binary")), col("item"))
    val exp = cand.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 2)
      .select(col("user_id"), col("item"), col("rk"))
      .orderBy(col("user_id"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
  }

  test("q_negative_sampling_user is deterministic and covers the exact draw at B = 1") {
    val a = run("q_negative_sampling_user").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = run("q_negative_sampling_user").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a === b, "sampled draw must be run-to-run deterministic")
    assert(a.nonEmpty)
    val nItems = Engine.table(spark, dir, "events")
      .select(EventAnalytics.propsItem.as("item"))
      .filter(col("item").isNotNull).distinct().count()
    val bCount = math.max(1L,
      nItems / EventAnalytics.negSamplingUserBucketItems)
    if (bCount == 1L) {
      // the sample covers the whole catalog for every user, so the
      // sampled contract must coincide with the exact global top-2
      val exact = run("q_negative_sampling").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(a === exact)
    }
  }

  test("q_negative_sampling_user multi-bucket draw equals the driver reference") {
    // force >= 3 sample buckets on the test catalog and recompute the
    // whole contract (md5-nibble buckets, per-user bucket probe,
    // complement, md5-ranked top-2) in plain Scala
    val inter = Engine.table(spark, dir, "events")
      .select(col("user_id"), EventAnalytics.propsItem.as("item"))
      .filter(col("item").isNotNull)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val items = inter.map(_._2).distinct
    val forced = math.max(1L, items.size / 4L)
    val bCount = math.max(1L, items.size / forced)
    assert(bCount >= 3L,
      s"test catalog (${items.size} items) must yield >= 3 buckets")
    def hex4(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(4), 16)
    val seen = inter.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemBucket = items.map(i => i -> hex4(i.toString) % bCount).toMap
    val exp = seen.keys.toSeq.sorted.flatMap { u =>
      val ub = hex4(s"u:$u") % bCount
      items.filter(i => itemBucket(i) == ub && !seen(u).contains(i))
        .map(i => (md5hex(s"$u:$i"), i))
        .sorted.take(2).zipWithIndex
        .map { case ((_, i), k) => (u, i, k + 1L) }
    }
    val got = EventAnalytics.negativeSamplingUser(
        Engine.table(spark, dir, "events"), bucketItems = forced)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
    assert(got.nonEmpty)
    got.foreach { case (u, i, _) => assert(!seen(u).contains(i)) }
  }

  test("q_k_anonymity equals the brute-force QI-class census") {
    val rows = Engine.table(spark, dir, "events")
      .select(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("isodow"),
        hour(col("ts")).cast("long").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1).toString, r.getLong(2)))
    val classes = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exp = rows.map(_._1).distinct.sorted.map { t =>
      val cs = classes.filter(_._1._1 == t).values.toSeq
      val atRisk = cs.filter(_ < 5).sum
      (t, cs.size.toLong, cs.sum, cs.count(_ < 5).toLong, atRisk,
        atRisk * 1000000L / cs.sum)
    }
    val got = run("q_k_anonymity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === exp)
    // the audit must be non-degenerate: some class is small, some isn't
    assert(classes.values.exists(_ < 5) && classes.values.exists(_ >= 5))
  }
}
