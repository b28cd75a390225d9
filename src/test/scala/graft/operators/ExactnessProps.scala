package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the engine's two portability backbones:
  *
  *  - the Exact decimal policy (DESIGN.md "Exact-decimal numeric
  *    policy"): `sumMoney` over arbitrary 2dp money values must equal
  *    the BigDecimal reference sum regardless of row order or partition
  *    split — this is what lets the oracle gate run with zero float
  *    tolerance;
  *  - the int8 quantization contract (`Similarity.quantizeEmbeddings`):
  *    codes stay in [0, 255] and reconstruct to within one quantization
  *    step for ANY float corpus, not just the curated testdata.
  */
object ExactnessProps extends Properties("Exactness") {

  private lazy val spark = TestSpark.spark

  // 2dp money magnitudes up to ±10M, the Redshift money shape
  private val genMoney: Gen[BigDecimal] =
    Gen.chooseNum(-1000000000L, 1000000000L).map(c => BigDecimal(c) / 100)

  property("sumMoney equals the BigDecimal reference sum for any values and split") =
    Prop.forAll(Gen.nonEmptyListOf(genMoney), Gen.chooseNum(1, 8)) { (vals, parts) =>
      val rows = vals.map(v => Row(v.toDouble))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts),
        StructType(Seq(StructField("m", DoubleType, nullable = false))))
      val got = df.agg(Exact.sumMoney(col("m"))).head().getDouble(0)
      // reference: exact decimal sum of the 2dp values, rounded to 2dp
      val want = vals.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == want
    }

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-4.0f, 4.0f))

  property("quantizeEmbeddings: codes in [0,255] and one-step reconstruction, any corpus") =
    Prop.forAll(Gen.nonEmptyListOf(genVec)) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(StructField("vec_id", LongType, nullable = false),
          StructField("embedding", ArrayType(FloatType, containsNull = false)))))
      val out = graft.llm.Similarity.quantizeEmbeddings(df, keepStats = true)
        .select(col("vec_id"), col("codes"), col("q_min"), col("q_max"))
        .collect()
      val mn = out.head.getSeq[Long](2)
      val mx = out.head.getSeq[Long](3)
      out.forall { r =>
        val codes = r.getSeq[Int](1)
        val orig = vecs(r.getLong(0).toInt)
        codes.indices.forall { i =>
          val step = math.max(mx(i) - mn(i), 1L).toDouble / 255
          val dequant = mn(i) + codes(i) * step
          val xq = math.floor(orig(i).toDouble * 1000000)
          codes(i) >= 0 && codes(i) <= 255 &&
            math.abs(dequant - xq) <= step + 1e-9
        }
      }
    }

  // events within a few hours per user, microsecond-granular, duplicate
  // timestamps allowed (the event_id tiebreak must resolve them)
  private val genEvents: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.chooseNum(1L, 3L)
      offUs <- Gen.chooseNum(0L, 4L * 3600 * 1000000)
    } yield (user, offUs))

  property("OuterProductSum equals the brute-force moment matrix for any integer corpus and split") =
    Prop.forAll(
      Gen.chooseNum(1, 6),
      Gen.nonEmptyListOf(Gen.listOfN(4, Gen.chooseNum(-50, 50))),
      Gen.chooseNum(1, 8)) { (d0, rows0, parts) =>
      // integer components keep every product and partial sum exactly
      // representable, so the aggregator must match the reference
      // EXACTLY under ANY partitioning / merge order — the same
      // order-independence argument the gate's PCA booleans lean on
      val d = d0
      val rows = rows0.map(r => (r ++ List.fill(d)(0)).take(d)
        .map(_.toDouble))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Row(_)), parts),
        StructType(Seq(StructField("v", ArrayType(DoubleType), nullable = false))))
      val got = df.agg(
        graft.functions.VectorExpressions.outerProductSum(col("v")))
        .head().getSeq[Double](0)
      val want = (0 until d * d).map { ij =>
        val i = ij / d; val j = ij % d
        rows.map(r => r(i) * r(j)).sum
      }
      got == want
    }

  property("sessionize matches the single-threaded gap fold for any event set") =
    Prop.forAll(genEvents) { evs =>
      val gapUs = graft.operators.EventAnalytics.sessionGapUs
      val baseUs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
      def ts(us: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp((baseUs + us) / 1000L)
        t.setNanos(((baseUs + us) % 1000000L * 1000L).toInt)
        t
      }
      val rows = evs.zipWithIndex.map { case ((u, off), i) => Row(u, ts(off), i.toLong) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3),
        StructType(Seq(StructField("user_id", LongType, nullable = false),
          StructField("t", TimestampType, nullable = false),
          StructField("event_id", LongType, nullable = false))))
      val got = graft.operators.EventAnalytics
        .sessionize(df, "user_id", "t", "event_id")
        .select(col("event_id"), col("session_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: per user, sort by (offset, event_id) and count gap breaks
      val want = evs.zipWithIndex
        .map { case ((u, off), i) => (u, off, i.toLong) }
        .groupBy(_._1).values.flatMap { es =>
          var sid = 0L
          var last = Long.MinValue
          es.sortBy(e => (e._2, e._3)).map { case (_, off, id) =>
            if (last == Long.MinValue || off - last > gapUs) sid += 1
            last = off
            id -> sid
          }
        }.toMap
      got == want
    }

  private val genFunnelEvents: Gen[List[(Long, String, Long)]] =
    Gen.nonEmptyListOf(for {
      user <- Gen.chooseNum(1L, 3L)
      tpe <- Gen.oneOf("view", "click", "purchase", "error")
      offUs <- Gen.chooseNum(0L, 3600L * 1000000)
    } yield (user, tpe, offUs))

  property("funnel matches the min-step reference fold for any event set") =
    Prop.forAll(genFunnelEvents) { evs =>
      val baseUs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
      def ts(us: Long): java.sql.Timestamp = {
        val t = new java.sql.Timestamp((baseUs + us) / 1000L)
        t.setNanos(((baseUs + us) % 1000000L * 1000L).toInt)
        t
      }
      val rows = evs.map { case (u, tp, off) => Row(u, tp, ts(off)) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3),
        StructType(Seq(StructField("user_id", LongType, nullable = false),
          StructField("event_type", StringType, nullable = false),
          StructField("ts", TimestampType, nullable = false))))
      val got = graft.operators.EventAnalytics.funnel(df)
        .select(col("user_id"), col("stage")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      // reference: t_view = min view; t_click = min click >= t_view;
      // t_purchase = min purchase >= t_click; stage = steps reached.
      // Users with no view are absent entirely.
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val views = es.filter(_._2 == "view").map(_._3)
        if (views.isEmpty) None
        else {
          val tv = views.min
          val clicks = es.filter(e => e._2 == "click" && e._3 >= tv).map(_._3)
          if (clicks.isEmpty) Some(u -> 1)
          else {
            val tc = clicks.min
            val purchases = es.filter(e => e._2 == "purchase" && e._3 >= tc)
            Some(u -> (if (purchases.isEmpty) 2 else 3))
          }
        }
      }
      got == want
    }

  property("bloomPrefilter: superset of true matches, any key sets (no false negatives)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)),
      Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))) { (probeKeys, buildKeys) =>
      val probe = spark.createDataFrame(
        spark.sparkContext.parallelize(probeKeys.map(Row(_)), 2),
        StructType(Seq(StructField("k", LongType, nullable = false))))
      val build = spark.createDataFrame(
        spark.sparkContext.parallelize(buildKeys.map(Row(_)), 2),
        StructType(Seq(StructField("b", LongType, nullable = false))))
      // tiny filter (512 bits) to force real collision pressure
      val pre = Scale.bloomPrefilter(probe, "k", build, "b", mBits = 512)
        .select(col("k")).collect().map(_.getLong(0)).toSet
      val trueMatches = probeKeys.toSet.intersect(buildKeys.toSet)
      // every true match survives the prefilter (false positives are fine)
      trueMatches.subsetOf(pre)
    }

  // The percentiles every quartile/decile operator leans on
  // (q_outlier_iqr 0.25/0.75, q_rfm, q_bin_equidepth 0.1..0.9,
  // q_pareto_share 0.9, q_winsorize 0.05/0.95, q_rolling_median 0.5):
  // (SQL literal, exact rational num/den).
  private val genPct: Gen[(String, Int, Int)] = Gen.oneOf(
    ("0.05", 1, 20), ("0.1", 1, 10), ("0.25", 1, 4), ("0.5", 1, 2),
    ("0.75", 3, 4), ("0.9", 9, 10), ("0.95", 19, 20))

  property("percentile_disc matches the ANSI cume_dist definition, any input") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)),
      genPct, Gen.chooseNum(1, 8)) { case (vals, (pLit, num, den), parts) =>
      // Every graded plan computes quantile boundaries with Spark's
      // percentile_disc AGGREGATE while the oracle states the ANSI
      // definition — the smallest v whose cume_dist reaches p — with an
      // explicit cume_dist window. This property pins the two
      // definitions equal on arbitrary integer inputs, with the
      // reference comparison done in EXACT rational arithmetic
      // (den·|{x ≤ v}| ≥ num·n), so a Spark upgrade that drifts the
      // boundary policy at a rank tie fails here, not at the gate.
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(vals.map(Row(_)), parts),
        StructType(Seq(StructField("v", LongType, nullable = false))))
      val got = df
        .agg(expr(s"percentile_disc($pLit) WITHIN GROUP (ORDER BY v)"))
        .head().get(0) match {
          case d: java.lang.Double => d.toDouble
          case l: java.lang.Long => l.toDouble
          case o => sys.error(s"unexpected percentile_disc type: $o")
        }
      val sorted = vals.sorted
      val n = sorted.size.toLong
      val want = sorted.find { v =>
        sorted.count(_ <= v).toLong * den >= num.toLong * n
      }.get
      got == want.toDouble
    }
}
