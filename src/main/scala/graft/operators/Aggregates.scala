package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** SURVEY.md §2 Part B — aggregations, window functions, sorts/limits,
  * set operations. All stock Catalyst: partial (map-side) aggregation,
  * sampled range-partition sorts, window exec over partitioned sorts.
  *
  * Numeric policy (see [[Exact]]): money sums via bounded decimals;
  * integer-valued doubles (l_quantity) summed directly (exact in IEEE
  * regardless of order); moments (variance/corr) derived from exact sums
  * with the identical arithmetic expression in both engines.
  */
object Aggregates {
  import Exact._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Flagship: TPC-H-Q1-style pricing summary (SURVEY §7 minimum slice).
    * Scan → pushed filter → hash agg (partial+final) → sort. GROUP BY +
    * HAVING in one plan.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        sumCharge(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("sum_charge"),
        avgExact(col("l_quantity")).as("avg_qty"),
        avgExact(col("l_extendedprice")).as("avg_price"),
        avgExact(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .filter(col("count_order") > 100)
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummaryOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(l_quantity) AS sum_qty,
       |  ${oSumMoney("l_extendedprice")} AS sum_base_price,
       |  ${oSumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  ${oSumCharge("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
       |  ${oAvgExact("l_quantity")} AS avg_qty,
       |  ${oAvgExact("l_extendedprice")} AS avg_price,
       |  ${oAvgExact("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |HAVING count(*) > 100
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val queries: Map[String, Q] = Map(

    // Ungrouped aggregate — single-row global summary.
    "q_agg_global" -> Q(
      s"""SELECT count(*) AS n_rows,
         |  sum(l_quantity) AS sum_qty,
         |  ${oSumMoney("l_extendedprice")} AS sum_price,
         |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
         |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
         |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_price"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    },

    // GROUP BY + HAVING (flagship, also wired to SparkEntry.entry).
    "q_agg_group" -> Q(pricingSummaryOracle)(pricingSummary),

    // Equi-width histogram via width_bucket — the one-pass profiling
    // shape for value distributions at scale (one hash agg, bucket count
    // fixed). DuckDB has no width_bucket, so the oracle states the same
    // bucketing arithmetic: lower bound 0 and an exactly-representable
    // width (50/10 = 5.0) make (v - lower)/width bit-identical to
    // Spark's internal steps, so floor can't straddle engines.
    "q_histogram" -> Q(
      """SELECT CASE WHEN l_quantity < 0 THEN 0
        |            WHEN l_quantity >= 50 THEN 11
        |            ELSE cast(floor(l_quantity / 5.0) as bigint) + 1 END AS bucket,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(width_bucket(col("l_quantity"), lit(0.0), lit(50.0), lit(10L))
          .as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },

    // One-statement column profile (the pre-load table audit: row count,
    // per-column cardinalities, null counts, numeric ranges in ONE pass
    // over the scan). Multiple exact count-distincts expand map-side;
    // the approx tier for unbounded cardinalities is q_agg_approx.
    "q_profile" -> Q(
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT c_nationkey) AS d_nationkey,
        |  count(DISTINCT c_mktsegment) AS d_mktsegment,
        |  count(c_acctbal) AS nn_acctbal,
        |  min(c_acctbal) AS min_acctbal, max(c_acctbal) AS max_acctbal
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("c_nationkey")).as("d_nationkey"),
        countDistinct(col("c_mktsegment")).as("d_mktsegment"),
        count(col("c_acctbal")).as("nn_acctbal"),
        min(col("c_acctbal")).as("min_acctbal"),
        max(col("c_acctbal")).as("max_acctbal"))
    },

    "q_agg_distinct" -> Q(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate distinct (Redshift APPROXIMATE COUNT(DISTINCT), HLL).
    // HLL estimates are engine-specific, so the estimate VALUE can't be
    // hash-compared — but the group keys and exact counts can. The gate
    // emits the exact distinct count (hash-gated cross-engine) plus a
    // self-check boolean: the HLL++ estimate at rsd 0.02 must land within
    // 5×rsd of the exact count, which the oracle pins TRUE. Plumbing
    // drift (keys, row counts, schema) now fails the hard gate; only the
    // sketch-internal value stays engine-local (LlmSpec bounds it too).
    "q_agg_approx" -> Q(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .select(col("l_returnflag"), col("n_parts"), col("n"),
          (abs(col("approx_parts") - col("n_parts")) <=
            col("n_parts") * lit(0.1)).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    },

    "q_agg_rollup" -> Q(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  grouping(o_orderstatus, o_orderpriority) AS gid,
         |  count(*) AS n, ${oSumMoney("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sumMoney(col("o_totalprice")).as("total"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"),
          col("n"), col("total"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    "q_agg_cube" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n"), col("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // GROUPING SETS — SQL-surface form (spark.sql over registered views),
    // exactly the reference's passthrough shape (core.py:84).
    "q_agg_gsets" -> Q(
      """SELECT o_orderstatus, o_orderpriority,
        |  grouping(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  grouping_id(o_orderstatus, o_orderpriority) AS gid, count(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // Statistical moments from exact decimal sums: the variance/stddev/corr
    // arithmetic below is the *same expression tree* in Spark and DuckDB,
    // evaluated over order-independent exact sums → bit-identical doubles.
    "q_agg_stats" -> Q(
      """SELECT l_returnflag, n,
        |  (sqq - sq*sq/n) / (n - 1) AS var_qty,
        |  sqrt((sqq - sq*sq/n) / (n - 1)) AS stddev_qty,
        |  (n*sqd - sq*sd) / (sqrt(n*sqq - sq*sq) * sqrt(n*sdd - sd*sd)) AS corr_qty_disc,
        |  round(p50, 6) AS median_qty, round(p90, 6) AS p90_qty
        |FROM (
        |  SELECT l_returnflag,
        |    cast(count(*) as double) AS n,
        |    sum(l_quantity) AS sq,
        |    sum(l_quantity * l_quantity) AS sqq,
        |    cast(sum(cast(l_discount as decimal(18,4))) as double) AS sd,
        |    cast(sum(cast(l_discount as decimal(18,4)) * cast(l_discount as decimal(18,4))) as double) AS sdd,
        |    cast(sum(cast(l_quantity as decimal(18,4)) * cast(l_discount as decimal(18,4))) as double) AS sqd,
        |    quantile_cont(l_quantity, 0.5) AS p50,
        |    quantile_cont(l_quantity, 0.9) AS p90
        |  FROM lineitem GROUP BY l_returnflag
        |) ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast(DoubleType).as("n"),
          sum(col("l_quantity")).as("sq"),
          sum(col("l_quantity") * col("l_quantity")).as("sqq"),
          sum(dec(col("l_discount"), 18, 4)).cast(DoubleType).as("sd"),
          sum(dec(col("l_discount"), 18, 4) * dec(col("l_discount"), 18, 4))
            .cast(DoubleType).as("sdd"),
          sum(dec(col("l_quantity"), 18, 4) * dec(col("l_discount"), 18, 4))
            .cast(DoubleType).as("sqd"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"))
      base.select(
        col("l_returnflag"), col("n"),
        ((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)).as("var_qty"),
        sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / (col("n") - 1)).as("stddev_qty"),
        ((col("n") * col("sqd") - col("sq") * col("sd")) /
          (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
            sqrt(col("n") * col("sdd") - col("sd") * col("sd")))).as("corr_qty_disc"),
        round(col("p50"), 6).as("median_qty"),
        round(col("p90"), 6).as("p90_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Higher moments from exact integer power sums (qty, qty², qty³, qty⁴
    // are all integers summing exactly in doubles) — sample skewness and
    // excess kurtosis with the identical expression tree in both engines.
    "q_agg_moments" -> Q(
      """SELECT l_linestatus, n,
        |  ((sq3 - 3*mu*sq2 + 3*mu*mu*sq - n*mu*mu*mu) / n)
        |    / (((sq2 - n*mu*mu) / n) * sqrt((sq2 - n*mu*mu) / n)) AS skew_qty,
        |  ((sq4 - 4*mu*sq3 + 6*mu*mu*sq2 - 4*mu*mu*mu*sq + n*mu*mu*mu*mu) / n)
        |    / (((sq2 - n*mu*mu) / n) * ((sq2 - n*mu*mu) / n)) - 3.0 AS kurt_qty
        |FROM (
        |  SELECT l_linestatus, cast(count(*) as double) AS n,
        |    sum(l_quantity) AS sq, sum(l_quantity*l_quantity) AS sq2,
        |    sum(l_quantity*l_quantity*l_quantity) AS sq3,
        |    sum(l_quantity*l_quantity*l_quantity*l_quantity) AS sq4,
        |    sum(l_quantity) / count(*) AS mu
        |  FROM lineitem GROUP BY l_linestatus)
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val q = col("l_quantity")
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum(q).as("sq"), sum(q * q).as("sq2"),
          sum(q * q * q).as("sq3"), sum(q * q * q * q).as("sq4"),
          (sum(q) / count(lit(1))).as("mu"))
      val (n, sq, sq2, sq3, sq4, mu) =
        (col("n"), col("sq"), col("sq2"), col("sq3"), col("sq4"), col("mu"))
      // pow(x, 1.5)/pow(x, 2.0) are libm-dependent across engines;
      // x*sqrt(x) and x*x are exactly-rounded IEEE ops — identical bits.
      val variance = (sq2 - n * mu * mu) / n
      base.select(
        col("l_linestatus"), n,
        (((sq3 - lit(3) * mu * sq2 + lit(3) * mu * mu * sq - n * mu * mu * mu) / n)
          / (variance * sqrt(variance))).as("skew_qty"),
        (((sq4 - lit(4) * mu * sq3 + lit(6) * mu * mu * sq2
          - lit(4) * mu * mu * mu * sq + n * mu * mu * mu * mu) / n)
          / (variance * variance) - 3.0).as("kurt_qty"))
        .orderBy(col("l_linestatus"))
    },

    // Simple OLS regression (slope/intercept of price on quantity per
    // supplier) from the same exact-integer-sums discipline as
    // q_agg_moments: x = integer quantity, y = whole-dollar price, so
    // every aggregated sum is an exactly-representable double (per-
    // supplier row counts are SF-invariant in TPC-H scaling, keeping
    // n·Σxy far under 2^53 at any corpus size); the closing divisions
    // are the SAME IEEE expression tree in both engines — identical
    // bits, no tolerance. Scale shape: one map-side-combined agg,
    // no joins, no windows.
    "q_linreg" -> Q(
      """SELECT l_suppkey, cast(n as bigint) AS n,
        |  (nd*sxy - sx*sy) / (nd*sx2 - sx*sx) AS slope,
        |  (sy - ((nd*sxy - sx*sy) / (nd*sx2 - sx*sx)) * sx) / nd AS intercept
        |FROM (
        |  SELECT l_suppkey, count(*) AS n, cast(count(*) as double) AS nd,
        |    cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |    cast(sum(x*y) as double) AS sxy, cast(sum(x*x) as double) AS sx2
        |  FROM (SELECT l_suppkey,
        |          cast(round(l_quantity, 0) as bigint) AS x,
        |          cast(floor(l_extendedprice) as bigint) AS y
        |        FROM lineitem WHERE l_suppkey <= 20)
        |  GROUP BY l_suppkey)
        |ORDER BY l_suppkey""".stripMargin) { (s, dir) =>
      olsFit(
        t(s, dir, "lineitem")
          .filter(col("l_suppkey") <= 20)
          .select(col("l_suppkey"),
            round(col("l_quantity"), 0).cast(LongType).as("x"),
            floor(col("l_extendedprice")).cast(LongType).as("y")),
        "l_suppkey")
        .orderBy(col("l_suppkey"))
    },

    // Mergeable-sketch rollup — THE pattern for distinct counting at
    // 100 TB: per-shard HLL sketches (here per nation) are built once,
    // then re-aggregated to any coarser grain (region) by sketch UNION
    // without touching the raw data again. A real deployment persists
    // the nation-level sketch table; every later rollup is sketch-sized,
    // not corpus-sized. DataSketches binary images are engine-specific,
    // so the sketch VALUE stays engine-local — the gate instead emits the
    // exact per-region distinct (hash-gated cross-engine) plus a boolean
    // pinning the sketch-union estimate within 5% of it (HLL lgK=12 ⇒
    // rsd ≈ 1.6%; 5% is a 3σ margin). The union machinery still runs and
    // any double-counting across shard sketches flips the boolean.
    "q_sketch_union" -> Q(
      """SELECT n_regionkey, count(DISTINCT c_custkey) AS n_exact, TRUE AS union_ok
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
      val perNation = base
        .groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      val unioned = perNation.groupBy(col("n_regionkey"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = base.groupBy(col("n_regionkey"))
        .agg(countDistinct(col("c_custkey")).as("n_exact"))
      unioned.join(exact, "n_regionkey")
        .select(col("n_regionkey"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            col("n_exact") * lit(0.05)).as("union_ok"))
        .orderBy(col("n_regionkey"))
    },

    // Pearson correlation with engine-portable determinism: built-in
    // corr() accumulates floats in partition order (never hash-matches
    // across engines), so the five moment components are summed as EXACT
    // decimals first, cast to double (value-based, identical in both
    // engines), and only then combined with exactly-rounded IEEE ops
    // (+ - * / sqrt — the q_agg_moments discipline). The emitted value is
    // ppm-floored: DuckDB's decimal->double cast can differ from Java's
    // correctly-rounded conversion by an ulp, and the cancellation in
    // n*sxx - sx*sx amplifies it into the last few bits (observed 4e-13);
    // ppm quantization absorbs it. Partial aggregation
    // still combines map-side; at extreme scale the decimal(38,8)
    // product sums need a magnitude check (they hold to ~1e29 row-sums).
    "q_agg_corr" -> Q(
      """SELECT l_returnflag, cast(n as bigint) AS n,
        |  cast(floor(((n_d*sxy - sx*sy)
        |    / (sqrt(n_d*sxx - sx*sx) * sqrt(n_d*syy - sy*sy))) * 1000000)
        |    as bigint) AS corr_ppm
        |FROM (
        |  SELECT l_returnflag, count(*) AS n, cast(count(*) as double) AS n_d,
        |    cast(sum(cast(l_quantity as decimal(19,4))) as double) AS sx,
        |    cast(sum(cast(l_extendedprice as decimal(19,4))) as double) AS sy,
        |    cast(sum(cast(l_quantity as decimal(19,4))
        |             * cast(l_extendedprice as decimal(19,4))) as double) AS sxy,
        |    cast(sum(cast(l_quantity as decimal(19,4))
        |             * cast(l_quantity as decimal(19,4))) as double) AS sxx,
        |    cast(sum(cast(l_extendedprice as decimal(19,4))
        |             * cast(l_extendedprice as decimal(19,4))) as double) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      // decimal(19) forces 128-bit storage in DuckDB (a (18,4)x(18,4)
      // product overflows its 64-bit path at runtime); Spark's decimal
      // math is exact at either width, so 19 keeps both engines exact
      val x = dec(col("l_quantity"), 19, 4)
      val y = dec(col("l_extendedprice"), 19, 4)
      val base = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count(lit(1)).cast(DoubleType).as("n_d"),
          sum(x).cast(DoubleType).as("sx"),
          sum(y).cast(DoubleType).as("sy"),
          sum(x * y).cast(DoubleType).as("sxy"),
          sum(x * x).cast(DoubleType).as("sxx"),
          sum(y * y).cast(DoubleType).as("syy"))
      val (nD, sx, sy, sxy, sxx, syy) = (col("n_d"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      base.select(col("l_returnflag"), col("n"),
        floor(((nD * sxy - sx * sy)
          / (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy))) * 1000000)
          .cast(LongType).as("corr_ppm"))
        .orderBy(col("l_returnflag"))
    },

    // Time-hierarchy rollup (day→month→year is THE warehouse reporting
    // hierarchy): one pass emits hour-of-day totals, per-day subtotals,
    // and the grand total via ROLLUP over the derived calendar columns.
    // Same partial-agg shape as q_agg_rollup; the calendar derivation is
    // a narrow projection the scan pruning sees through.
    "q_agg_time_rollup" -> Q(
      s"""SELECT cast(day_of_ts as date) AS day_of_ts, hr,
         |  grouping(day_of_ts, hr) AS gid, count(*) AS n,
         |  ${Exact.oIntScaled("sum(cast(value as decimal(18,6)))", 30, 6)}
         |    AS sum_value
         |FROM (SELECT date_trunc('day', ts) AS day_of_ts,
         |        cast(hour(ts) as int) AS hr, value FROM events)
         |GROUP BY ROLLUP(day_of_ts, hr)
         |ORDER BY gid, day_of_ts NULLS FIRST, hr NULLS FIRST""".stripMargin) { (s, dir) =>
      Engine.table(s, dir, "events")
        .select(date_trunc("day", col("ts")).cast(DateType).as("day_of_ts"),
          hour(col("ts")).as("hr"), col("value"))
        .rollup(col("day_of_ts"), col("hr"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Exact.intScaled(sum(dec(col("value"), 18, 6)), 30, 6).as("sum_value"))
        .select(col("day_of_ts"), col("hr"), col("gid"), col("n"), col("sum_value"))
        .orderBy(col("gid"), col("day_of_ts").asc_nulls_first,
          col("hr").asc_nulls_first)
    },

    // Exact per-group mode with a deterministic tiebreak. Built-in mode()
    // leaves ties engine-defined (DuckDB and Spark disagree), so both
    // sides compute it as count-then-rank with the value as tiebreak —
    // two partial-aggregable shuffles ((grp, val) then grp), no window
    // over raw rows; the rank window runs on the (grp, value) aggregate,
    // whose cardinality is bounded by distinct values per group.
    "q_agg_mode" -> Q(
      """SELECT l_returnflag, l_linenumber AS mode_linenumber, n FROM (
        |  SELECT l_returnflag, l_linenumber, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY n DESC, l_linenumber) AS rk
        |  FROM (SELECT l_returnflag, l_linenumber, count(*) AS n
        |        FROM lineitem GROUP BY l_returnflag, l_linenumber))
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Engine.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("n").desc, col("l_linenumber"))))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_linenumber").as("mode_linenumber"),
          col("n"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate percentiles (the mergeable-quantile-sketch tier for
    // monitoring dashboards at scale — exact quantiles need a full sort,
    // the sketch merges map-side). Sketch values are engine-specific AND
    // an array<double> column crashes the driver's comparator, so the
    // gate emits SCALARS only: exact group keys + counts (hash-gated
    // cross-engine) and one boolean per percentile checking the sketch
    // value against exact-percentile bounds at ±1% rank slack — the GK
    // guarantee at accuracy 10000 is ±0.01% rank, a 100× margin, so the
    // booleans are deterministically TRUE (which the oracle pins).
    "q_agg_approx_pct" -> Q(
      """SELECT l_returnflag, count(*) AS n,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val price = col("l_extendedprice")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(price,
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
          percentile(price, lit(0.49)).as("lo50"),
          percentile(price, lit(0.51)).as("hi50"),
          percentile(price, lit(0.89)).as("lo90"),
          percentile(price, lit(0.91)).as("hi90"),
          percentile(price, lit(0.98)).as("lo99"),
          percentile(price, lit(1.00)).as("hi99"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          element_at(col("ap"), 1).between(col("lo50"), col("hi50")).as("p50_ok"),
          element_at(col("ap"), 2).between(col("lo90"), col("hi90")).as("p90_ok"),
          element_at(col("ap"), 3).between(col("lo99"), col("hi99")).as("p99_ok"))
        .orderBy(col("l_returnflag"))
    },

    // LISTAGG (Redshift string aggregation): deterministic via sorted
    // collect — Spark's collect_list has no intrinsic order, so the sort
    // happens on the collected array; the oracle orders inside string_agg.
    "q_string_agg" -> Q(
      """SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment")).distinct()
        .groupBy(col("c_nationkey"))
        .agg(array_join(array_sort(collect_list(col("c_mktsegment"))), ",").as("segs"))
        .orderBy(col("c_nationkey"))
    },

    // RATIO_TO_REPORT (Redshift-specific window function): each row's
    // share of its partition total. Spark has no built-in — the rewrite
    // is value / sum(value) OVER (PARTITION BY ...), which is also its
    // definition. Determinism discipline: the partition total is an exact
    // decimal sum cast to double (order-independent), the quotient is one
    // exactly-rounded IEEE divide, and the emitted share is ppm-FLOORED
    // (the q_agg_corr rule: DuckDB's decimal→double cast can sit an ulp
    // off Java's; ppm quantization absorbs it).
    "q_ratio_report" -> Q(
      """SELECT c_nationkey, c_custkey,
        |  cast(floor(1000000.0 * cast(cast(c_acctbal as decimal(18,4)) as double)
        |    / nullif(cast(sum(cast(c_acctbal as decimal(18,4))) OVER (PARTITION BY c_nationkey) as double), 0.0)) as bigint)
        |    AS ratio_ppm
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val exact = col("c_acctbal").cast(DecimalType(18, 4))
      // nullif guards an exactly-zero partition total (data-possible with
      // negative balances): NULL share on BOTH engines, where a raw /0
      // would diverge — Spark floors ±Infinity to Long extremes while
      // DuckDB hard-errors casting it to bigint
      t(s, dir, "customer")
        .withColumn("total", nullif(
          sum(exact).over(Window.partitionBy(col("c_nationkey"))).cast("double"),
          lit(0.0)))
        .select(col("c_nationkey"), col("c_custkey"),
          floor(lit(1000000.0) * exact.cast("double") / col("total"))
            .cast(LongType).as("ratio_ppm"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },

    // ---- window functions -------------------------------------------

    // Exact quantiles at DYADIC points over integer values: both engines
    // interpolate x_k + f·(x_{k+1} − x_k) with f ∈ {0, ¼, ½, ¾} — every
    // term exact in double for bigint inputs, so Spark's percentile and
    // DuckDB's quantile_cont agree bit-for-bit. (Non-dyadic quantiles or
    // float inputs would round differently — deliberately out of scope.)
    // Scale note: exact percentile sorts per group in one pass — fine for
    // bounded groups; unbounded cardinalities switch to approx_percentile.
    "q_agg_quantile" -> Q(
      """SELECT l_returnflag,
        |  quantile_cont(cast(round(l_quantity, 0) as bigint), 0.25) AS p25,
        |  quantile_cont(cast(round(l_quantity, 0) as bigint), 0.50) AS p50,
        |  quantile_cont(cast(round(l_quantity, 0) as bigint), 0.75) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val qty = round(col("l_quantity"), 0).cast(LongType)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile(qty, lit(0.25)).as("p25"),
          percentile(qty, lit(0.50)).as("p50"),
          percentile(qty, lit(0.75)).as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // FILTER-clause aggregates (conditional aggregation): the Scala form
    // is the count/sum-over-when equivalent — null-skipping makes them
    // identical; integer-exact values keep the oracle bit-stable.
    "q_agg_filter" -> Q(
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25.0) AS n_big,
        |  cast(sum(cast(round(l_quantity, 0) as bigint))
        |       FILTER (WHERE l_discount > 0.05) as bigint) AS qty_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("l_quantity") > 25.0, lit(1))).as("n_big"),
          sum(when(col("l_discount") > 0.05,
            round(col("l_quantity"), 0).cast(LongType))).as("qty_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // Ranking family. rank/dense_rank computed over a bucketed (tie-rich)
    // key; row_number/ntile over a fully tiebroken order so output is
    // deterministic.
    "q_win_rank" -> Q(
      """SELECT o_orderkey, o_orderstatus, bucket,
        |  row_number() OVER w2 AS rn, rank() OVER w1 AS rk,
        |  dense_rank() OVER w1 AS drk, ntile(4) OVER w2 AS nt
        |FROM (SELECT o_orderkey, o_orderstatus,
        |        cast(floor(o_totalprice / 50000.0) as bigint) AS bucket
        |      FROM orders WHERE o_totalprice > 350000.0)
        |WINDOW w1 AS (PARTITION BY o_orderstatus ORDER BY bucket DESC),
        |       w2 AS (PARTITION BY o_orderstatus ORDER BY bucket DESC, o_orderkey)
        |ORDER BY o_orderstatus, rn""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "orders")
        .filter(col("o_totalprice") > 350000.0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") / 50000.0).cast(LongType).as("bucket"))
      val w1 = Window.partitionBy(col("o_orderstatus")).orderBy(col("bucket").desc)
      val w2 = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("bucket").desc, col("o_orderkey"))
      // Spark ranking fns are INT, DuckDB's are BIGINT — cast for parity.
      base.select(
        col("o_orderkey"), col("o_orderstatus"), col("bucket"),
        row_number().over(w2).cast(LongType).as("rn"),
        rank().over(w1).cast(LongType).as("rk"),
        dense_rank().over(w1).cast(LongType).as("drk"),
        ntile(4).over(w2).cast(LongType).as("nt"))
        .orderBy(col("o_orderstatus"), col("rn"))
    },

    // Analytic family: lag/lead/first_value/last_value per customer order
    // history (explicit full frame for last_value in both engines).
    "q_win_analytic" -> Q(
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice)
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // IGNORE NULLS analytics (round 7 continuation) — the Redshift window
    // dialect's sparse-series tools: last_value(... IGNORE NULLS) as
    // forward fill and lag(... IGNORE NULLS) as previous-non-null, over a
    // deterministically-sparsified value column ('view' events carry no
    // value). Both engines support IGNORE NULLS natively; values pass
    // through unchanged (no arithmetic — hash-safe doubles). Scale shape:
    // one hash partition on user_id, both windows share the single
    // (ts, event_id) sort; per-user state is O(1) per row.
    "q_win_ignore_nulls" -> Q(
      """WITH n AS (SELECT event_id, user_id, ts,
        |    CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id, v,
        |  last_value(v IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  lag(v, 1, NULL IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_nn
        |FROM n ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Engine.table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "view", lit(null)).otherwise(col("value"))
            .as("v"))
        .select(col("event_id"), col("user_id"), col("v"),
          last(col("v"), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("filled"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_nn"),
          col("ts"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
        .drop("ts")
    },

    // Frames: running total (ROWS UNBOUNDED PRECEDING), moving window
    // (ROWS 3 PRECEDING), RANGE frame — integer-valued quantities keep the
    // sliding-frame aggregation exact in both engines (DuckDB's segment
    // tree vs Spark's running accumulation would diverge on raw doubles).
    "q_win_frame" -> Q(
      """SELECT l_suppkey, l_orderkey, l_linenumber, qty,
        |  cast(sum(qty) OVER (PARTITION BY l_suppkey
        |                 ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                 ROWS UNBOUNDED PRECEDING) as bigint) AS running_qty,
        |  cast(sum(qty) OVER (PARTITION BY l_suppkey
        |                 ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) as bigint) AS moving_qty,
        |  count(*) OVER (PARTITION BY l_suppkey ORDER BY qty
        |                 RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_similar
        |FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |        cast(round(l_quantity, 0) as bigint) AS qty
        |      FROM lineitem WHERE l_suppkey <= 10)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 10)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), round(col("l_quantity"), 0).cast(LongType).as("qty"))
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      base.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("qty"),
        sum(col("qty")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_qty"),
        sum(col("qty")).over(ord.rowsBetween(-3, Window.currentRow)).as("moving_qty"),
        count(lit(1)).over(Window.partitionBy(col("l_suppkey")).orderBy(col("qty"))
          .rangeBetween(-5, Window.currentRow)).as("n_similar"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // Distribution family: percent_rank/cume_dist are exact rationals of
    // partition counts (identical double division in both engines);
    // nth_value pinned with a full frame + unique ordering.
    "q_win_dist" -> Q(
      """SELECT o_orderkey, o_orderstatus,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  nth_value(o_orderkey, 2)
        |    OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders WHERE o_totalprice > 400000.0
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).as("quartile"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // ---- sorts / limits / top-k -------------------------------------

    "q_sort" -> Q(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC NULLS LAST, c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey"))
    },

    "q_limit_offset" -> Q(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(50).limit(100)
    },

    // Top-k per group: window row_number + filter — the scalable pattern
    // (no global sort; per-partition heaps via WindowExec after a single
    // hash repartition on the group key).
    "q_topk" -> Q(
      """SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    cast(row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_totalprice DESC, o_orderkey) as bigint) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderstatus, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast(LongType).as("rn"))
        .filter(col("rn") <= 3)
        .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderstatus"), col("rn"))
    },

    // Time-interval RANGE window frames (round 8): per-user rolling
    // 1-hour event count + exact-decimal value sum — the time-based
    // sliding aggregate an activity/rate-limit monitor computes, and a
    // window dialect q_win_frame's integer RANGE does not cover. RANGE
    // frames are peer-inclusive, so rows sharing (user_id, ts) get the
    // identical value in both engines regardless of tie order; the
    // output ORDER BY adds event_id for the total order the gate needs.
    // Scale shape: one hash partition on user_id + one per-user time
    // sort; the frame bound evicts incrementally (no per-row rescan).
    "q_win_range_interval" -> Q(
      """SELECT user_id, ts, event_id,
        |  cast(count(*) OVER w as bigint) AS n_last_hour,
        |  cast(cast(sum(cast(value as decimal(18,4))) OVER w
        |       as decimal(30,4)) as double) AS val_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
      val w = "(PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr(s"cast(count(*) OVER $w as bigint)").as("n_last_hour"),
          expr(s"cast(cast(sum(cast(value as decimal(18,4))) OVER $w " +
            "as decimal(30,4)) as double)").as("val_last_hour"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // ---- set operations ---------------------------------------------

    "q_union" -> Q(
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
        .select(col("c_nationkey").as("nationkey"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      a.union(b).distinct().orderBy(col("nationkey"))
    },

    // UNION ALL keeps duplicates — aggregate after the bag union so the
    // result is order-insensitive and the multiset semantics observable.
    "q_union_all" -> Q(
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey FROM supplier)
        |GROUP BY nationkey ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      a.union(b).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    },

    "q_intersect" -> Q(
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
        .select(col("c_nationkey").as("nationkey"))
      val b = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      a.intersect(b).orderBy(col("nationkey"))
    },

    // EXCEPT (=MINUS) — set semantics; keys chosen so the result is
    // non-empty (custkeys 0..119 minus suppkeys 0..99 → 20 rows).
    "q_except" -> Q(
      """SELECT c_custkey AS k FROM customer WHERE c_custkey < 120
        |EXCEPT
        |SELECT s_suppkey FROM supplier
        |ORDER BY k""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "customer").filter(col("c_custkey") < 120)
        .select(col("c_custkey").as("k"))
      val b = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
      a.except(b).orderBy(col("k"))
    },

    // Weighted median (round 7): per return flag, the smallest quantity
    // whose cumulative revenue weight reaches half the group total — the
    // order-statistic that answers "what quantity level splits revenue in
    // half", which a plain median (row-weighted) misstates. Weights are
    // exact integer cents (bounded decimal cast ×100), the crossing test
    // is 2·cum ≥ total in integers, and the per-value pre-aggregation
    // makes the cumulative sum independent of intra-value row order —
    // fully deterministic on both engines. Scale shape: one hash agg to
    // ~50 (flag, qty) cells, then a window over value-count-sized groups
    // (never the raw fact rows), then one row per flag.
    "q_weighted_median" -> Q(
      """WITH wv AS (
        |  SELECT l_returnflag, cast(round(l_quantity, 0) as bigint) AS qty,
        |    cast(sum(cast(cast(l_extendedprice as decimal(12,2)) * 100
        |      as decimal(20,0))) as bigint) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, qty, w,
        |        sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty
        |                     ROWS UNBOUNDED PRECEDING) AS cw,
        |        sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |      FROM wv)
        |SELECT l_returnflag, min(qty) AS w_median_qty,
        |  cast(min(tw) as bigint) AS total_cents
        |FROM c WHERE 2 * cw >= tw
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val wv = Engine.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          round(col("l_quantity"), 0).cast(LongType).as("qty"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast(DecimalType(20, 0))).cast(LongType).as("w"))
      val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("l_returnflag"))
      wv.withColumn("cw", sum(col("w")).over(wCum))
        .withColumn("tw", sum(col("w")).over(wTot))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("qty")).as("w_median_qty"),
          min(col("tw")).as("total_cents"))
        .orderBy(col("l_returnflag"))
    },

    // RFM customer segmentation (round 8 continuation): the classic
    // marketing-warehouse rollup — per customer recency (days since last
    // order, vs the corpus max date), frequency (order count), monetary
    // (exact-decimal lifetime spend) — each scored 1-4 by quartile, then
    // segment-level counts + spend. Quartile boundaries are ANSI discrete
    // percentiles (elements of the input — exact bigints / 2dp doubles,
    // the q_pctl_disc precedent; the oracle states the cume_dist
    // definition, the graded plan uses the percentile_disc AGGREGATE so
    // no global window ever runs). Scale shape: one customer-keyed agg,
    // a 1-row broadcast of the max date and of the 9 boundary values
    // (crossJoin(broadcast(tiny)) — the legal BNLJ), one segment agg.
    // Monetary re-aggregates through bounded decimals (Exact policy).
    // The nine percentile_disc buffers are customer-table-sized
    // (measured sub-second at the synthetic sf1.0); past ~1e9 customers
    // move the monetary boundary to the q_bin_equidepth value-cell form
    // (recency/frequency domains are calendar/count-bounded already) or
    // Scale.rankGlobal.
    "q_rfm" -> Q(
      """WITH cust AS MATERIALIZED (
        |  SELECT o_custkey,
        |    cast(datediff('day', max(cast(o_orderdate as date)),
        |      (SELECT max(cast(o_orderdate as date)) FROM orders)) as bigint)
        |      AS recency_d,
        |    cast(count(*) as bigint) AS frequency,
        |    cast(cast(sum(cast(o_totalprice as decimal(18,4))) as decimal(30,2))
        |      as double) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |b AS (SELECT
        |    min(CASE WHEN cdr >= 0.25 THEN recency_d END) AS r1,
        |    min(CASE WHEN cdr >= 0.50 THEN recency_d END) AS r2,
        |    min(CASE WHEN cdr >= 0.75 THEN recency_d END) AS r3,
        |    min(CASE WHEN cdf >= 0.25 THEN frequency END) AS f1,
        |    min(CASE WHEN cdf >= 0.50 THEN frequency END) AS f2,
        |    min(CASE WHEN cdf >= 0.75 THEN frequency END) AS f3,
        |    min(CASE WHEN cdm >= 0.25 THEN monetary END) AS m1,
        |    min(CASE WHEN cdm >= 0.50 THEN monetary END) AS m2,
        |    min(CASE WHEN cdm >= 0.75 THEN monetary END) AS m3
        |  FROM (SELECT recency_d, frequency, monetary,
        |          cume_dist() OVER (ORDER BY recency_d) AS cdr,
        |          cume_dist() OVER (ORDER BY frequency) AS cdf,
        |          cume_dist() OVER (ORDER BY monetary) AS cdm
        |        FROM cust)),
        |s AS (SELECT
        |    CASE WHEN recency_d <= b.r1 THEN 4 WHEN recency_d <= b.r2 THEN 3
        |         WHEN recency_d <= b.r3 THEN 2 ELSE 1 END AS r_score,
        |    CASE WHEN frequency <= b.f1 THEN 1 WHEN frequency <= b.f2 THEN 2
        |         WHEN frequency <= b.f3 THEN 3 ELSE 4 END AS f_score,
        |    CASE WHEN monetary <= b.m1 THEN 1 WHEN monetary <= b.m2 THEN 2
        |         WHEN monetary <= b.m3 THEN 3 ELSE 4 END AS m_score,
        |    monetary
        |  FROM cust, b)
        |SELECT cast(r_score as int) AS r_score, cast(f_score as int) AS f_score,
        |  cast(m_score as int) AS m_score,
        |  cast(count(*) as bigint) AS n_customers,
        |  cast(cast(sum(cast(monetary as decimal(18,2))) as decimal(30,2))
        |    as double) AS monetary_sum
        |FROM s GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val dmax = orders.agg(max(to_date(col("o_orderdate"))).as("dmax"))
      orders
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("frequency"),
          sumMoney(col("o_totalprice")).as("monetary"))
        .crossJoin(broadcast(dmax))
        .select(datediff(col("dmax"), col("last_d")).cast(LongType)
          .as("recency_d"), col("frequency"), col("monetary"))
        .createOrReplaceTempView("graft_rfm_cust")
      s.sql(
        """WITH b AS (SELECT
          |    cast(percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_d)
          |      as bigint) AS r1,
          |    cast(percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_d)
          |      as bigint) AS r2,
          |    cast(percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_d)
          |      as bigint) AS r3,
          |    cast(percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency)
          |      as bigint) AS f1,
          |    cast(percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency)
          |      as bigint) AS f2,
          |    cast(percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency)
          |      as bigint) AS f3,
          |    percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary) AS m1,
          |    percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary) AS m2,
          |    percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary) AS m3
          |  FROM graft_rfm_cust)
          |SELECT cast(CASE WHEN recency_d <= b.r1 THEN 4
          |                 WHEN recency_d <= b.r2 THEN 3
          |                 WHEN recency_d <= b.r3 THEN 2 ELSE 1 END as int)
          |    AS r_score,
          |  cast(CASE WHEN frequency <= b.f1 THEN 1 WHEN frequency <= b.f2 THEN 2
          |            WHEN frequency <= b.f3 THEN 3 ELSE 4 END as int) AS f_score,
          |  cast(CASE WHEN monetary <= b.m1 THEN 1 WHEN monetary <= b.m2 THEN 2
          |            WHEN monetary <= b.m3 THEN 3 ELSE 4 END as int) AS m_score,
          |  count(*) AS n_customers,
          |  cast(cast(sum(cast(monetary as decimal(18,2))) as decimal(30,2))
          |    as double) AS monetary_sum
          |FROM graft_rfm_cust, b GROUP BY 1, 2, 3
          |ORDER BY r_score, f_score, m_score""".stripMargin)
    },

    // Equi-depth decile binning (round 8 continuation): the
    // feature-discretization primitive — 9 ANSI discrete decile
    // boundaries over exact integer cents, bin = 1 + number of
    // boundaries strictly below the value (ties share a bin by
    // construction, so the assignment is deterministic), per-bin count /
    // range / mass. q_histogram's equi-WIDTH sibling. Both engines build
    // the bin rule from the SAME generated boundary expressions (one
    // Scala generator, no drift). Scale shape: the graded plan computes
    // all nine boundaries from ONE value-cell pass — per-cents counts
    // (map-side combinable), a cumulative window over the DOMAIN-bounded
    // distinct-cents table (2dp prices: value cells track the price
    // range, not the order count — the q_weighted_median discipline),
    // and a conditional min per decile with the exact rational crossing
    // test 10·cum ≥ i·n (≡ cume_dist ≥ i/10: the gap between any other
    // cum/n and i/10 is ≥ 1/(10n), far above double rounding). Nine
    // separate percentile_disc aggregates were measured 10-16 s at the
    // synthetic sf1.0 — each buffers the FULL value multiset in the
    // single global-group reducer, nine times over — vs ~0.5 s for this
    // form; the oracle states the cume_dist definition directly. The
    // per-bin rollup also runs on value cells (count/sum weighted by
    // cnt). Boundaries ride crossJoin(broadcast(1-row)) — the legal
    // BNLJ. cents sums stay < 2^63 at graded SFs; a 100 TB deployment
    // lifts sum_cents to decimal(38,0) (q_rarity_score discipline).
    "q_bin_equidepth" -> Q(
      s"""WITH v AS (SELECT cast(cast(o_totalprice as decimal(12,2)) * 100
         |             as bigint) AS cents FROM orders),
         |b AS (SELECT
         |    ${(1 to 9).map(i =>
               s"min(CASE WHEN cd >= 0.$i THEN cents END) AS b$i")
               .mkString(",\n         |    ")}
         |  FROM (SELECT cents, cume_dist() OVER (ORDER BY cents) AS cd
         |        FROM v)),
         |s AS (SELECT cents, 1 + ${(1 to 9).map(i =>
               s"(CASE WHEN cents > b.b$i THEN 1 ELSE 0 END)")
               .mkString(" + ")} AS bin
         |      FROM v, b)
         |SELECT cast(bin as int) AS bin, cast(count(*) as bigint) AS n,
         |  min(cents) AS lo_cents, max(cents) AS hi_cents,
         |  cast(sum(cents) as bigint) AS sum_cents
         |FROM s GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      val vc = t(s, dir, "orders")
        .select((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(LongType).as("cents"))
        .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val n1 = vc.agg(sum(col("cnt")).as("n"))
      val b = vc
        // single-partition window is BENIGN here (WindowExec warns): its
        // input is the per-cents VALUE-CELL table after a map-side-
        // combined agg — bounded by the distinct price domain (~1e6
        // cells), never order rows (PlanAuditSpec bounded-window list)
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(n1))
        .agg(
          min(when(col("cum") * 10 >= col("n") * 1, col("cents"))).as("b1"),
          (2 to 9).map(i =>
            min(when(col("cum") * 10 >= col("n") * i, col("cents")))
              .as(s"b$i")): _*)
      val bin = (lit(1) + (1 to 9).map(i =>
        when(col("cents") > col(s"b$i"), 1).otherwise(0)).reduce(_ + _))
        .cast(IntegerType)
      vc.crossJoin(broadcast(b))
        .withColumn("bin", bin)
        .groupBy(col("bin"))
        .agg(sum(col("cnt")).as("n"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"),
          sum(col("cents") * col("cnt")).as("sum_cents"))
        .orderBy(col("bin"))
    },

    // Revenue-concentration audit (round 8 continuation): the 80/20
    // (Lorenz) readout — what share of total revenue the top-decile
    // customers carry. "Top decile" is every customer at or above the
    // ANSI discrete 90th-percentile spend boundary (an element of the
    // input; ties INCLUDE, so the set is deterministic without any
    // per-customer ranking). All exact integer cents; the share ratio is
    // decimal(38,0)/HUGEINT-lifted before the ×1e6 (sum·1e6 passes 2^63
    // near 1e12 order cents). Scale shape: one customer-keyed agg, a
    // 1-row ordered-set boundary broadcast (the legal BNLJ), one
    // conditional global agg — no window ever touches the customer set.
    "q_pareto_share" -> Q(
      """WITH cust AS MATERIALIZED (
        |  SELECT o_custkey,
        |    cast(sum(cast(cast(o_totalprice as decimal(12,2)) * 100
        |      as decimal(20,0))) as bigint) AS cents
        |  FROM orders GROUP BY o_custkey),
        |b AS (SELECT min(CASE WHEN cd >= 0.9 THEN cents END) AS b90
        |      FROM (SELECT cents, cume_dist() OVER (ORDER BY cents) AS cd
        |            FROM cust))
        |SELECT cast(count(*) as bigint) AS n_customers,
        |  cast(count(CASE WHEN cents >= b.b90 THEN 1 END) as bigint) AS n_top,
        |  max(b.b90) AS boundary_cents,
        |  cast((cast(1000000 as hugeint)
        |        * sum(CASE WHEN cents >= b.b90 THEN cents ELSE 0 END))
        |       // sum(cents) as bigint) AS top_share_ppm
        |FROM cust, b ORDER BY n_customers""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(DecimalType(20, 0))).cast(LongType).as("cents"))
        .createOrReplaceTempView("graft_pareto_cust")
      s.sql(
        """WITH b AS (SELECT cast(percentile_disc(0.9)
          |    WITHIN GROUP (ORDER BY cents) as bigint) AS b90
          |  FROM graft_pareto_cust)
          |SELECT count(*) AS n_customers,
          |  count(CASE WHEN cents >= b.b90 THEN 1 END) AS n_top,
          |  max(b.b90) AS boundary_cents,
          |  cast((cast(1000000 as decimal(38,0))
          |        * sum(CASE WHEN cents >= b.b90 THEN cents ELSE 0 END))
          |       div sum(cents) as bigint) AS top_share_ppm
          |FROM graft_pareto_cust, b ORDER BY n_customers""".stripMargin)
    },

    // Month-over-month growth curve (round 8 continuation): monthly
    // exact-cents revenue plus the MoM ratio in ppm — the trend readout
    // every revenue dashboard opens with. The ratio is cur·1e6 div prev
    // over POSITIVE integers only (a signed growth delta would hit the
    // div-vs-// rounding divergence on negatives: Spark `div` truncates
    // toward zero, DuckDB `//` floors), decimal(38,0)/HUGEINT-lifted.
    // Scale shape: one map-side-combined month agg; the lag window runs
    // on the CALENDAR-sized month table, never order rows.
    "q_growth_rate" -> Q(
      """WITH m AS (
        |  SELECT cast(date_trunc('month', o_orderdate) as date) AS month,
        |    cast(sum(cast(cast(o_totalprice as decimal(12,2)) * 100
        |      as decimal(20,0))) as bigint) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT month, rev_cents,
        |  lag(rev_cents) OVER (ORDER BY month) AS prev_cents,
        |  CASE WHEN lag(rev_cents) OVER (ORDER BY month) IS NULL
        |         OR lag(rev_cents) OVER (ORDER BY month) = 0 THEN NULL
        |       ELSE cast((cast(1000000 as hugeint) * rev_cents)
        |            // lag(rev_cents) OVER (ORDER BY month) as bigint)
        |       END AS ratio_ppm
        |FROM m ORDER BY month""".stripMargin) { (s, dir) =>
      // to_date on the Spark side / cast(... as date) in the oracle:
      // Spark's date_trunc returns TIMESTAMP while DuckDB's returns
      // DATE — cast BOTH so the gate's TYPE invariant holds without
      // relying on driver dtype coercion (q_cohort precedent).
      val m = t(s, dir, "orders")
        .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast(DecimalType(20, 0))).cast(LongType).as("rev_cents"))
      // single-partition lag window is BENIGN (WindowExec warns): input
      // is the monthly agg — CALENDAR-sized (≤ a few thousand rows for
      // any horizon), never order rows (PlanAuditSpec bounded-window list)
      val w = Window.orderBy(col("month"))
      m.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
        .withColumn("ratio_ppm",
          when(col("prev_cents").isNull || col("prev_cents") === 0, lit(null))
            .otherwise(expr("cast((cast(1000000 as decimal(38,0)) * rev_cents)" +
              " div prev_cents as bigint)")))
        .select(col("month"), col("rev_cents"), col("prev_cents"),
          col("ratio_ppm"))
        .orderBy(col("month"))
    }
  )

  /** q_linreg core over any (key, x, y) frame with INTEGER x/y: per-key
    * OLS fit y = slope·x + intercept from exact integer sums (every
    * aggregated sum must stay under 2^53 — the caller controls magnitudes
    * and per-key cardinality), closed with a fixed IEEE expression tree
    * so the doubles are engine-portable (q_agg_moments discipline).
    * One map-side-combined aggregation, no joins.
    */
  def olsFit(df: DataFrame, key: String): DataFrame = {
    val base = df.groupBy(col(key))
      .agg(count(lit(1)).as("n"),
        count(lit(1)).cast(DoubleType).as("nd"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum(col("x") * col("y")).cast(DoubleType).as("sxy"),
        sum(col("x") * col("x")).cast(DoubleType).as("sx2"))
    val (nd, sx, sy, sxy, sx2) =
      (col("nd"), col("sx"), col("sy"), col("sxy"), col("sx2"))
    val slope = (nd * sxy - sx * sy) / (nd * sx2 - sx * sx)
    base.select(col(key), col("n"), slope.as("slope"),
      ((sy - slope * sx) / nd).as("intercept"))
  }
}
