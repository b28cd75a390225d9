package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.{Engine, Q}

/** Additional delegated-SQL surface (reachable through the reference's
  * passthrough, `core.py:84`): pivot/crosstab, CTEs, scalar subqueries.
  */
object SqlSurface {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  val queries: Map[String, Q] = Map(

    // TPC-H Q3 shape (shipping priority): the classic 3-table analytic a
    // warehouse user runs through the reference's SQL passthrough —
    // selective dim filter, two fact joins, exact-decimal revenue, global
    // top-10. Scale shape: customer filter pushed to its scan and
    // broadcast; orders⋈lineitem is the one fact-fact shuffle (AQE
    // re-plans from runtime sizes); top-10 via TakeOrdered, no global
    // sort. Revenue is bit-exact (Exact.sumRevenue), so rank order is
    // engine-deterministic with the orderkey tiebreak.
    "q_tpch_q3" -> Q(
      s"""SELECT l_orderkey, ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |              JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < timestamp '1998-01-01 00:00:00'
         |  AND l_shipdate > timestamp '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(expr("o_orderdate < timestamp '1998-01-01 00:00:00'"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .filter(expr("l_shipdate > timestamp '1998-01-01 00:00:00'"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape (local supplier volume): five-way star join where
    // customer and supplier must share a nation, revenue per nation in a
    // region-year slice. region/nation/supplier broadcast; lineitem⋈orders
    // and the customer join are the shuffles. The c_nationkey=s_nationkey
    // predicate rides the supplier join as an equi-key, not a filter-after
    // cross.
    "q_tpch_q5" -> Q(
      s"""SELECT n_name, ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM region JOIN nation ON n_regionkey = r_regionkey
         |            JOIN customer ON c_nationkey = n_nationkey
         |            JOIN orders ON o_custkey = c_custkey
         |            JOIN lineitem ON l_orderkey = o_orderkey
         |            JOIN supplier ON s_suppkey = l_suppkey
         |                         AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= timestamp '1997-01-01 00:00:00'
         |  AND o_orderdate < timestamp '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val nations = broadcast(
        t(s, dir, "region").filter(col("r_name") === "ASIA")
          .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey")))
      t(s, dir, "customer")
        .join(nations, col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .filter(expr("o_orderdate >= timestamp '1997-01-01 00:00:00'")
          && expr("o_orderdate < timestamp '1998-01-01 00:00:00'"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("s_suppkey") === col("l_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q7-shaped composite (round 7): bilateral shipping volume
    // between two nations by ship year — the multi-join + OR-pair
    // predicate planner exercise. The OR over (supp, cust) nation pairs
    // cannot push into either dimension alone, but it IMPLIES
    // n_name ∈ {A, B} on both sides, so each nation dim is prefiltered
    // to 2 rows and broadcast (with supplier riding the broadcast too);
    // only the orders⋈lineitem fact-fact edge shuffles. The year comes
    // off l_shipdate (cast long — DuckDB date parts are BIGINT);
    // revenue via the bounded-decimal Exact chain.
    "q_tpch_q7" -> Q(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  count(*) AS n,
         |  ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
         |              JOIN nation n1 ON n1.n_nationkey = s_nationkey
         |              JOIN orders ON o_orderkey = l_orderkey
         |              JOIN customer ON c_custkey = o_custkey
         |              JOIN nation n2 ON n2.n_nationkey = c_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate >= timestamp '1996-01-01 00:00:00'
         |  AND l_shipdate < timestamp '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val picked = Seq("NATION_1", "NATION_2")
      val n1 = t(s, dir, "nation").filter(col("n_name").isin(picked: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").filter(col("n_name").isin(picked: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = broadcast(t(s, dir, "supplier")
        .join(n1, col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation")))
      val cust = t(s, dir, "customer")
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1996-01-01 00:00:00'")
          && expr("l_shipdate < timestamp '1998-01-01 00:00:00'"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(count(lit(1)).as("n"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // TPC-H Q8 shape (national market share): one nation's share of the
    // region's revenue in a product segment, by order year — the classic
    // 7-table planner benchmark plus a conditional-aggregate ratio. The
    // share is exact end to end: both the CASE'd numerator and the
    // denominator stay bounded decimals through the sum, lift to
    // decimal(38) and close with ONE integer floor division to ppm (the
    // q_rarity_score discipline — a double ratio of float sums would not
    // hash across engines). Scale shape: part (segment filter), the
    // ASIA customer-nation dim and the supplier⋈nation side all
    // broadcast; lineitem⋈orders is the only fact-fact shuffle; the
    // final agg is years-sized.
    "q_tpch_q8" -> Q(
      s"""SELECT year(o_orderdate) AS l_year,
         |  cast(count(*) as bigint) AS n,
         |  ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue,
         |  cast((cast(coalesce(sum(CASE WHEN sn.n_name = 'NATION_1'
         |            THEN cast(l_extendedprice as decimal(12,2))
         |                 * cast(1 - l_discount as decimal(4,2)) END), 0) * 10000
         |        as hugeint) * 1000000)
         |       // cast(sum(cast(l_extendedprice as decimal(12,2))
         |             * cast(1 - l_discount as decimal(4,2))) * 10000 as hugeint)
         |       as bigint) AS share_ppm
         |FROM part JOIN lineitem ON p_partkey = l_partkey
         |          JOIN orders ON o_orderkey = l_orderkey
         |          JOIN customer ON c_custkey = o_custkey
         |          JOIN nation cn ON cn.n_nationkey = c_nationkey
         |          JOIN region ON r_regionkey = cn.n_regionkey
         |          JOIN supplier ON s_suppkey = l_suppkey
         |          JOIN nation sn ON sn.n_nationkey = s_nationkey
         |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         |  AND o_orderdate >= timestamp '1996-01-01 00:00:00'
         |  AND o_orderdate < timestamp '1998-01-01 00:00:00'
         |GROUP BY 1 ORDER BY l_year""".stripMargin) { (s, dir) =>
      val custAsia = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .join(t(s, dir, "region"), col("r_regionkey") === col("n_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppN = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation").select(col("n_nationkey"),
          col("n_name").as("supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation")))
      val pp = broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey")))
      val term = Exact.dec(col("l_extendedprice"), 12, 2) *
        Exact.dec(lit(1.0) - col("l_discount"), 4, 2)
      t(s, dir, "lineitem")
        .join(pp, col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "orders")
          .filter(expr("o_orderdate >= timestamp '1996-01-01 00:00:00'")
            && expr("o_orderdate < timestamp '1998-01-01 00:00:00'"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .join(custAsia, col("c_custkey") === col("o_custkey"))
        .join(suppN, col("s_suppkey") === col("l_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("l_year"))
        .agg(
          count(lit(1)).as("n"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
            .as("revenue"),
          coalesce(sum(when(col("supp_nation") === "NATION_1", term)),
            lit(BigDecimal(0))).as("num_dec"),
          sum(term).as("den_dec"))
        .select(col("l_year"), col("n"), col("revenue"),
          // scale-0 integer lift BEFORE the floor division — decimal
          // division at fractional scales rounds differently across
          // engines (observed one-ulp ppm drift); integer div does not
          expr("cast((cast(num_dec * 10000 as decimal(38,0)) * 1000000) " +
            "div cast(den_dec * 10000 as decimal(38,0)) as bigint)")
            .as("share_ppm"))
        .orderBy(col("l_year"))
    },

    // TPC-H Q10 shape (returned-item reporting): which customers returned
    // the most revenue in a half-year window. Scale shape: revenue is
    // pre-aggregated per custkey BEFORE the customer join — the fact-fact
    // lineitem⋈orders edge shuffles once, then the agg collapses it to at
    // most |customers| rows, so the customer join input is
    // customer-cardinality, not lineitem-cardinality (at 100 TB the
    // difference is the whole query). nation broadcasts; top-20 is
    // TakeOrdered on the exact-decimal revenue with a custkey tiebreak.
    "q_tpch_q10" -> Q(
      s"""SELECT c_custkey, c_name,
         |  ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue,
         |  c_acctbal, n_name
         |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |              JOIN customer ON c_custkey = o_custkey
         |              JOIN nation ON n_nationkey = c_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= timestamp '1997-01-01 00:00:00'
         |  AND o_orderdate < timestamp '1997-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
          .filter(expr("o_orderdate >= timestamp '1997-01-01 00:00:00'")
            && expr("o_orderdate < timestamp '1997-07-01 00:00:00'"))
          .select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      rev.join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("n_nationkey") === col("c_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q17 shape (small-quantity-order revenue): revenue lost to
    // orders below 20% of a part's average order quantity. The correlated
    // scalar subquery (avg per part) is decorrelated by hand into an
    // aggregate-then-join-back — and the brand/size part filter is pushed
    // BELOW the per-part aggregate (broadcast semi shape), so the agg runs
    // over the selected parts' lineitems only, never the whole fact table.
    // The 0.2·avg comparison is integer-exact: qty < sum/(5·cnt) ⇔
    // 5·qty·cnt < sum over bigint quantities — no float threshold to
    // straddle engines (DuckDB's sum(BIGINT) is HUGEINT; the comparison is
    // exact in both). Single-row output via one final agg.
    "q_tpch_q17" -> Q(
      s"""WITH pp AS (SELECT p_partkey FROM part
         |            WHERE p_brand = 'Brand#4' AND p_size < 15),
         |l AS (SELECT l_partkey, cast(round(l_quantity, 0) as bigint) AS qty,
         |        l_extendedprice
         |      FROM lineitem JOIN pp ON p_partkey = l_partkey),
         |a AS (SELECT l_partkey, sum(qty) AS sq, count(*) AS cnt
         |      FROM l GROUP BY l_partkey)
         |SELECT cast(count(*) as bigint) AS n,
         |  ${Exact.oSumMoney("l_extendedprice")} AS total_price
         |FROM l JOIN a USING (l_partkey)
         |WHERE qty * 5 * cnt < sq ORDER BY n""".stripMargin) { (s, dir) =>
      val pp = broadcast(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#4" && col("p_size") < 15)
        .select(col("p_partkey")))
      val l = t(s, dir, "lineitem")
        .join(pp, col("p_partkey") === col("l_partkey"))
        .select(col("l_partkey"),
          expr("cast(round(l_quantity, 0) as bigint)").as("qty"),
          col("l_extendedprice"))
      val a = l.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cnt"))
      l.join(a, "l_partkey")
        .filter(col("qty") * lit(5L) * col("cnt") < col("sq"))
        .agg(count(lit(1)).as("n"),
          Exact.sumMoney(col("l_extendedprice")).as("total_price"))
    },

    // TPC-H Q18 shape (large-volume customers): orders whose total
    // quantity exceeds a threshold, with their customers. Scale shape: the
    // HAVING aggregate shuffles lineitem once on l_orderkey and collapses
    // it to the (rare) qualifying orders before any dimension is touched;
    // AQE then broadcasts that small set into orders and customer instead
    // of shuffling the dimensions. Quantities sum as bigint (integer-exact,
    // DuckDB's HUGEINT re-cast); o_totalprice passes through unchanged
    // (hash-safe); top-100 is TakeOrdered with full tiebreak.
    "q_tpch_q18" -> Q(
      """WITH big AS (
        |  SELECT l_orderkey, cast(sum(cast(round(l_quantity, 0) as bigint)) as bigint) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(cast(round(l_quantity, 0) as bigint)) > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |         JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("cast(round(l_quantity, 0) as bigint)")).as("sum_qty"))
        .filter(col("sum_qty") > 250L)
      big.join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q21 shape (suppliers who kept orders waiting): on orders with
    // 2+ suppliers, find the SOLE supplier whose shipment came last —
    // Q21's EXISTS (another supplier) + NOT EXISTS (another equally-late
    // supplier) pair, expressed as aggregates instead of correlated
    // subqueries (the testdata lacks commit/receipt dates; max(l_shipdate)
    // stands in for the lateness signal, the shape is identical). Scale
    // shape: every heavy step keys on l_orderkey — the per-order agg, the
    // join back, the distinct last-shipper set and the sole-shipper agg
    // all reuse one hash partitioning (no second fact-wide key); the
    // per-supplier count is supplier-cardinality and the dim join
    // broadcasts. All values integer/timestamp-exact.
    "q_tpch_q21" -> Q(
      """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        |o AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
        |        max(l_shipdate) AS mx
        |      FROM l GROUP BY l_orderkey),
        |last AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |         FROM l JOIN o ON l.l_orderkey = o.l_orderkey
        |         WHERE l.l_shipdate = o.mx AND o.ns >= 2),
        |sole AS (SELECT l_orderkey, min(l_suppkey) AS s_suppkey
        |         FROM last GROUP BY l_orderkey HAVING count(*) = 1),
        |w AS (SELECT s_suppkey, cast(count(*) as bigint) AS numwait
        |      FROM sole GROUP BY s_suppkey)
        |SELECT s_suppkey, s_name, numwait
        |FROM w JOIN supplier USING (s_suppkey)
        |ORDER BY numwait DESC, s_suppkey LIMIT 10""".stripMargin) { (s, dir) =>
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = l.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("ns"),
          max(col("l_shipdate")).as("mx"))
        .filter(col("ns") >= 2)
      val lastShippers = l.join(o, "l_orderkey")
        .filter(col("l_shipdate") === col("mx"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .distinct()
      val sole = lastShippers.groupBy(col("l_orderkey"))
        .agg(min(col("l_suppkey")).as("s_suppkey"), count(lit(1)).as("nlast"))
        .filter(col("nlast") === 1L)
      sole.groupBy(col("s_suppkey")).agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))), "s_suppkey")
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(10)
    },

    // TPC-H Q22 shape (global sales opportunity): high-balance customers
    // gone quiet — acctbal above the positive-balance average AND no
    // order since the cutoff, counted per nation. Exercises the scalar
    // subquery (1-row broadcast threshold, the q_scalar_subquery shape)
    // plus a LEFT ANTI join whose build side is pre-filtered to the
    // recent-order custkey set (the testdata's every-customer-orders
    // density makes the unwindowed Q22 anti leg vacuous, so the cutoff
    // carries the semantics). Threshold = exact decimal sum / count (one
    // IEEE division, deterministic both engines); balances sum through
    // bounded decimals. Scale shape: the anti join shuffles on custkey;
    // everything else is customer-sized.
    "q_tpch_q22" -> Q(
      s"""WITH a AS (SELECT cast(sum(cast(c_acctbal as decimal(18,4))) as double)
         |             / count(*) AS avg_bal
         |           FROM customer WHERE c_acctbal > 0.0),
         |recent AS (SELECT DISTINCT o_custkey FROM orders
         |           WHERE o_orderdate >= timestamp '2000-01-01 00:00:00')
         |SELECT c_nationkey, cast(count(*) as bigint) AS n_cust,
         |  ${Exact.oSumMoney("c_acctbal")} AS total_bal
         |FROM customer c, a
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val customer = t(s, dir, "customer")
      val avgBal = customer.filter(col("c_acctbal") > 0.0)
        .agg((sum(Exact.dec(col("c_acctbal"), 18, 4)).cast("double")
          / count(lit(1))).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp '2000-01-01 00:00:00'"))
        .select(col("o_custkey")).distinct()
      customer.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          Exact.sumMoney(col("c_acctbal")).as("total_bal"))
        .orderBy(col("c_nationkey"))
    },

    // TPC-H Q19 shape (discounted revenue, OR-of-ANDs): three disjoint
    // brand/size/quantity bands OR'd together over the part⋈lineitem
    // join — the classic disjunct-pushdown planner exercise. Written as
    // ONE post-join OR filter (not hand-split): Catalyst's CNF
    // conversion must extract the implied common conjuncts — p_brand ∈
    // {3 brands} to the part side and the quantity envelope [1,30] to
    // the lineitem scan — so each scan reads only its band union, and
    // the surviving part set broadcasts (PushdownSpec pins the derived
    // IN filter reaching the part scan). The reference reaches this
    // query only as passthrough SQL (core.py:84). Quantities are
    // integer-valued doubles (exact comparisons both engines); revenue
    // via the bounded-decimal Exact chain; single row, ordered by n.
    "q_tpch_q19" -> Q(
      s"""SELECT cast(count(*) as bigint) AS n,
         |  ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity >= 1 AND l_quantity <= 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity >= 10 AND l_quantity <= 20)
         |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 20 AND l_quantity <= 30)
         |ORDER BY n""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && col("l_quantity") >= 1 && col("l_quantity") <= 11)
          || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity") >= 10 && col("l_quantity") <= 20)
          || (col("p_brand") === "Brand#5" && col("p_size").between(1, 15)
            && col("l_quantity") >= 20 && col("l_quantity") <= 30))
        .agg(count(lit(1)).as("n"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
            .as("revenue"))
    },

    // TPC-H Q4 shape (order priority checking): orders in a quarter with
    // at least one line shipped after the order date — the EXISTS-semi
    // planner exercise, and deliberately a semi with a NON-equi conjunct
    // (l_shipdate > o_orderdate stands in for the missing
    // commitdate<receiptdate): the decorrelated LeftSemi carries the
    // equi key l_orderkey=o_orderkey for the hash exchange plus the
    // correlated comparison as a join residual, never a post-join
    // distinct. Scale shape: the quarter filter prunes orders before
    // the semi; lineitem projects two columns; one orderkey shuffle;
    // the agg output is priority-cardinality (5 rows).
    "q_tpch_q4" -> Q(
      """SELECT o_orderpriority, cast(count(*) as bigint) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= timestamp '1997-07-01 00:00:00'
        |  AND o_orderdate < timestamp '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp '1997-07-01 00:00:00'")
          && expr("o_orderdate < timestamp '1997-10-01 00:00:00'"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q13 shape (customer order-count distribution): how many
    // customers placed 0, 1, 2, … qualifying orders — the classic
    // LEFT-join null-handling exercise. The priority filter lives in the
    // JOIN CONDITION, not a WHERE (a where-filter would silently drop
    // the zero-order customers that are the query's whole point), and
    // count(o_orderkey) counts non-null matches only, so unmatched
    // customers land in the c_count=0 bucket. Scale shape: one custkey
    // shuffle for the left join + per-customer count (both map-side
    // combinable), then the distribution agg runs on a
    // distinct-count-sized input.
    "q_tpch_q13" -> Q(
      """SELECT c_count, cast(count(*) as bigint) AS custdist
        |FROM (SELECT c_custkey, cast(count(o_orderkey) as bigint) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q2 shape (minimum-cost supplier): for every part in a
    // type/size slice, the supplier(s) who shipped it at the lowest
    // observed price — the correlated-min subquery, decorrelated by hand
    // into aggregate-then-join-back on (partkey, min_price) exactly as a
    // planner would (the testdata lacks partsupp; lineitem's observed
    // l_extendedprice per (part, supplier) stands in for ps_supplycost).
    // Price equality/min on raw parquet doubles is bit-exact in both
    // engines (no arithmetic touches the value). Scale shape: the part
    // slice broadcasts under the per-part agg AND the join-back (both
    // sides pre-pruned to the slice's lineitems); supplier⋈nation
    // broadcasts; DISTINCT collapses per-(part,supplier) line
    // multiplicity before the dim join; top-100 by TakeOrdered.
    "q_tpch_q2" -> Q(
      """WITH pl AS (
        |  SELECT l_partkey, l_suppkey, l_extendedprice
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'LARGE' AND p_size < 10),
        |mn AS (SELECT l_partkey, min(l_extendedprice) AS min_price
        |       FROM pl GROUP BY l_partkey)
        |SELECT DISTINCT pl.l_partkey AS p_partkey, s_suppkey, s_name, n_name,
        |  min_price
        |FROM pl JOIN mn ON pl.l_partkey = mn.l_partkey
        |                AND pl.l_extendedprice = mn.min_price
        |        JOIN supplier ON s_suppkey = l_suppkey
        |        JOIN nation ON n_nationkey = s_nationkey
        |ORDER BY p_partkey, s_suppkey LIMIT 100""".stripMargin) { (s, dir) =>
      val slice = broadcast(t(s, dir, "part")
        .filter(col("p_type") === "LARGE" && col("p_size") < 10)
        .select(col("p_partkey")))
      val pl = t(s, dir, "lineitem")
        .join(slice, col("p_partkey") === col("l_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      val mn = pl.groupBy(col("l_partkey")).agg(min(col("l_extendedprice"))
        .as("min_price")).withColumnRenamed("l_partkey", "m_partkey")
      pl.join(mn, col("l_partkey") === col("m_partkey")
          && col("l_extendedprice") === col("min_price"))
        .select(col("l_partkey").as("p_partkey"), col("l_suppkey"),
          col("min_price"))
        .distinct()
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("n_name"), col("min_price"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
        .limit(100)
    },

    // TPC-H Q1 shape (pricing summary report): THE warehouse scan-agg —
    // one pass over lineitem, every money aggregate through the bounded
    // decimal chains (sum_qty integer-exact; averages are exact-sum /
    // count, a single IEEE division identical in both engines). Scale
    // shape: map-side partial agg collapses the fact table to 6 groups
    // before the one tiny shuffle; the date filter is pushed to the scan.
    "q_tpch_q1" -> Q(
      s"""SELECT l_returnflag, l_linestatus,
         |  cast(sum(cast(round(l_quantity, 0) as bigint)) as bigint) AS sum_qty,
         |  ${Exact.oSumMoney("l_extendedprice")} AS sum_base_price,
         |  ${Exact.oSumRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
         |  ${Exact.oSumCharge("l_extendedprice", "l_discount", "l_tax")} AS sum_charge,
         |  ${Exact.oAvgExact("l_quantity")} AS avg_qty,
         |  ${Exact.oAvgExact("l_extendedprice")} AS avg_price,
         |  ${Exact.oAvgExact("l_discount")} AS avg_disc,
         |  cast(count(*) as bigint) AS count_order
         |FROM lineitem WHERE l_shipdate <= timestamp '2000-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate <= timestamp '2000-09-01 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(expr("cast(round(l_quantity, 0) as bigint)")).as("sum_qty"),
          Exact.sumMoney(col("l_extendedprice")).as("sum_base_price"),
          Exact.sumRevenue(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          Exact.sumCharge(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("sum_charge"),
          Exact.avgExact(col("l_quantity")).as("avg_qty"),
          Exact.avgExact(col("l_extendedprice")).as("avg_price"),
          Exact.avgExact(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q6 shape (forecasting revenue change): the pure
    // filter-and-sum — every predicate (year window, discount band,
    // quantity cap) must reach the parquet scan, and the sum is
    // discount REVENUE (price × discount), exact through decimals.
    // Double comparisons against literals are bit-identical in both
    // engines (same parquet doubles, same literals, no arithmetic).
    "q_tpch_q6" -> Q(
      s"""SELECT cast(count(*) as bigint) AS n,
         |  ${Exact.oIntScaled(
              "sum(cast(l_extendedprice as decimal(12,2)) " +
              "* cast(l_discount as decimal(4,2)))", 30, 4)}
         |    AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
         |  AND l_shipdate < timestamp '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
         |ORDER BY n""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01 00:00:00'")
          && expr("l_shipdate < timestamp '1998-01-01 00:00:00'")
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(count(lit(1)).as("n"),
          Exact.intScaled(sum(Exact.dec(col("l_extendedprice"), 12, 2)
            * Exact.dec(col("l_discount"), 4, 2)), 30, 4).as("revenue"))
    },

    // TPC-H Q9 shape (product-type profit by nation and year): profit =
    // revenue − cost, cost proxied by p_retailprice × quantity (the
    // testdata has no partsupp/ps_supplycost; the join/agg shape is
    // identical). All terms bounded decimals, summed at scale 4, one
    // final double cast. Scale shape: the part slice broadcasts under
    // lineitem, supplier⋈nation broadcasts, orders joins on the fact
    // key, and the agg output is nations × years.
    "q_tpch_q9" -> Q(
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  ${Exact.oIntScaled(
              "sum(cast(l_extendedprice as decimal(12,2)) " +
              "* cast(1 - l_discount as decimal(4,2)) " +
              "- cast(p_retailprice as decimal(12,2)) " +
              "* cast(round(l_quantity, 0) as decimal(8,0)))", 32, 4)}
         |    AS sum_profit
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |              JOIN supplier ON s_suppkey = l_suppkey
        |              JOIN nation ON n_nationkey = s_nationkey
        |              JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val slice = broadcast(t(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice")))
      val sn = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      val profit = Exact.dec(col("l_extendedprice"), 12, 2)
        .multiply(Exact.dec(lit(1.0) - col("l_discount"), 4, 2))
        .minus(Exact.dec(col("p_retailprice"), 12, 2)
          .multiply(expr("cast(round(l_quantity, 0) as decimal(8,0))")))
      t(s, dir, "lineitem")
        .join(slice, col("p_partkey") === col("l_partkey"))
        .join(sn, col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(Exact.intScaled(sum(profit), 32, 4).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q11 shape (important part values): parts whose revenue from
    // one nation's suppliers exceeds a fixed fraction of that nation's
    // total — the HAVING-against-a-scalar-subquery shape. The fraction
    // comparison is lifted to an integer-exact decimal inequality
    // (value × 5000 > total ⇔ value > total × 0.0002 — no float
    // threshold). Scale shape: one suppkey-broadcast prune + one
    // partkey agg; the 1-row total broadcasts into the filter.
    "q_tpch_q11" -> Q(
      """WITH pv AS (
        |  SELECT l_partkey,
        |    sum(cast(l_extendedprice as decimal(12,2))
        |        * cast(1 - l_discount as decimal(4,2))) AS v
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |                JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_1'
        |  GROUP BY l_partkey),
        |tot AS (SELECT sum(v) AS tv FROM pv)
        |SELECT l_partkey AS p_partkey,
        |  cast(cast(cast(v as decimal(30,4)) * 10000 as decimal(38,0))
        |       as double) / 10000.0 AS part_value
        |FROM pv, tot WHERE v * 5000 > tv
        |ORDER BY part_value DESC, p_partkey""".stripMargin) { (s, dir) =>
      val supp = broadcast(t(s, dir, "supplier")
        .join(t(s, dir, "nation").filter(col("n_name") === "NATION_1"),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey")))
      val pv = t(s, dir, "lineitem")
        .join(supp, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(Exact.dec(col("l_extendedprice"), 12, 2)
          * Exact.dec(lit(1.0) - col("l_discount"), 4, 2)).as("v"))
      val tot = pv.agg(sum(col("v")).as("tv"))
      pv.crossJoin(broadcast(tot))
        .filter(col("v") * 5000 > col("tv"))
        .select(col("l_partkey").as("p_partkey"),
          Exact.intScaled(col("v"), 30, 4).as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    },

    // TPC-H Q12 shape (late-shipment priority audit): lines shipped more
    // than 30 days after their order date, split into high/low order
    // priority per return flag (the testdata lacks
    // l_shipmode/commitdate/receiptdate; the join + conditional-count
    // shape and the date-interval predicate are Q12's). Scale shape:
    // the year filter prunes lineitem at the scan; one orderkey join;
    // 3-row output from a map-side-combinable conditional agg.
    "q_tpch_q12" -> Q(
      """SELECT l_returnflag,
        |  cast(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |             THEN 1 END) as bigint) AS high_line_count,
        |  cast(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |             THEN 1 END) as bigint) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        |  AND l_shipdate < timestamp '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01 00:00:00'")
          && expr("l_shipdate < timestamp '1998-01-01 00:00:00'"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")), col("o_orderkey") === col("l_orderkey"))
        .filter(expr("l_shipdate > o_orderdate + interval 30 days"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // TPC-H Q14 shape (promotion effect): promo revenue as a share of
    // total revenue in a month window — the conditional-aggregate ratio,
    // closed in floor-ppm after a decimal(38)/HUGEINT integer lift (the
    // q_tpch_q8 discipline; a float percentage would not hash). Single
    // pass, single row; the part dim broadcasts.
    "q_tpch_q14" -> Q(
      """SELECT cast(count(*) as bigint) AS n,
        |  cast((cast(coalesce(sum(CASE WHEN p_type = 'PROMO'
        |          THEN cast(l_extendedprice as decimal(12,2))
        |               * cast(1 - l_discount as decimal(4,2)) END), 0) * 10000
        |        as hugeint) * 1000000)
        |       // cast(sum(cast(l_extendedprice as decimal(12,2))
        |             * cast(1 - l_discount as decimal(4,2))) * 10000 as hugeint)
        |       as bigint) AS promo_ppm
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= timestamp '1997-03-01 00:00:00'
        |  AND l_shipdate < timestamp '1997-04-01 00:00:00'
        |ORDER BY n""".stripMargin) { (s, dir) =>
      val term = Exact.dec(col("l_extendedprice"), 12, 2) *
        Exact.dec(lit(1.0) - col("l_discount"), 4, 2)
      t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-03-01 00:00:00'")
          && expr("l_shipdate < timestamp '1997-04-01 00:00:00'"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("p_type") === "PROMO", term)),
            lit(BigDecimal(0))).as("num_dec"),
          sum(term).as("den_dec"))
        .select(col("n"),
          expr("cast((cast(num_dec * 10000 as decimal(38,0)) * 1000000) " +
            "div cast(den_dec * 10000 as decimal(38,0)) as bigint)")
            .as("promo_ppm"))
    },

    // TPC-H Q15 shape (top supplier): the supplier(s) with the maximum
    // quarter revenue — the correlated max-over-a-view, decorrelated to
    // aggregate → 1-row max → equality join back. The max comparison is
    // on EXACT decimal sums, so the argmax set is engine-deterministic
    // with no tiebreak ambiguity. Scale shape: one suppkey agg over the
    // pruned quarter, 1-row broadcast, supplier dim broadcast.
    "q_tpch_q15" -> Q(
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(cast(l_extendedprice as decimal(12,2))
        |        * cast(1 - l_discount as decimal(4,2))) AS r
        |  FROM lineitem
        |  WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        |    AND l_shipdate < timestamp '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT max(r) AS m FROM rev)
        |SELECT s_suppkey, s_name,
        |  cast(cast(cast(r as decimal(30,4)) * 10000 as decimal(38,0))
        |       as double) / 10000.0 AS total_revenue
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey, mx
        |WHERE r = m ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01 00:00:00'")
          && expr("l_shipdate < timestamp '1997-04-01 00:00:00'"))
        .groupBy(col("l_suppkey"))
        .agg(sum(Exact.dec(col("l_extendedprice"), 12, 2)
          * Exact.dec(lit(1.0) - col("l_discount"), 4, 2)).as("r"))
      val mx = rev.agg(max(col("r")).as("m"))
      rev.crossJoin(broadcast(mx))
        .filter(col("r") === col("m"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          Exact.intScaled(col("r"), 30, 4).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // TPC-H Q16 shape (supplier-part relationship distribution): how
    // many distinct suppliers ship each (brand, type, size) combination,
    // excluding one brand/type slice and suppliers on a complaints list
    // (proxied by negative account balance — no s_comment in the
    // testdata). The NOT-IN subquery decorrelates to a LEFT ANTI join
    // (keys never null). Scale shape: the size IN-list and brand/type
    // exclusions push to the part scan and broadcast; the anti list is
    // supplier-sized and broadcasts; one distinct agg on the fact.
    "q_tpch_q16" -> Q(
      """SELECT p_brand, p_type, p_size,
        |  cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      val slice = broadcast(t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
      val complaints = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .join(slice, col("p_partkey") === col("l_partkey"))
        .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // TPC-H Q20 shape (excess-share suppliers): suppliers who shipped
    // MORE THAN HALF of some sliced part's yearly volume — Q20's nested
    // semi (supplier IN … partkey IN … qty > ½·total), decorrelated to
    // two stacked aggregates + an integer-exact share comparison
    // (2·q > total over bigint quantities) + one distinct semi join.
    // Scale shape: the part slice broadcasts; both aggs share the
    // (suppkey, partkey) shuffle; the qualifying-supplier set is
    // supplier-sized and drives a broadcast semi into the dim.
    "q_tpch_q20" -> Q(
      """WITH ps AS (
        |  SELECT l_suppkey, l_partkey,
        |    sum(cast(round(l_quantity, 0) as bigint)) AS q
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE '%blue%'
        |    AND l_shipdate >= timestamp '1997-01-01 00:00:00'
        |    AND l_shipdate < timestamp '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |tot AS (SELECT l_partkey, sum(q) AS tq FROM ps GROUP BY 1),
        |qual AS (SELECT DISTINCT l_suppkey
        |         FROM ps JOIN tot USING (l_partkey) WHERE q * 2 > tq)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON n_nationkey = s_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM qual)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val slice = broadcast(t(s, dir, "part")
        .filter(col("p_name").like("%blue%")).select(col("p_partkey")))
      val ps = t(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01 00:00:00'")
          && expr("l_shipdate < timestamp '1998-01-01 00:00:00'"))
        .join(slice, col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(expr("cast(round(l_quantity, 0) as bigint)")).as("q"))
      val tot = ps.groupBy(col("l_partkey")).agg(sum(col("q")).as("tq"))
      val qual = ps.join(tot, "l_partkey")
        .filter(col("q") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("n_nationkey") === col("s_nationkey"))
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    },

    // Incremental materialized-view maintenance (round 7 continuation):
    // per-customer order count + exact-decimal total maintained as
    // merge(agg(base), agg(delta)) — the refresh path a warehouse MV takes
    // when new partitions land, proven equal to full recompute (the oracle
    // aggregates the whole table directly; the hash gate IS the
    // equivalence proof). Works because count and decimal-sum are
    // commutative monoids — coalesce-to-identity + add on the FULL OUTER
    // merge. Scale shape: refresh cost ∝ delta (one delta-sized agg + one
    // MV-key shuffle against the stored aggregate), never a rescan of the
    // 100 TB base; the final decimal→double cast happens only AFTER the
    // merge, so partial aggregates stay exact.
    "q_mv_delta" -> Q(
      s"""SELECT o_custkey, cast(count(*) as bigint) AS n_orders,
         |  ${Exact.oSumMoney("o_totalprice")} AS total
         |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
      val cut = "timestamp '1997-06-01 00:00:00'"
      def mv(d: DataFrame, suffix: String): DataFrame =
        d.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as(s"n_$suffix"),
            sum(Exact.dec(col("o_totalprice"), 18, 4)).as(s"tot_$suffix"))
      val base = mv(orders.filter(expr(s"o_orderdate < $cut")), "b")
      val delta = mv(orders.filter(expr(s"o_orderdate >= $cut")), "d")
      val zero = lit(BigDecimal(0)).cast(DecimalType(28, 4))
      base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("tot_b"), zero) + coalesce(col("tot_d"), zero))
            .cast(DecimalType(30, 2)).cast(DoubleType).as("total"))
        .orderBy(col("o_custkey"))
    },

    // Pivot / crosstab: status columns per priority. Spark's pivot yields
    // null for empty cells where conditional counts yield 0 — coalesced
    // for parity with the FILTER form.
    // Market-basket pair mining (round 8): top co-purchased part pairs.
    // Pairs are generated WITHIN each order via the native SuffixPairs
    // C(d,2) expansion over each order's sorted distinct part set —
    // ONE orderkey shuffle and an in-row explode, no self-join at all
    // (the join form costs a second exchange and measured 2.1 s vs
    // 1.1 s at sf0.1); TPC-H orders hold ≤ 7 lines, so the fan-out is
    // corpus-LINEAR, never the all-pairs part×part product. The
    // (p1, p2) count is map-side combinable and the top-25 is a
    // TakeOrdered (count desc with a (p1, p2) tiebreak — deterministic
    // across engines), no global sort. The same shape mines token /
    // document co-occurrence in an LLM-data pipeline (q_cooccur_window
    // is the windowed variant). The oracle states the classic self-join
    // formulation — same relation, independent derivation.
    "q_basket_pairs" -> Q(
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM items a JOIN items b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT p1, p2, cast(count(*) as bigint) AS n
        |FROM pairs GROUP BY p1, p2
        |ORDER BY n DESC, p1, p2 LIMIT 25""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(explode(
          graft.functions.TextExpressions.suffixPairs(col("ps"))).as("p"))
        .groupBy(col("p.d1").as("p1"), col("p.d2").as("p2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("p1"), col("p2"))
        .limit(25)
    },

    "q_pivot" -> Q(
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    },

    // Unpivot (wide metrics → long (metric, value) rows) — the inverse of
    // q_pivot. Spark's unpivot is a narrow per-row expansion (no shuffle;
    // 4× rows out of the scan, columns pruned to the unpivoted set); the
    // oracle states the same relation as the classic UNION ALL. Values
    // pass through unchanged, so raw doubles are hash-safe here.
    "q_unpivot" -> Q(
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |         l_quantity AS value FROM lineitem WHERE l_orderkey <= 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |  FROM lineitem WHERE l_orderkey <= 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_orderkey <= 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey <= 100)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    },

    // CTE chain — the same SQL text runs on both engines (spark.sql is
    // the operator here, like the reference's exec passthrough).
    "q_cte" -> Q(SqlSurfaceTexts.cteSql) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(SqlSurfaceTexts.cteSql)
    },

    // Recursive CTE (Spark 4's UnionLoop): a month spine generated by
    // recursion from the data's own [min, max] month range, left-joined
    // to per-month revenue so empty months surface as zero rows — the
    // classic time-spine densification, written as ONE standard SQL text
    // that runs verbatim on both engines. Scale shape: recursion depth
    // is the TIMELINE length in months (decades « the 100-level
    // default), never the data size; the recursion carries `hi` AS A
    // SPINE COLUMN so the recursive member references ONLY the spine —
    // both engines inline plain CTEs into the recursive member, so a
    // `FROM spine, bounds` join would re-run the orders min/max
    // aggregate once per iteration (measured 13.6 s vs 1.2 s at sf0.1:
    // ~80 iterations × a full orders scan; the residual ~1 s is the 80
    // inherently sequential 1-row iteration jobs); the monthly aggregate
    // is map-side-combined to ~#months groups before the join. Division
    // portability: (m - m % 12) / 12 is float division on BOTH engines
    // (DuckDB casts int / to double too) on an exactly-representable
    // integer-valued double, and DuckDB's round-on-cast == Spark's
    // truncate-on-cast on exact integers.
    "q_recursive_cte" -> Q(SqlSurfaceTexts.recursiveCteSql) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(SqlSurfaceTexts.recursiveCteSql)
    },

    // Scalar subquery in a predicate; the subquery's average uses the
    // exact-decimal form so the comparison threshold is deterministic.
    "q_scalar_subquery" -> Q(SqlSurfaceTexts.scalarSubSql) { (s, dir) =>
      val customer = t(s, dir, "customer")
      val avgBal = customer.agg(
        (sum(col("c_acctbal").cast("decimal(18,4)")).cast("double")
          / count(lit(1))).as("avg_bal"))
      customer.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // QUALIFY (Redshift window-predicate sugar): Spark has no QUALIFY
    // keyword, so the engine applies the canonical rewrite — rank in a
    // window, filter, drop the rank — which is also exactly the plan
    // QUALIFY lowers to. The oracle uses DuckDB's native QUALIFY, pinning
    // the rewrite against the real dialect semantics. Top-3 per priority:
    // partition-local TakeOrdered shape, no global sort before the final
    // presentation ORDER BY. Values pass through unchanged (hash-safe).
    "q_qualify" -> Q(
      """SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rk") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
          col("o_orderkey"))
    },

    // Ordered-set aggregate (Redshift PERCENTILE_DISC ... WITHIN GROUP):
    // Spark's native percentile_disc runs through the SQL surface; the
    // oracle states the ANSI definition explicitly — the SMALLEST value
    // whose cume_dist reaches p — rather than DuckDB's quantile_disc,
    // whose lower-index interpolation policy differs at rank boundaries.
    // The result is always an element of the input (no interpolation), so
    // raw doubles are hash-safe.
    "q_pctl_disc" -> Q(
      """SELECT l_returnflag,
        |  min(CASE WHEN cd >= 0.25 THEN v END) AS p25,
        |  min(CASE WHEN cd >= 0.50 THEN v END) AS p50,
        |  min(CASE WHEN cd >= 0.90 THEN v END) AS p90,
        |  count(*) AS n
        |FROM (SELECT l_returnflag, l_quantity AS v,
        |        cume_dist() OVER (PARTITION BY l_returnflag
        |                          ORDER BY l_quantity) AS cd
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
          |  percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS p50,
          |  percentile_disc(0.90) WITHIN GROUP (ORDER BY l_quantity) AS p90,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // Interpolated ANSI percentile (PERCENTILE_CONT ... WITHIN GROUP,
    // q_pctl_disc's continuous sibling). lo + (hi-lo)·frac over
    // integer-valued inputs with dyadic fractions (0.25/0.50/0.75) is the
    // same two-term IEEE expression in both engines — bit-equal, no
    // decimal scaffolding needed (the q_agg_quantile precedent).
    "q_pctl_cont" -> Q(
      """SELECT l_returnflag,
        |  quantile_cont(qty, 0.25) AS p25,
        |  quantile_cont(qty, 0.50) AS p50,
        |  quantile_cont(qty, 0.75) AS p75,
        |  count(*) AS n
        |FROM (SELECT l_returnflag, cast(round(l_quantity, 0) as bigint) AS qty
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  percentile_cont(0.25) WITHIN GROUP (ORDER BY qty) AS p25,
          |  percentile_cont(0.50) WITHIN GROUP (ORDER BY qty) AS p50,
          |  percentile_cont(0.75) WITHIN GROUP (ORDER BY qty) AS p75,
          |  count(*) AS n
          |FROM (SELECT l_returnflag, cast(round(l_quantity, 0) as bigint) AS qty
          |      FROM lineitem)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // DISTINCT ON-style latest/top row per key (the SQL surface of the
    // q_dedup_latest shape): richest customer per nation. Spark rewrite =
    // row_number + filter (one hash-partitioned window, no join); the
    // oracle uses DuckDB's native DISTINCT ON with a fully-tiebroken
    // ORDER BY so both engines pick the identical representative.
    "q_distinct_on" -> Q(
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
        |  FROM customer ORDER BY c_nationkey, c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "customer")
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("c_nationkey"))
            .orderBy(col("c_acctbal").desc, col("c_custkey"))))
        .filter(col("rk") === 1)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"))
    },

    // Winsorization (round 7) — percentile clipping, the numeric-outlier
    // cleaning step (clamp to [p05, p95] per group) a feature pipeline
    // runs before training on heavy-tailed columns. Both engines take
    // the ANSI discrete percentile (smallest value whose cume_dist
    // reaches p — always an element of the input, so the clamp bounds
    // are bit-identical raw doubles, the q_pctl_disc precedent), clamp
    // with least/greatest (value selection, no arithmetic), and sum the
    // clamped column through bounded decimals (Exact.sumMoney). Scale
    // shape: bounds are a group-count-sized agg broadcast back into the
    // fact scan (per-group percentile_disc sorts within hash partitions,
    // no global sort); the clamp+stats pass is one map-side-combined
    // hash agg over a 3-column pruned scan.
    "q_winsorize" -> Q(
      s"""WITH b AS (
         |  SELECT l_returnflag,
         |    min(CASE WHEN cd >= 0.05 THEN v END) AS lo,
         |    min(CASE WHEN cd >= 0.95 THEN v END) AS hi
         |  FROM (SELECT l_returnflag, l_extendedprice AS v,
         |          cume_dist() OVER (PARTITION BY l_returnflag
         |                            ORDER BY l_extendedprice) AS cd
         |        FROM lineitem)
         |  GROUP BY l_returnflag)
         |SELECT l.l_returnflag,
         |  cast(count(CASE WHEN l_extendedprice < lo THEN 1 END) as bigint) AS n_lo,
         |  cast(count(CASE WHEN l_extendedprice > hi THEN 1 END) as bigint) AS n_hi,
         |  cast(count(*) as bigint) AS n,
         |  ${Exact.oSumMoney("greatest(lo, least(hi, l_extendedprice))")} AS sum_wins,
         |  min(greatest(lo, least(hi, l_extendedprice))) AS min_wins,
         |  max(greatest(lo, least(hi, l_extendedprice))) AS max_wins
         |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
         |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      winsorize(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    },

    // Robust outlier detection (round 7) — median/MAD flagging, the
    // heavy-tail-safe sibling of z-scores (one extreme value corrupts a
    // mean/stddev fence; the median absolute deviation shrugs it off).
    // Hash-safe on raw doubles because every number is either an ANSI
    // discrete percentile (an ELEMENT of the input, the q_winsorize
    // precedent) or an IEEE-deterministic derivation of one (abs/sub/
    // mul are bit-defined on identical inputs in both engines — no
    // accumulation order anywhere). Scale shape: two group-count-sized
    // percentile aggs broadcast back into 2-column pruned fact scans;
    // counting pass is one map-side-combined hash agg.
    "q_mad_outliers" -> Q(
      """WITH m AS (
        |  SELECT l_returnflag, min(CASE WHEN cd >= 0.5 THEN v END) AS med
        |  FROM (SELECT l_returnflag, l_extendedprice AS v,
        |          cume_dist() OVER (PARTITION BY l_returnflag
        |                            ORDER BY l_extendedprice) AS cd
        |        FROM lineitem)
        |  GROUP BY l_returnflag),
        |d AS (SELECT l.l_returnflag, med,
        |        abs(l_extendedprice - med) AS adev
        |      FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag),
        |md AS (SELECT l_returnflag, min(CASE WHEN cd >= 0.5 THEN adev END) AS mad
        |       FROM (SELECT l_returnflag, adev,
        |               cume_dist() OVER (PARTITION BY l_returnflag
        |                                 ORDER BY adev) AS cd
        |             FROM d)
        |       GROUP BY l_returnflag)
        |SELECT d.l_returnflag, min(d.med) AS med, min(md.mad) AS mad,
        |  cast(count(*) as bigint) AS n,
        |  cast(count(CASE WHEN d.adev > 3.0 * md.mad THEN 1 END) as bigint)
        |    AS n_outliers
        |FROM d JOIN md ON d.l_returnflag = md.l_returnflag
        |GROUP BY d.l_returnflag ORDER BY d.l_returnflag""".stripMargin) { (s, dir) =>
      madOutliers(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    }
  )

  /** q_mad_outliers core over any frame: per-`key` median and MAD of
    * `value` via ANSI discrete percentiles (element selection, never
    * interpolation), then the |x − med| > 3·MAD outlier count.
    */
  def madOutliers(d: DataFrame, key: String, value: String): DataFrame = {
    val slim = d.select(col(key), col(value))
    val med = slim.groupBy(col(key)).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $value)").as("med"))
    val dev = slim.join(broadcast(med), key)
      .withColumn("adev", abs(col(value) - col("med")))
    val mad = dev.groupBy(col(key)).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").as("mad"))
    dev.join(broadcast(mad), key)
      .groupBy(col(key))
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        count(when(col("adev") > lit(3.0) * col("mad"), 1)).as("n_outliers"))
  }

  /** q_winsorize core over any frame: per-`key` ANSI discrete p05/p95 of
    * `value` (always an element of the input — bit-identical raw doubles,
    * no interpolation), broadcast back for the clamp+stats pass.
    */
  def winsorize(d: DataFrame, key: String, value: String): DataFrame = {
    val bounds = d.groupBy(col(key)).agg(
      expr(s"percentile_disc(0.05) WITHIN GROUP (ORDER BY $value)").as("lo"),
      expr(s"percentile_disc(0.95) WITHIN GROUP (ORDER BY $value)").as("hi"))
    d.select(col(key), col(value))
      .join(broadcast(bounds), key)
      .withColumn("w", greatest(col("lo"), least(col("hi"), col(value))))
      .groupBy(col(key))
      .agg(
        count(when(col(value) < col("lo"), 1)).as("n_lo"),
        count(when(col(value) > col("hi"), 1)).as("n_hi"),
        count(lit(1)).as("n"),
        Exact.sumMoney(col("w")).as("sum_wins"),
        min(col("w")).as("min_wins"),
        max(col("w")).as("max_wins"))
  }
}

/** SQL texts shared verbatim between the Spark run and the DuckDB oracle. */
object SqlSurfaceTexts {
  val cteSql: String =
    """WITH big_orders AS (
      |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000.0
      |), per_cust AS (
      |  SELECT o_custkey, count(*) AS n_big,
      |    cast(cast(cast(sum(cast(o_totalprice as decimal(18,4))) as decimal(30,2)) * 100 as decimal(38,0)) as double) / 100.0 AS total_big
      |  FROM big_orders GROUP BY o_custkey
      |)
      |SELECT c_mktsegment, count(*) AS n_customers,
      |  cast(cast(cast(sum(cast(total_big as decimal(18,4))) as decimal(30,2)) * 100 as decimal(38,0)) as double) / 100.0 AS segment_total
      |FROM per_cust JOIN customer ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val recursiveCteSql: String =
    """WITH RECURSIVE bounds AS (
      |  SELECT min(cast(extract(year from o_orderdate) as bigint) * 12
      |           + cast(extract(month from o_orderdate) as bigint) - 1) AS lo,
      |         max(cast(extract(year from o_orderdate) as bigint) * 12
      |           + cast(extract(month from o_orderdate) as bigint) - 1) AS hi
      |  FROM orders
      |), spine(m, hi) AS (
      |  SELECT lo, hi FROM bounds
      |  UNION ALL
      |  SELECT m + 1, hi FROM spine WHERE m < hi
      |), monthly AS (
      |  SELECT cast(extract(year from o_orderdate) as bigint) * 12
      |       + cast(extract(month from o_orderdate) as bigint) - 1 AS m,
      |    cast(count(*) as bigint) AS n,
      |    cast(cast(sum(cast(o_totalprice as decimal(18,4))) as decimal(30,2))
      |      as double) AS total
      |  FROM orders GROUP BY 1
      |)
      |SELECT cast((m - m % 12) / 12 as bigint) AS yr,
      |  cast(m % 12 + 1 as bigint) AS mon,
      |  coalesce(n, cast(0 as bigint)) AS n,
      |  coalesce(total, cast(0.0 as double)) AS total
      |FROM spine LEFT JOIN monthly USING (m)
      |ORDER BY yr, mon""".stripMargin

  val antiNullSql: String =
    """WITH hi AS (SELECT DISTINCT o_custkey FROM orders
      |            WHERE o_totalprice > 400000.0),
      |c AS (SELECT c_mktsegment,
      |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
      |      FROM customer)
      |SELECT c_mktsegment, cast(count(*) as bigint) AS n
      |FROM c WHERE k NOT IN (SELECT o_custkey FROM hi)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val scalarSubSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT cast(sum(cast(c_acctbal as decimal(18,4))) as double) / count(*)
      |                   FROM customer)
      |ORDER BY c_custkey""".stripMargin
}
