package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** Shared numeric-exactness helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running the oracle SQL. Floating-point SUMS are order-dependent,
  * and Spark (partial/final hash agg over 32 partitions) will not add
  * doubles in DuckDB's order. So every money-ish aggregate goes through
  * bounded DECIMAL arithmetic — exact, order-independent, identical in both
  * engines — and only the final value is cast to double. The same chain is
  * written into the oracle SQL.
  *
  * The decimal→double step is the ENGINE-PORTABLE two-step: scale the
  * exact decimal to an INTEGER, convert int→double (round-to-nearest in
  * both engines), divide by the scale constant (one more shared IEEE
  * rounding). A direct decimal→double cast is NOT portable past ~16
  * significant digits: Spark rounds once (BigDecimal.doubleValue,
  * correctly rounded) while DuckDB scales through two roundings — the 30×
  * scale gate caught them 1 ulp apart on q_agg_group's sum_charge
  * (130910294821.785000 → …c8f6 vs …c8f5). Parity bound: the scaled sum
  * must stay < 2^63 (DuckDB's hugeint→double is single-rounding below
  * that), i.e. ~10^13 money units at scale 6 — two orders past the 100×
  * replica; beyond it, emit the decimal itself instead of a double.
  */
object Exact {
  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Scaled-integer → double emission of an exact decimal aggregate: the
    * decimal (already rounded to `scale` dp) times 10^scale is an exact
    * integer; both engines convert THAT to double and divide. `p` bounds
    * the pre-scale cast so the multiply stays inside width-38 rules on
    * both engines (p + digits(10^scale) + 1 ≤ 38).
    */
  def intScaled(d: Column, p: Int, scale: Int): Column = {
    val m = math.pow(10, scale).toLong
    (d.cast(DecimalType(p, scale)) * lit(m)).cast(DecimalType(38, 0))
      .cast(DoubleType) / lit(m.toDouble)
  }
  // decimal(38,0), not hugeint: some queries (q_ctas) run the SAME string
  // through spark.sql, and DuckDB's scale-0 decimal IS an int128 with the
  // identical single-rounding int→double conversion below 2^63
  def oIntScaled(d: String, p: Int, scale: Int): String = {
    val m = math.pow(10, scale).toLong
    s"cast(cast(cast($d as decimal($p,$scale)) * $m as decimal(38,0)) as double) / $m.0"
  }

  /** sum(cast(x as decimal(18,4))) rounded to 2dp, as double. */
  def sumMoney(c: Column): Column =
    intScaled(sum(dec(c, 18, 4)).cast(DecimalType(30, 2)), 30, 2)
  def oSumMoney(x: String): String =
    oIntScaled(s"cast(sum(cast($x as decimal(18,4))) as decimal(30,2))", 30, 2)

  /** Exact revenue term sum(price * (1 - discount)) at scale 4. */
  def sumRevenue(price: Column, discount: Column): Column =
    intScaled(sum(dec(price, 12, 2) * dec(lit(1.0) - discount, 4, 2))
      .cast(DecimalType(30, 4)), 30, 4)
  def oSumRevenue(price: String, discount: String): String =
    oIntScaled(s"cast(sum(cast($price as decimal(12,2)) * cast(1 - $discount as decimal(4,2))) as decimal(30,4))", 30, 4)

  /** Exact charge term sum(price * (1-disc) * (1+tax)) at scale 6.
    * Pre-scale width 31 (not 32): 31 + 7 + 1 ≤ 38 keeps the ×10⁶ inside
    * both engines' multiply rules; 10^25 charge units is unreachable.
    */
  def sumCharge(price: Column, discount: Column, tax: Column): Column =
    intScaled(sum(dec(price, 12, 2) * dec(lit(1.0) - discount, 4, 2) * dec(lit(1.0) + tax, 4, 2))
      .cast(DecimalType(32, 6)), 31, 6)
  def oSumCharge(price: String, discount: String, tax: String): String =
    oIntScaled(s"cast(sum(cast($price as decimal(12,2)) * cast(1 - $discount as decimal(4,2)) * cast(1 + $tax as decimal(4,2))) as decimal(32,6))", 31, 6)

  /** Exact average: exact decimal sum (via the portable two-step, scale
    * 4) / count — shared IEEE divisions, identical in both engines.
    */
  def avgExact(c: Column): Column =
    intScaled(sum(dec(c, 18, 4)), 33, 4) / count(lit(1))
  def oAvgExact(x: String): String =
    s"${oIntScaled(s"sum(cast($x as decimal(18,4)))", 33, 4)} / count(*)"
}

/** SURVEY.md §2 Part B — scans, filters, predicates, joins.
  *
  * All delegated-to-Redshift semantics in the reference (passthrough at
  * `core.py:84` / `core.py:308`) re-expressed as declarative DataFrame
  * plans: filters/projections reach the parquet scan via Catalyst pushdown,
  * small dims are broadcast, everything else shuffles on its join keys.
  */
object Relational {
  import Exact._

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.table(s, dir, name)

  /** Deterministic scratch dir for sink-style operators (stands in for the
    * reference's S3 staging bucket, `core.py:139-141`; zero-egress env).
    */
  private val stageRoot = "/tmp/graft_stage"

  private def cleanDir(path: String): Unit = graft.util.Fs.deleteRecursively(path)

  /** Shared by q_join_lateral's Spark body and oracle (divergence-proof;
    * must initialize before `queries` captures it).
    */
  private val lateralSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c
      |CROSS JOIN LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |              WHERE o_custkey = c.c_custkey
      |              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_acctbal > 9000.0
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  val queries: Map[String, Q] = Map(

    // ---- scans / sources / sinks ------------------------------------

    // Full table scan (`select * from t`, README.md:32). Total ORDER BY
    // for the oracle hash; the scan itself is the vectorized parquet read.
    "q_scan_full" -> Q(
      "SELECT * FROM supplier ORDER BY s_suppkey") { (s, dir) =>
      t(s, dir, "supplier").orderBy(col("s_suppkey"))
    },

    // Column projection — pruned to 3 columns at the parquet scan
    // (ReadSchema shows only these; verified via explain).
    "q_scan_project" -> Q(
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // CSV round-trip: write lineitem projection as headered CSV (the
    // reference's staging format, core.py:137-138) and read it back with
    // explicit schema + formats (COPY options, core.py:241-249), then
    // aggregate — proves the CSV path is lossless vs the parquet oracle.
    "q_scan_csv" -> Q(
      s"""SELECT l_returnflag, count(*) AS n, ${oSumMoney("l_quantity")} AS sum_qty,
         |       max(l_shipdate) AS max_ship
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/scan_csv"
      val src = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), col("l_shipdate"))
      src.write.mode("overwrite")
        .option("header", "true").option("sep", "|")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
      s.read
        .option("header", "true").option("sep", "|")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .schema(src.schema)
        .csv(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"),
          max(col("l_shipdate")).as("max_ship"))
        .orderBy(col("l_returnflag"))
    },

    // JSON-lines round-trip: the other text staging format a pipeline
    // meets (log/event dumps). Write documents as JSON, read back with
    // explicit schema, aggregate — lossless vs the parquet source of
    // truth (unicode text included; the zh docs exercise escaping).
    "q_scan_json" -> Q(
      """SELECT lang, count(*) AS n, cast(sum(n_chars) as bigint) AS chars,
        |  min(doc_id) AS min_id, max(md5(text)) AS max_md5
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/scan_json"
      val src = t(s, dir, "documents")
      src.write.mode("overwrite").json(path)
      s.read.schema(src.schema).json(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast(LongType).as("chars"),
          min(col("doc_id")).as("min_id"),
          max(md5(col("text").cast(BinaryType))).as("max_md5"))
        .orderBy(col("lang"))
    },

    // MERGE / upsert by rewrite: parquet tables have no in-place MERGE,
    // so the engine expresses it as one FULL OUTER join of target and
    // change set with per-branch resolution (update = exact decimal add,
    // insert = synthesized row, kept = passthrough) — the rewrite a
    // Delta/Iceberg MERGE compiles to, minus the transactional commit.
    // The change set derives from events (update deltas per user; every
    // 5th key shifted to an unseen id to exercise the insert branch).
    // One shuffle on the merge key; at 100 TB the join partitions by key
    // and AQE handles the change-set/target size asymmetry.
    "q_merge_upsert" -> Q(
      """WITH delta AS (SELECT user_id,
        |    sum(cast(value as decimal(18,6))) AS delta
        |  FROM events GROUP BY user_id),
        |changes AS (SELECT CASE WHEN user_id % 5 = 0 THEN user_id + 1000000
        |                        ELSE user_id END AS key, delta FROM delta)
        |SELECT coalesce(c_custkey, key) AS c_custkey,
        |  coalesce(c_name, 'new-' || cast(key as varchar)) AS c_name,
        |  cast(cast(coalesce(cast(c_acctbal as decimal(18,6)), 0)
        |       + coalesce(delta, 0) as decimal(30,6)) as double) AS acctbal,
        |  CASE WHEN key IS NULL THEN 'kept'
        |       WHEN c_custkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS status
        |FROM customer FULL OUTER JOIN changes ON c_custkey = key
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val changes = Engine.table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(dec(col("value"), 18, 6)).as("delta"))
        .select(when(col("user_id") % 5 === 0, col("user_id") + 1000000)
          .otherwise(col("user_id")).as("key"), col("delta"))
      t(s, dir, "customer")
        .join(changes, col("c_custkey") === col("key"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("key")).as("c_custkey"),
          coalesce(col("c_name"),
            concat(lit("new-"), col("key").cast(StringType))).as("c_name"),
          (coalesce(dec(col("c_acctbal"), 18, 6), lit(0))
            + coalesce(col("delta"), lit(0)))
            .cast(DecimalType(30, 6)).cast(DoubleType).as("acctbal"),
          when(col("key").isNull, "kept")
            .when(col("c_custkey").isNull, "inserted")
            .otherwise("updated").as("status"))
        .orderBy(col("c_custkey"))
    },

    // ORC round-trip: the third columnar staging format (ORC ships in
    // Spark's core distribution alongside parquet; warehouses emitting
    // ORC are a common ingest source). Write orders as ORC, read back
    // with the source schema, aggregate — oracle is the parquet source
    // of truth, so the round-trip must be lossless including dates and
    // decimal-exact money sums.
    "q_scan_orc" -> Q(
      s"""SELECT o_orderstatus, count(*) AS n, ${oSumMoney("o_totalprice")} AS total,
         |       min(o_orderdate) AS min_date, max(o_orderdate) AS max_date
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/scan_orc"
      val src = t(s, dir, "orders")
      src.write.mode("overwrite").orc(path)
      s.read.schema(src.schema).orc(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"))
        .orderBy(col("o_orderstatus"))
    },

    // Hive-partitioned layout scan (round 8): write events partitioned
    // by event_type, read back with a partition predicate — the
    // dominant 100 TB scan optimization (a pruned read touches ONLY the
    // matching partition directories; PushdownSpec pins the
    // PartitionFilters entry in the physical plan). The oracle
    // recomputes from the unpartitioned source of truth, so layout
    // round-trip losses (partition-column typing, value encoding) break
    // the hash. Value sums ride the exact-decimal chain.
    "q_scan_partitioned" -> Q(
      s"""SELECT event_type, cast(count(*) as bigint) AS n,
         |  cast(count(DISTINCT user_id) as bigint) AS n_users,
         |  ${Exact.oIntScaled("sum(cast(value as decimal(18,6)))", 30, 6)} AS total
         |FROM events WHERE event_type IN ('view', 'purchase')
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/scan_partitioned"
      cleanDir(path)
      Engine.table(s, dir, "events")
        .write.partitionBy("event_type").mode("overwrite").parquet(path)
      s.read.parquet(path)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          Exact.intScaled(sum(dec(col("value"), 18, 6)), 30, 6).as("total"))
        .orderBy(col("event_type"))
    },

    // Schema evolution scan (round 8): two producer generations land
    // parquet in ONE dataset directory — the old writer lacks the
    // o_orderpriority column — and `mergeSchema` reads the union schema
    // with the missing column null-backfilled for old files. The lake
    // ingestion reality every long-lived 100 TB dataset hits (columns
    // get added; history is not rewritten). The oracle recomputes the
    // expected view from the source of truth: odd orderkeys (old
    // producer) must surface NULL priority, even ones keep theirs —
    // count(col) vs count(*) exposes the backfill exactly.
    "q_scan_evolve" -> Q(
      s"""SELECT o_orderstatus, cast(count(*) as bigint) AS n,
         |  cast(count(o_orderpriority) as bigint) AS n_with_priority,
         |  ${oSumMoney("o_totalprice")} AS total
         |FROM (SELECT o_orderstatus, o_totalprice,
         |        CASE WHEN o_orderkey % 2 = 0 THEN o_orderpriority END
         |          AS o_orderpriority
         |      FROM orders)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/scan_evolve"
      cleanDir(path)
      val orders = t(s, dir, "orders")
      // generation 1: before the priority column existed
      orders.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode("append").parquet(path)
      // generation 2: the widened schema, appended to the same dataset
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          count(col("o_orderpriority")).as("n_with_priority"),
          sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // Order-independent table checksum (round 8): the load-validation
    // fingerprint a connector user runs after a round-trip (the
    // reference's pandas_to_redshift → redshift_to_pandas cycle,
    // core.py:308/84 — "did every row arrive intact?"). Per row: md5
    // over a canonical '|'-joined rendering of the columns (doubles
    // rendered through a bounded decimal — raw double→string formatting
    // diverges between engines); per status group: row count + the SUM
    // of each digest's leading 32 bits folded mod 2^61−1. Sum-of-hashes
    // is commutative, so the checksum is independent of row order AND
    // partitioning — two clusters can validate the same 100 TB table
    // without a global sort — and the decimal(38) accumulator with a
    // final modulus never overflows at any row count. One scan, one
    // map-side-combinable aggregate, zero joins.
    "q_table_checksum" -> Q(
      s"""WITH d AS (
         |  SELECT o_orderstatus,
         |    md5(cast(o_orderkey as varchar) || '|' || cast(o_custkey as varchar)
         |      || '|' || o_orderstatus || '|'
         |      || cast(cast(o_totalprice as decimal(18,2)) as varchar)
         |      || '|' || cast(o_orderdate as varchar) || '|' || o_orderpriority)
         |      AS h
         |  FROM orders),
         |v AS (
         |  SELECT o_orderstatus,
         |    ${(1 to 8).map(i =>
             s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * ${1L << (4 * (8 - i))}"
           ).mkString("\n         |    + ")} AS hv
         |  FROM d)
         |SELECT o_orderstatus, cast(count(*) as bigint) AS n,
         |  cast(sum(cast(hv as hugeint)) % 2305843009213693951 as bigint)
         |    AS checksum
         |FROM v GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          md5(concat_ws("|",
            col("o_orderkey").cast(StringType),
            col("o_custkey").cast(StringType),
            col("o_orderstatus"),
            col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType),
            col("o_orderdate").cast(StringType),
            col("o_orderpriority")).cast(BinaryType)).as("h"))
        .select(col("o_orderstatus"),
          conv(substring(col("h"), 1, 8), 16, 10).cast(LongType).as("hv"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          (sum(col("hv").cast(DecimalType(38, 0))) % lit(2305843009213693951L))
            .cast(LongType).as("checksum"))
        .orderBy(col("o_orderstatus"))
    },

    // CREATE TABLE AS SELECT (README.md:102-109) against the session
    // catalog; result is the read-back of the created table.
    "q_ctas" -> Q(
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |       ${oSumMoney("o_totalprice")} AS total
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql("DROP TABLE IF EXISTS ctas_priority_summary")
      cleanDir(s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + "/ctas_priority_summary")
      s.sql(
        s"""CREATE TABLE ctas_priority_summary USING parquet AS
           |SELECT o_orderpriority, count(*) AS n_orders,
           |       ${oSumMoney("o_totalprice")} AS total
           |FROM orders GROUP BY o_orderpriority""".stripMargin)
      s.table("ctas_priority_summary").orderBy(col("o_orderpriority"))
    },

    // Append load into an existing table (append flag, core.py:279,297).
    "q_insert_append" -> Q(
      s"""SELECT o_orderstatus, count(*) AS n, ${oSumMoney("o_totalprice")} AS total
         |FROM orders WHERE o_orderstatus IN ('F','O')
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/append_tbl"
      val orders = t(s, dir, "orders")
      orders.filter(col("o_orderstatus") === "F")
        .write.mode("overwrite").parquet(path)
      orders.filter(col("o_orderstatus") === "O")
        .write.mode("append").parquet(path)
      s.read.parquet(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus"))
    },

    // Drop-and-replace load (unconditional drop, core.py:215): first write
    // a subset, then overwrite with the full table; read-back must see only
    // the second write.
    "q_overwrite" -> Q(
      s"""SELECT c_mktsegment, count(*) AS n, ${oSumMoney("c_acctbal")} AS bal
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val path = s"$stageRoot/overwrite_tbl"
      val customer = t(s, dir, "customer")
      customer.limit(7).write.mode("overwrite").parquet(path)
      customer.write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumMoney(col("c_acctbal")).as("bal"))
        .orderBy(col("c_mktsegment"))
    },

    // Arbitrary parameterized SQL read (redshift_to_pandas, core.py:82-87):
    // Spark 4 named-parameter spark.sql over registered views.
    "q_sql_read" -> Q(
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE o_totalprice > 200000.0 GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(
        """SELECT o_orderstatus, count(*) AS n FROM orders
          |WHERE o_totalprice > :minp GROUP BY o_orderstatus
          |ORDER BY o_orderstatus""".stripMargin,
        Map("minp" -> 200000.0))
    },

    // ---- projection / filter / predicates ---------------------------

    "q_filter_cmp" -> Q(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 48.0 AND l_extendedprice < 10000.0
        |  AND l_linenumber <> 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 48.0 && col("l_extendedprice") < 10000.0
          && col("l_linenumber") =!= 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    "q_filter_bool" -> Q(
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus IN ('F','O')
        |  AND (o_totalprice BETWEEN 100000.0 AND 150000.0 OR o_totalprice > 400000.0)
        |  AND NOT (o_orderpriority = '1-URGENT')
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O")
          && (col("o_totalprice").between(100000.0, 150000.0) || col("o_totalprice") > 400000.0)
          && !(col("o_orderpriority") === "1-URGENT"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // Null predicates: testdata has no physical nulls, so nulls are
    // synthesized with nullif and handled with coalesce — three-valued
    // logic is exercised end-to-end.
    "q_filter_null" -> Q(
      """SELECT o_orderstatus,
        |       count(*) AS n,
        |       count(nullif(o_orderpriority, '3-MEDIUM')) AS n_notnull,
        |       cast(sum(CASE WHEN nullif(o_orderpriority, '3-MEDIUM') IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null,
        |       coalesce(min(nullif(o_orderpriority, '3-MEDIUM')), 'none') AS min_pri
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val pri = nullif(col("o_orderpriority"), lit("3-MEDIUM"))
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          count(pri).as("n_notnull"),
          sum(when(pri.isNull, 1).otherwise(0)).as("n_null"),
          coalesce(min(pri), lit("none")).as("min_pri"))
        .orderBy(col("o_orderstatus"))
    },

    "q_case_cast" -> Q(
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 100000.0 THEN 'small'
        |            WHEN o_totalprice < 300000.0 THEN 'medium'
        |            ELSE 'large' END AS bucket,
        |       cast(floor(o_totalprice) as bigint) AS price_floor,
        |       cast(o_orderkey as varchar) AS key_str
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 100000.0, "small")
            .when(col("o_totalprice") < 300000.0, "medium")
            .otherwise("large").as("bucket"),
          floor(col("o_totalprice")).cast(LongType).as("price_floor"),
          col("o_orderkey").cast(StringType).as("key_str"))
        .orderBy(col("o_orderkey"))
    },

    "q_distinct" -> Q(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- joins ------------------------------------------------------

    // Equi inner join, fact ⋈ fact — shuffles both sides on the key;
    // AQE picks the physical join from runtime stats.
    "q_join_inner" -> Q(
      s"""SELECT o_orderpriority, count(*) AS n_lines,
         |       ${oSumRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },

    // Left outer join with genuinely unmatched rows (only high-balance
    // customers on the right) — null-producing side counted.
    "q_join_left" -> Q(
      """SELECT o.o_orderstatus, count(*) AS n,
        |       cast(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_unmatched
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin) { (s, dir) =>
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000.0)
      t(s, dir, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("n_unmatched"))
        .orderBy(col("o_orderstatus"))
    },

    "q_join_right" -> Q(
      """SELECT c.c_mktsegment, count(*) AS n,
        |       cast(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_no_order
        |FROM (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      bigOrders
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_no_order"))
        .orderBy(col("c_mktsegment"))
    },

    "q_join_full" -> Q(
      """SELECT coalesce(a.k, b.k) AS nationkey,
        |       coalesce(a.n_cust, 0) AS n_cust, coalesce(b.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer
        |      WHERE c_acctbal > 8000.0 GROUP BY c_nationkey) a
        |FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier
        |           GROUP BY s_nationkey) b
        |  ON a.k = b.k
        |ORDER BY nationkey""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 8000.0)
        .groupBy(col("c_nationkey").as("ka")).agg(count(lit(1)).as("n_cust"))
        .withColumnRenamed("ka", "k")
      val b = t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("kb")).agg(count(lit(1)).as("n_supp"))
        .withColumnRenamed("kb", "k")
      a.join(b, Seq("k"), "full")
        .select(col("k").as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },

    "q_join_cross" -> Q(
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").crossJoin(t(s, dir, "region"))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"), col("r_name"))
    },

    // Semi join = EXISTS subquery (delegated via IN/EXISTS keywords).
    "q_join_semi" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Anti join = NOT EXISTS (oracle written as NOT EXISTS, not NOT IN,
    // to match anti-join null semantics — SURVEY §7 risk note). Filtered
    // right side keeps the result non-empty (~500 rows at sf0.01).
    "q_join_anti" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // NULL-aware anti join (round 8): ANSI `NOT IN (subquery)` with a
    // NULLABLE left key — three-valued logic drops NULL-key rows
    // (UNKNOWN), which a naive left_anti rewrite gets WRONG (it would
    // keep them). Spark plans this as the dedicated null-aware
    // BroadcastHashJoin(LeftAnti) path (NAAJ), DuckDB as its own
    // mark-join — the ONE join form where the planner, not the query
    // author, must carry the ANSI null semantics, so the engine runs the
    // shared SQL text verbatim rather than hand-rewriting. Scale shape:
    // the NOT-IN list is the high-value-customer set (aggregate-pruned,
    // broadcastable); the probe side streams.
    "q_join_anti_null" -> Q(SqlSurfaceTexts.antiNullSql) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(SqlSurfaceTexts.antiNullSql)
    },

    // Non-equi (theta) join — planned as a broadcast nested-loop join with
    // the small side broadcast; count per nation keeps output bounded.
    "q_join_theta" -> Q(
      """SELECT s_nationkey, count(*) AS n_pairs
        |FROM customer JOIN supplier
        |  ON c_acctbal BETWEEN s_acctbal - 100.0 AND s_acctbal + 100.0
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "supplier")),
          col("c_acctbal").between(col("s_acctbal") - 100.0, col("s_acctbal") + 100.0))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("s_nationkey"))
    },

    // Explicit broadcast of a small dimension (Redshift `diststyle all`
    // analog, core.py:201-204): no shuffle of the fact side.
    "q_join_broadcast" -> Q(
      s"""SELECT p_brand, count(*) AS n, ${oSumMoney("l_extendedprice")} AS total
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 10
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val smallParts = t(s, dir, "part").filter(col("p_size") <= 10)
      t(s, dir, "lineitem")
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sumMoney(col("l_extendedprice")).as("total"))
        .orderBy(col("p_brand"))
    },

    // Star-schema multi-way join: fact shuffles once per fact-fact key;
    // nation/region ride along as broadcasts (Catalyst reorders + prunes).
    "q_join_multi" -> Q(
      s"""SELECT r_name, n_name, count(*) AS n_lines,
         |       ${oSumRevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey  = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          sumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Correlated LATERAL join (top-2 orders per high-balance customer) —
    // the SQL passthrough form (core.py:84); Catalyst decorrelates the
    // LIMIT-per-group subquery into a ranked window join
    // (WindowGroupLimit + hash join in the physical plan), so no
    // per-customer re-execution happens at scale (same shape as q_topk).
    // ONE string is both the Spark query and the oracle — identical SQL
    // on both engines by construction.
    "q_join_lateral" -> Q(lateralSql) { (s, dir) =>
      Engine.registerAll(s, dir)
      s.sql(lateralSql)
    },

    // Snapshot reconciliation (round 9): diff two versions of a derived
    // table — the data-quality check run after every incremental load
    // (the reference's users re-upload whole frames via pandas_to_redshift,
    // `core.py:205`; diffing snapshots is how they'd audit what changed).
    // Snapshots = per-customer order rollups at two date cuts; a full
    // outer join on the key classifies every customer as added / removed
    // / changed / unchanged, and the summary carries both row counts and
    // the total absolute cents drift per class. Scale shape: two pruned
    // scans (o_orderdate pushed to parquet), two map-side-combinable
    // aggs keyed on o_custkey, one equi-join on the same key — AQE
    // picks broadcast when one snapshot is small. Cents sums: ≤ 6e5
    // orders × 5e7 cents ≈ 3e13 per customer — bigint-safe, and the
    // class-level |Δ| sum stays integer-exact.
    "q_snapshot_diff" -> Q(
      """WITH a AS (SELECT o_custkey AS k, cast(count(*) as bigint) AS n,
        |             cast(sum(cast(floor(o_totalprice * 100) as bigint))
        |               as bigint) AS cents
        |           FROM orders WHERE o_orderdate < DATE '1998-01-01'
        |           GROUP BY 1),
        |b AS (SELECT o_custkey AS k, cast(count(*) as bigint) AS n,
        |        cast(sum(cast(floor(o_totalprice * 100) as bigint))
        |          as bigint) AS cents
        |      FROM orders WHERE o_orderdate < DATE '2000-01-01'
        |      GROUP BY 1),
        |d AS (SELECT coalesce(a.k, b.k) AS k,
        |        CASE WHEN a.k IS NULL THEN 'added'
        |             WHEN b.k IS NULL THEN 'removed'
        |             WHEN a.n <> b.n OR a.cents <> b.cents THEN 'changed'
        |             ELSE 'unchanged' END AS status,
        |        abs(coalesce(b.cents, 0) - coalesce(a.cents, 0)) AS drift
        |      FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT status, cast(count(*) as bigint) AS n_keys,
        |  cast(sum(drift) as bigint) AS abs_drift_cents
        |FROM d GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      def snap(cut: String): DataFrame = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit(cut).cast("date"))
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast(LongType)).as("cents"))
      val a = snap("1998-01-01")
      val b = snap("2000-01-01")
      val aa = a.select(col("k").as("ak"), col("n").as("an"), col("cents").as("ac"))
      val bb = b.select(col("k").as("bk"), col("n").as("bn"), col("cents").as("bc"))
      aa.join(bb, col("ak") === col("bk"), "full_outer")
        .select(
          when(col("ak").isNull, "added")
            .when(col("bk").isNull, "removed")
            .when(col("an") =!= col("bn") || col("ac") =!= col("bc"), "changed")
            .otherwise("unchanged").as("status"),
          abs(coalesce(col("bc"), lit(0L)) - coalesce(col("ac"), lit(0L)))
            .as("drift"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_keys"), sum(col("drift")).as("abs_drift_cents"))
        .orderBy(col("status"))
    },

    // Declarative data-quality audit (round 9): the constraint checks a
    // warehouse runs after every load — primary-key uniqueness,
    // referential integrity, NOT NULL, value ranges — as ONE report
    // (check_name, n_checked, n_violations, passed). On this clean
    // synthetic data every check passes with zero violations, which is
    // the desired steady state of a DQ report (n_checked carries the
    // non-trivial hash weight). Scale shape: each check is one pruned
    // scan + count or one anti-join on the key it validates; the checks
    // union as independent branches (a scheduler can run them in
    // parallel or incrementally per partition).
    "q_dq_checks" -> Q(
      """SELECT check_name, n_checked, n_violations,
        |  n_violations = 0 AS passed
        |FROM (
        |  SELECT 'customer_name_notnull' AS check_name,
        |    cast(count(*) as bigint) AS n_checked,
        |    cast(count(*) FILTER (c_name IS NULL) as bigint) AS n_violations
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk', cast(count(*) as bigint),
        |    cast(count(*) FILTER (o.o_orderkey IS NULL) as bigint)
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem_qty_range', cast(count(*) as bigint),
        |    cast(count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
        |      as bigint)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_custkey_fk', cast(count(*) as bigint),
        |    cast(count(*) FILTER (c.c_custkey IS NULL) as bigint)
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |  UNION ALL
        |  SELECT 'orders_pk_unique',
        |    cast(count(*) as bigint),
        |    cast(count(*) - count(DISTINCT o_orderkey) as bigint)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_totalprice_pos', cast(count(*) as bigint),
        |    cast(count(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0)
        |      as bigint)
        |  FROM orders) x
        |ORDER BY check_name""".stripMargin) { (s, dir) =>
      dqReport(t(s, dir, "customer"), t(s, dir, "orders"), t(s, dir, "lineitem"))
    },

    // Functional-dependency profiling (round 9): does column A determine
    // column B — the Metanome-style FD check a schema-discovery /
    // normalization pass runs before trusting a join key or collapsing
    // a dimension. For each candidate (lhs → rhs): |distinct lhs| vs
    // |distinct (lhs, rhs)| — equal ⇔ the FD holds; the difference
    // counts violating lhs groups' extra rhs values. Candidates span a
    // true FD (nation key → region key), a near-miss, and clear
    // negatives, so both verdicts are exercised. Scale shape: each
    // candidate is two map-side-combinable distinct aggregates over a
    // pruned 2-column scan, unioned as independent branches (the
    // q_dq_checks shape).
    "q_fd_check" -> Q(
      """SELECT * FROM (
        |  SELECT 'nation: n_nationkey -> n_regionkey' AS fd,
        |    cast(count(DISTINCT n_nationkey) as bigint) AS n_lhs,
        |    cast(count(DISTINCT (n_nationkey, n_regionkey)) as bigint) AS n_pairs,
        |    count(DISTINCT n_nationkey)
        |      = count(DISTINCT (n_nationkey, n_regionkey)) AS holds
        |  FROM nation
        |  UNION ALL
        |  SELECT 'customer: c_nationkey -> c_mktsegment',
        |    cast(count(DISTINCT c_nationkey) as bigint),
        |    cast(count(DISTINCT (c_nationkey, c_mktsegment)) as bigint),
        |    count(DISTINCT c_nationkey)
        |      = count(DISTINCT (c_nationkey, c_mktsegment))
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders: o_custkey -> o_orderpriority',
        |    cast(count(DISTINCT o_custkey) as bigint),
        |    cast(count(DISTINCT (o_custkey, o_orderpriority)) as bigint),
        |    count(DISTINCT o_custkey)
        |      = count(DISTINCT (o_custkey, o_orderpriority))
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem: l_orderkey -> l_returnflag',
        |    cast(count(DISTINCT l_orderkey) as bigint),
        |    cast(count(DISTINCT (l_orderkey, l_returnflag)) as bigint),
        |    count(DISTINCT l_orderkey)
        |      = count(DISTINCT (l_orderkey, l_returnflag))
        |  FROM lineitem) x
        |ORDER BY fd""".stripMargin) { (s, dir) =>
      def branch(table: String, lhs: String, rhs: String): DataFrame =
        t(s, dir, table)
          .agg(countDistinct(col(lhs)).as("n_lhs"),
            countDistinct(col(lhs), col(rhs)).as("n_pairs"))
          .select(lit(s"$table: $lhs -> $rhs").as("fd"),
            col("n_lhs"), col("n_pairs"),
            (col("n_lhs") === col("n_pairs")).as("holds"))
      branch("nation", "n_nationkey", "n_regionkey")
        .union(branch("customer", "c_nationkey", "c_mktsegment"))
        .union(branch("orders", "o_custkey", "o_orderpriority"))
        .union(branch("lineitem", "l_orderkey", "l_returnflag"))
        .orderBy(col("fd"))
    }
  )

  /** The q_dq_checks report over arbitrary customer/orders/lineitem
    * frames — factored out so DqSpec can drive it with DIRTY data and
    * prove each check detects (on the clean testdata every check passes,
    * which exercises nothing).
    */
  private[operators] def dqReport(cust: DataFrame, ord: DataFrame,
      li: DataFrame): DataFrame = {
    def one(name: String, df: DataFrame, bad: Column): DataFrame =
      df.agg(count(lit(1)).as("n_checked"),
          count(when(bad, 1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_checked"),
          col("n_violations"))
    val fkLine = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
    val fkOrd = ord.select(col("o_custkey"))
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
    val pkOrd = ord.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("n_violations"))
      .select(lit("orders_pk_unique").as("check_name"), col("n_checked"),
        col("n_violations"))
    one("customer_name_notnull", cust, col("c_name").isNull)
      .unionAll(one("lineitem_orderkey_fk", fkLine, col("o_orderkey").isNull))
      .unionAll(one("lineitem_qty_range", li,
        col("l_quantity") < 1 || col("l_quantity") > 50))
      .unionAll(one("orders_custkey_fk", fkOrd, col("c_custkey").isNull))
      .unionAll(pkOrd)
      .unionAll(one("orders_totalprice_pos", ord,
        col("o_totalprice").isNull || col("o_totalprice") <= 0))
      .select(col("check_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
  }
}
