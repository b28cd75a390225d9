package graft.connector

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end JDBC drive against embedded Derby (round 7) — the one
  * reference entry point (`connect_to_redshift` + `redshift_to_pandas`,
  * `/root/reference/pandas_redshift/core.py:51-59,82-87`) executed
  * through a REAL java.sql driver instead of only golden-spec'd option
  * maps: Spark ships Derby on its classpath, so the zero-egress sandbox
  * can still prove that [[Jdbc.readerOptions]]' partitioned dbtable
  * subquery parses, that the partition predicates actually split the
  * read, and that the parallel write path round-trips.
  *
  * Derby notes: in-memory url (`jdbc:derby:memory:*;create=true`) keeps
  * the suite stateless; unquoted identifiers are stored uppercase, so
  * the partition column is passed as `ID` (Spark quotes the caller's
  * spelling verbatim into the per-partition WHERE clauses).
  */
class JdbcDerbySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // idempotent: drop-if-exists (Derby has no IF EXISTS — swallow the
      // table-missing error, same pattern as the reference's
      // unconditional `drop table if exists` at core.py:215)
      try st.executeUpdate("DROP TABLE people") catch { case _: Exception => () }
      st.executeUpdate(
        "CREATE TABLE people (id INT NOT NULL, name VARCHAR(32), amount DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"name_$i"); ps.setDouble(3, i * 1.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("partitioned read: dbtable subquery + bounds split the scan into real partitions") {
    seed()
    // the exact option map JdbcSpec golden-pins, now driven end-to-end:
    // partitioned form must wrap the query as a dbtable subquery (Spark
    // rejects `query` + partitionColumn) and produce numPartitions
    // RDD partitions whose union is the full, non-overlapping row set
    val df = Jdbc.reader(spark, url,
      "SELECT id, name, amount FROM people WHERE id >= 0", user = "", password = "",
      partitionColumn = Some("ID"), lowerBound = Some(0L),
      upperBound = Some(100L), numPartitions = 4).load()
    assert(df.rdd.getNumPartitions == 4,
      "bounds must fan the read out into 4 JDBC partitions")
    // per-partition counts mirror Jdbc.partitionPredicates' stride math:
    // [<25 | 25..50 | 50..75 | >=75] over ids 0..99
    val perPart = df.rdd.mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    assert(perPart == Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25), s"got $perPart")
    assert(df.count() == 100)
    val sums = df.agg(sum(col("ID")).cast("long"), sum(col("AMOUNT"))).head()
    assert(sums.getLong(0) == 4950L)
    assert(math.abs(sums.getDouble(1) - 4950 * 1.5) < 1e-9)
  }

  test("unpartitioned read uses the query option and agrees with the partitioned read") {
    seed()
    val df = Jdbc.reader(spark, url,
      "SELECT count(*) AS n, sum(id) AS s FROM people", "", "").load()
    val r = df.head()
    // Derby surfaces count(*)/sum(INT) as INT vs Spark's BIGINT habit —
    // compare value, not boxed type
    assert(r.get(0).toString.toLong == 100L && r.get(1).toString.toLong == 4950L)
    assert(df.rdd.getNumPartitions == 1, "query form is a single cursor")
  }

  test("writeTable round-trips: parallel JDBC write, read-back hash-equal") {
    seed()
    val src = Jdbc.reader(spark, url, "SELECT id, name, amount FROM people",
      "", "", Some("ID"), Some(0L), Some(100L), numPartitions = 4).load()
    Jdbc.writeTable(src, url, "people_copy", "", "", append = false)
    // append mode doubles it — the reference's pandas_to_redshift append
    // flag (core.py:279,297)
    Jdbc.writeTable(src.filter(col("ID") < 10), url, "people_copy", "", "",
      append = true)
    val back = Jdbc.reader(spark, url,
      "SELECT id, name, amount FROM people_copy", "", "").load()
    assert(back.count() == 110L)
    val s = back.agg(sum(col("ID")).cast("long")).head().getLong(0)
    assert(s == 4950L + 45L)
    // full-row fidelity on the overwrite part: anti-join against the
    // source over every column is empty
    val copyOnce = back.groupBy(col("ID"), col("NAME"), col("AMOUNT"))
      .agg(count(lit(1)).as("n"))
    val srcRows = src.select(col("ID"), col("NAME"), col("AMOUNT"))
    assert(copyOnce.join(srcRows, Seq("ID", "NAME", "AMOUNT"), "left_anti").isEmpty,
      "copied rows must all exist in the source")
    assert(srcRows.join(copyOnce, Seq("ID", "NAME", "AMOUNT"), "left_anti").isEmpty,
      "no source row may be lost")
  }

  test("NULL partition-column rows route to partition 0 in a REAL partitioned read") {
    // partitionPredicates' NULL routing was golden-spec'd only; drive it:
    // Spark's first generated WHERE clause carries `OR col IS NULL`, so
    // rows with a NULL partition column must land in partition 0 and be
    // neither lost nor duplicated across the others
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE people_nulls") catch { case _: Exception => () }
      st.executeUpdate("CREATE TABLE people_nulls (id INT, name VARCHAR(32))")
      val ps = conn.prepareStatement("INSERT INTO people_nulls VALUES (?, ?)")
      (0 until 90).foreach { i => ps.setInt(1, i); ps.setString(2, s"n_$i"); ps.addBatch() }
      (0 until 10).foreach { i =>
        ps.setNull(1, java.sql.Types.INTEGER); ps.setString(2, s"null_$i"); ps.addBatch()
      }
      ps.executeBatch(); st.close(); ps.close()
    } finally conn.close()
    val preds = Jdbc.partitionPredicates(url, "ID", 0L, 90L, 3)
    assert(preds.head.toLowerCase.contains("is null"),
      s"first partition predicate must route NULLs: ${preds.head}")
    assert(preds.tail.forall(p => !p.toLowerCase.contains("is null")),
      s"only partition 0 may claim NULLs: $preds")
    val df = Jdbc.reader(spark, url, "SELECT id, name FROM people_nulls",
      "", "", Some("ID"), Some(0L), Some(90L), numPartitions = 3).load()
    val perPart = df.rdd.mapPartitionsWithIndex((i, it) => Iterator(i -> it.size))
      .collect().toMap
    assert(perPart == Map(0 -> 40, 1 -> 30, 2 -> 30),
      s"NULLs must all land in partition 0 (30+10|30|30): got $perPart")
    assert(df.count() == 100 && df.filter(col("ID").isNull).count() == 10)
  }

  test("reserved-word columns are rejected BEFORE any load; whitespace names reach Derby DDL quoted") {
    // reserved word: the validator throws on the driver — nothing is
    // staged and no table (Spark or Derby) is touched
    val bad = spark.range(3).select(col("id").as("select"))
    val sess = Connector.connectStaging(spark, "/tmp/graft_stage/derby_colrules")
    val e = intercept[IllegalArgumentException] {
      Connector.writeTable(sess, bad, "derby_reserved", verbose = false)
    }
    assert(e.getMessage.contains("reserve word"))
    assert(!spark.catalog.tableExists("derby_reserved"),
      "rejection must happen before any DDL executes")
    // whitespace: ColumnRules quotes the lowercased name; that quoted
    // form is valid delimited-identifier DDL on a real database
    val quoted = ColumnRules.validateName("First Name")
    assert(quoted == "\"first name\"")
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate("DROP TABLE spacey") catch { case _: Exception => () }
      st.executeUpdate(s"CREATE TABLE spacey ($quoted VARCHAR(32), amount INT)")
      st.close()
    } finally conn.close()
    // Spark's JDBC writer quotes identifiers itself, so it gets the RAW
    // validated name (quotes are DDL text, not part of the identifier)
    val raw = quoted.stripPrefix("\"").stripSuffix("\"")
    val rows = spark.range(5).select(
      concat(lit("v"), col("id")).as(raw), col("id").cast("int").as("amount"))
    Jdbc.writeTable(rows, url, "spacey", "", "", append = true)
    val back = Jdbc.reader(spark, url,
      s"SELECT $quoted, amount FROM spacey", "", "").load()
    assert(back.columns.map(_.toLowerCase).contains("first name"))
    assert(back.count() == 5)
    assert(back.filter(col("`first name`") === "v3").count() == 1)
  }

  test("two concurrent staged appends both land exactly once (uuid stage isolation)") {
    // writeTable names its staged CSV with a fresh UUID (core.py:291
    // parity), so two racing loads must never clobber each other's
    // stage; the appends themselves go through Spark's file commit
    // protocol. Run both appends truly concurrently and assert the
    // union landed exactly once.
    val sess = Connector.connectStaging(spark, "/tmp/graft_stage/derby_race")
    import spark.implicits._
    val base = Seq((0L, "base")).toDF("id", "grp")
    spark.sql("DROP TABLE IF EXISTS race_target")
    Connector.writeTable(sess, base, "race_target", verbose = false)
    val a = (1L to 50L).map(i => (i, "a")).toDF("id", "grp")
    val b = (51L to 100L).map(i => (i, "b")).toDF("id", "grp")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(1)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = Seq(a, b).map { d =>
      Future { gate.await(); Connector.writeTable(sess, d, "race_target",
        append = true, verbose = false) }
    }
    gate.countDown()
    Await.result(Future.sequence(fs), 120.seconds)
    pool.shutdown()
    val got = spark.table("race_target")
    assert(got.count() == 101L, "both concurrent appends must land")
    assert(got.select("id").distinct().count() == 101L, "no duplicated rows")
    assert(got.filter($"grp" === "a").count() == 50L
      && got.filter($"grp" === "b").count() == 50L)
    spark.sql("DROP TABLE IF EXISTS race_target")
  }

  test("staged path: JDBC read feeds the connector's CSV-stage + COPY-shaped load") {
    seed()
    // the reference's full pipeline shape (pandas_to_redshift,
    // core.py:269-304): arbitrary-SQL read → staged CSV → table load —
    // here with the read side on a real JDBC driver and the load side on
    // the engine's staged-parquet table path
    val src = Jdbc.reader(spark, url, "SELECT id, name, amount FROM people",
      "", "", Some("ID"), Some(0L), Some(100L), numPartitions = 4).load()
      .select(col("ID").as("id"), col("NAME").as("name"), col("AMOUNT").as("amount"))
    val sess = Connector.connectStaging(spark, "/tmp/graft_stage/derby_e2e")
    Connector.writeTable(sess, src, "derby_people", verbose = false)
    val back = spark.table("derby_people")
    assert(back.count() == 100L)
    assert(back.agg(sum(col("id")).cast("long")).head().getLong(0) == 4950L)
    spark.sql("DROP TABLE IF EXISTS derby_people")
  }
}
