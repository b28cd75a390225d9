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
