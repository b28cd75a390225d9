package graft.connector

import org.scalatest.funsuite.AnyFunSuite

/** The JDBC path can never connect in this environment (zero egress), but
  * the option map it would hand Spark is a pure function — pin it exactly.
  * Spark's JDBC source rejects `query` combined with `partitionColumn`/
  * bounds, so the partitioned path must carry the query as a `dbtable`
  * subquery instead; getting this wrong only surfaces at load() time on a
  * live cluster.
  */
class JdbcSpec extends AnyFunSuite {

  test("url builds the reference's redshift endpoint (default port 5439)") {
    assert(Jdbc.url("host.example", "mydb") == "jdbc:redshift://host.example:5439/mydb")
    assert(Jdbc.url("h", "db", 5555) == "jdbc:redshift://h:5555/db")
  }

  test("unpartitioned read uses the query option") {
    val opts = Jdbc.readerOptions(
      Jdbc.url("h", "db"), "SELECT * FROM t", "u", "p")
    assert(opts == Map(
      "url" -> "jdbc:redshift://h:5439/db",
      "user" -> "u",
      "password" -> "p",
      "numPartitions" -> "8",
      "query" -> "SELECT * FROM t"))
  }

  test("partitioned read wraps the query as a dbtable subquery (no query option)") {
    val opts = Jdbc.readerOptions(
      Jdbc.url("h", "db"), "SELECT * FROM t", "u", "p",
      partitionColumn = Some("id"), lowerBound = Some(0L),
      upperBound = Some(1000L), numPartitions = 16)
    assert(opts == Map(
      "url" -> "jdbc:redshift://h:5439/db",
      "user" -> "u",
      "password" -> "p",
      "numPartitions" -> "16",
      "dbtable" -> "(SELECT * FROM t) graft_subquery",
      "partitionColumn" -> "id",
      "lowerBound" -> "0",
      "upperBound" -> "1000"))
    assert(!opts.contains("query"))
  }

  test("reader builds without touching the network") {
    // construction must not connect; only load() would
    Jdbc.reader(graft.TestSpark.spark, Jdbc.url("h", "db"),
      "SELECT 1", "u", "p", Some("id"), Some(0L), Some(10L))
  }
}
