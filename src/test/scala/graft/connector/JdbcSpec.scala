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

  // ---- partition predicate generation (golden) ----------------------
  // partitionPredicates surfaces Spark's real columnPartition logic; the
  // strings below pin its stride math, clamping, NULL routing, and
  // identifier quoting for representative bounds. A Spark upgrade that
  // shifts partition boundaries (data placement on a live cluster read)
  // fails here instead of silently changing executor load shapes.

  private def preds(lo: Long, hi: Long, n: Int): Seq[String] =
    Jdbc.partitionPredicates(Jdbc.url("h", "db"), "id", lo, hi, n)

  test("partition predicates: even stride — first partition collects NULLs, ends unbounded") {
    assert(preds(0L, 100L, 4) == Seq(
      """"id" < 25 or "id" is null""",
      """"id" >= 25 AND "id" < 50""",
      """"id" >= 50 AND "id" < 75""",
      """"id" >= 75"""))
  }

  test("partition predicates: negative bounds use floor-aligned strides") {
    assert(preds(-7L, 8L, 3) == Seq(
      """"id" < -2 or "id" is null""",
      """"id" >= -2 AND "id" < 3""",
      """"id" >= 3"""))
  }

  test("partition predicates: uneven range aligns interior bounds, outer partitions absorb the remainder") {
    // range 9 / 4 partitions: stride 2, remainder pushed to the UNBOUNDED
    // outer partitions (< 4 and >= 8), keeping interior partitions exact
    assert(preds(1L, 10L, 4) == Seq(
      """"id" < 4 or "id" is null""",
      """"id" >= 4 AND "id" < 6""",
      """"id" >= 6 AND "id" < 8""",
      """"id" >= 8"""))
    assert(preds(-5L, 6L, 4) == Seq(
      """"id" < -1 or "id" is null""",
      """"id" >= -1 AND "id" < 1""",
      """"id" >= 1 AND "id" < 3""",
      """"id" >= 3"""))
  }

  test("partition predicates: numPartitions clamps to the range width") {
    // 10 requested over a width-3 range: 3 partitions, stride 1
    assert(preds(0L, 3L, 10) == Seq(
      """"id" < 1 or "id" is null""",
      """"id" >= 1 AND "id" < 2""",
      """"id" >= 2"""))
  }

  test("partition predicates: single partition and degenerate range read whole-table") {
    assert(preds(0L, 100L, 1) == Seq(null))
    assert(preds(5L, 5L, 4) == Seq(null))
  }
}
