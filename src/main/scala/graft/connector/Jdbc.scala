package graft.connector

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC connector form — the Spark mapping of `connect_to_redshift`
  * (`/root/reference/pandas_redshift/core.py:51-59`, default port 5439).
  *
  * In production this is the path a reference user would switch to:
  * `spark.read.jdbc` pulls typed schemas from JDBC metadata and pushes the
  * query down as a subquery, with `partitionColumn/lowerBound/upperBound/
  * numPartitions` splitting the read across executors (vs the reference's
  * single-cursor `fetchall`, `core.py:86`). The environment here has no
  * network egress and no Redshift driver, so [[reader]] only *builds* the
  * configured reader; `.load()` is the caller's (cluster-side) step —
  * everything else in the engine runs against the parquet staging form.
  */
object Jdbc {

  def url(host: String, dbname: String, port: Int = 5439): String =
    s"jdbc:redshift://$host:$port/$dbname"

  /** Option map for an arbitrary SQL read (≙ `redshift_to_pandas`) — a
    * pure function so the exact options are spec-checkable without a live
    * endpoint. Spark's JDBC source REJECTS `query` combined with
    * `partitionColumn`/bounds (AnalysisException at load), so the
    * partitioned path wraps the query as a `dbtable` subquery instead;
    * the unpartitioned path keeps `query` (single-cursor, like the
    * reference's `fetchall`, `core.py:86`).
    */
  def readerOptions(
      jdbcUrl: String,
      query: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 8): Map[String, String] = {
    val base = Map(
      "url" -> jdbcUrl,
      "user" -> user,
      "password" -> password,
      "numPartitions" -> numPartitions.toString)
    (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        base ++ Map(
          "dbtable" -> s"($query) graft_subquery",
          "partitionColumn" -> c,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString)
      case _ => base + ("query" -> query)
    }
  }

  /** Preview the per-partition WHERE clauses a partitioned read with
    * these bounds would execute — Spark's real predicate generation
    * (stride math, bound clamping, NULL routing to partition 0, stride
    * alignment), reached through a package bridge because the logic is
    * `private[sql]` yet pure. Lets a user sanity-check partition skew
    * (e.g. a sparse id range producing empty leading partitions) BEFORE
    * paying for a live cluster read; golden-spec'd in JdbcSpec for
    * representative bounds. A `null` element = unpredicated whole-table
    * partition (numPartitions 1 or a degenerate lo == hi range).
    */
  def partitionPredicates(jdbcUrl: String, column: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int): Seq[String] =
    org.apache.spark.sql.execution.datasources.jdbc.GraftJdbcPartitions
      .predicates(jdbcUrl, column, lowerBound, upperBound, numPartitions)

  /** Configured JDBC reader over [[readerOptions]]. */
  def reader(
      spark: SparkSession,
      jdbcUrl: String,
      query: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 8): DataFrameReader =
    spark.read.format("jdbc").options(readerOptions(jdbcUrl, query, user,
      password, partitionColumn, lowerBound, upperBound, numPartitions))

  /** Parallel table write over JDBC (≙ the COPY-less direct path). */
  def writeTable(df: DataFrame, jdbcUrl: String, table: String,
      user: String, password: String, append: Boolean): Unit =
    df.write.format("jdbc")
      .option("url", jdbcUrl).option("dbtable", table)
      .option("user", user).option("password", password)
      .mode(if (append) "append" else "overwrite")
      .save()
}
