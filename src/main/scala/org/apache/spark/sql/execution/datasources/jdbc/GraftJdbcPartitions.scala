package org.apache.spark.sql.execution.datasources.jdbc

import org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Bridge into Spark's `private[sql]` JDBC partition-predicate generation
  * (`JDBCRelation.columnPartition` — stride math, bound clamping, NULL
  * routing, SPARK-34843 stride alignment), which is pure logic but not
  * public API. Living in Spark's package is the supported-by-convention
  * way for libraries to reach `private[sql]` internals; pinned to the
  * Spark version in build.sbt.
  *
  * Exposed so [[graft.connector.Jdbc.partitionPredicates]] can PREVIEW
  * the exact per-partition WHERE clauses a partitioned Redshift read
  * would ship — the one part of the live-JDBC surface that is
  * deterministic offline, and therefore golden-spec'd (JdbcSpec).
  */
object GraftJdbcPartitions {

  /** Per-partition WHERE clauses for an integral partition column with
    * the given bounds — exactly what `spark.read.jdbc` would execute. A
    * `null` element means "no predicate" (single whole-table partition).
    *
    * `driverClass` only satisfies `JDBCOptions` validation (it resolves
    * and registers the class); nothing connects — predicate generation
    * never touches the network. Derby ships with Spark, so it is a safe
    * always-present default in driverless environments.
    */
  def predicates(
      url: String,
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      driverClass: String = "org.apache.derby.jdbc.EmbeddedDriver"): Seq[String] = {
    val opts = new JDBCOptions(Map(
      JDBCOptions.JDBC_DRIVER_CLASS -> driverClass,
      JDBCOptions.JDBC_URL -> url,
      JDBCOptions.JDBC_TABLE_NAME -> "t",
      JDBCOptions.JDBC_PARTITION_COLUMN -> column,
      JDBCOptions.JDBC_LOWER_BOUND -> lowerBound.toString,
      JDBCOptions.JDBC_UPPER_BOUND -> upperBound.toString,
      JDBCOptions.JDBC_NUM_PARTITIONS -> numPartitions.toString))
    val schema = StructType(Seq(StructField(column, LongType)))
    JDBCRelation.columnPartition(schema, caseInsensitiveResolution, "UTC", opts)
      .map(_.asInstanceOf[JDBCPartition].whereClause).toSeq
  }
}
