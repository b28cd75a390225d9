package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale utilities for the 100 TB operating point: skew-salted joins and
  * bucketed co-located joins. Correctness-neutral plan rewrites — the
  * specs assert both result-equivalence with the naive plan and the
  * intended physical shape.
  */
object Scale {

  /** Salted equi-join for skewed keys. The big side gets a random salt in
    * [0, salt); the small side is exploded `salt`-fold so every
    * (key, salt) bucket finds its partner. Breaks a hot key across `salt`
    * reducers at the cost of replicating the small side — the classic
    * remedy when AQE's skew-join split isn't available (e.g. the skew is
    * in a hash aggregate's input, or pre-3.0 clusters).
    *
    * AQE note: `spark.sql.adaptive.skewJoin` already splits skewed SMJ
    * partitions at runtime; use explicit salting when the join is
    * broadcast-ineligible AND a single key exceeds one executor's memory.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 16, joinType: String = "inner"): DataFrame = {
    // Replicating the small side is only sound when its unmatched rows
    // can't surface: a right/full outer join would emit every unmatched
    // small row `salt` times.
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * salt).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Hive-style partitioned layout (≙ Redshift sortkey zone maps at the
    * directory level, SURVEY §1/§4): filters on the partition column prune
    * whole directories before any IO — at 100 TB, date-partitioned facts
    * turn time-range queries into scans of only the touched days.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** Write both sides bucketed+sorted on the join key so subsequent joins
    * are Exchange-free (co-located, the Spark analog of matching Redshift
    * distkeys — `core.py:205-207`). Buckets ≙ fixed hash partitioning
    * persisted in the table layout; at 100 TB this turns every fact-fact
    * join on the key into a zip of pre-sorted buckets.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(s"$wh/$table")
    graft.util.Fs.deleteRecursively(loc.getPath)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", loc.getAbsolutePath)
      .saveAsTable(table)
  }
}
