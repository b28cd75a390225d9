package graft.connector

import org.apache.spark.sql.SparkSession

/** ≙ `set_log_level` + the mask flag (`core.py:23-48`): the same four-key
  * level map (unknown keys throw, like the reference's dict KeyError) and
  * a process-wide mask toggle consumed by [[Ddl.maskAwsCredentials]]
  * call sites.
  */
object LogConfig {
  val levelMap: Map[String, String] = Map(
    "debug" -> "DEBUG", "info" -> "INFO", "warn" -> "WARN", "error" -> "ERROR")

  @volatile var maskSecrets: Boolean = true

  def setLogLevel(spark: SparkSession, level: String,
      maskSecrets: Boolean = true): Unit = {
    val l = levelMap.getOrElse(level,
      throw new NoSuchElementException(s"key not found: $level"))
    spark.sparkContext.setLogLevel(l)
    this.maskSecrets = maskSecrets
  }
}
