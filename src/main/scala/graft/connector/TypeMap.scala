package graft.connector

import org.apache.spark.sql.types._

/** Catalyst type → Redshift DDL type.
  *
  * `legacy` mode reproduces the reference's 6-case pandas-dtype map
  * (`/root/reference/pandas_redshift/core.py:147-159`) including the lossy
  * catch-all `VARCHAR(256)`. `extended` mode (default) adds the types the
  * reference silently degrades — DECIMAL/DATE/DOUBLE/strings-as-64k — and
  * maps nested types to SUPER. Both are total functions.
  */
object TypeMap {

  /** ≙ `pd_dtype_to_redshift_dtype` (`core.py:147-159`): int64→BIGINT,
    * other ints→INTEGER, floats→REAL, datetime→TIMESTAMP, bool→BOOLEAN,
    * everything else→VARCHAR(256).
    */
  def legacy(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BooleanType => "BOOLEAN"
    case _ => "VARCHAR(256)"
  }

  /** Extended map: keeps the legacy verdicts where they are lossless and
    * widens the lossy ones (SURVEY §7 "lossy VARCHAR(256)" decision).
    */
  def extended(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(65535)"
    case BinaryType => "VARBYTE"
    case _: ArrayType | _: MapType | _: StructType => "SUPER"
    case _ => "VARCHAR(256)"
  }

  /** ≙ `get_column_data_types` (`core.py:162-168`). */
  def columnTypes(schema: StructType, strict: Boolean = false): Seq[String] =
    schema.fields.toSeq.map(f => if (strict) legacy(f.dataType) else extended(f.dataType))
}
