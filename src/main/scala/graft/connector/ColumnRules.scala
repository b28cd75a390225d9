package graft.connector

import org.apache.spark.sql.DataFrame

/** Column-name validation, ported from the reference's
  * `validate_column_names` (`/root/reference/pandas_redshift/core.py:90-117`):
  * lowercase every name, reject the 150 Redshift reserved words, and
  * double-quote names containing whitespace. Runs entirely on the driver
  * against `df.schema` — O(columns), no data movement.
  */
object ColumnRules {

  /** The 150 reserved words from
    * `/root/reference/pandas_redshift/redshift_reserve_words.txt`,
    * lowercased exactly as the reference does (`core.py:98`).
    */
  val reservedWords: Set[String] = Set(
    "aes128", "aes256", "all", "allowoverwrite", "analyse", "analyze",
    "and", "any", "array", "as", "asc", "authorization", "backup",
    "between", "binary", "blanksasnull", "both", "bytedict", "bzip2",
    "case", "cast", "check", "collate", "column", "constraint", "create",
    "credentials", "cross", "current_date", "current_time",
    "current_timestamp", "current_user", "current_user_id", "default",
    "deferrable", "deflate", "defrag", "delta", "delta32k", "desc",
    "disable", "distinct", "do", "else", "emptyasnull", "enable",
    "encode", "encrypt", "encryption", "end", "except", "explicit",
    "false", "for", "foreign", "freeze", "from", "full", "globaldict256",
    "globaldict64k", "grant", "group", "gzip", "having", "identity",
    "ignore", "ilike", "in", "initially", "inner", "intersect", "into",
    "is", "isnull", "join", "leading", "left", "like", "limit",
    "localtime", "localtimestamp", "lun", "luns", "lzo", "lzop", "minus",
    "mostly13", "mostly32", "mostly8", "natural", "new", "not", "notnull",
    "null", "nulls", "off", "offline", "offset", "oid", "old", "on",
    "only", "open", "or", "order", "outer", "overlaps", "parallel",
    "partition", "percent", "permissions", "placing", "primary", "raw",
    "readratio", "recover", "references", "respect", "rejectlog",
    "resort", "restore", "right", "select", "session_user", "similar",
    "snapshot", "some", "sysdate", "system", "table", "tag", "tdes",
    "text255", "text32k", "then", "timestamp", "to", "top", "trailing",
    "true", "truncatecolumns", "union", "unique", "user", "using",
    "verbose", "wallet", "when", "where", "with", "without")

  /** Lowercase + validate a single column name; mirrors the per-column
    * logic of `core.py:100-116`. Returns the (possibly quoted) final name.
    */
  def validateName(name: String): String = {
    val lower = name.toLowerCase
    if (reservedWords.contains(lower))
      throw new IllegalArgumentException(
        s"DataFrame column name $lower is a reserve word in redshift")
    if (lower.exists(_.isWhitespace)) "\"" + lower + "\"" else lower
  }

  /** Validate and normalize every column of a DataFrame (≙
    * `validate_column_names`, `core.py:90-117`). The reference quotes ALL
    * columns when ANY contains whitespace (`core.py:111-116`); we keep that
    * behavior for parity.
    */
  def validateColumnNames(df: DataFrame): DataFrame = {
    val lowered = df.columns.map(_.toLowerCase)
    lowered.foreach { c =>
      if (reservedWords.contains(c))
        throw new IllegalArgumentException(
          s"DataFrame column name $c is a reserve word in redshift")
    }
    val anySpace = lowered.exists(_.exists(_.isWhitespace))
    val renamed = if (anySpace) lowered.map(c => "\"" + c + "\"") else lowered
    df.toDF(renamed.toIndexedSeq: _*)
  }
}
