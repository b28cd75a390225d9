package graft.connector

import org.apache.spark.sql.types.StructType

/** Pure SQL-text synthesis: CREATE TABLE with Redshift physical-layout
  * clauses, COPY statements, and credential masking. Golden-string parity
  * with the reference (`/root/reference/pandas_redshift/core.py:171-266`)
  * is pinned by DdlSpec.
  */
object Ddl {

  /** ≙ `create_redshift_table`'s query synthesis (`core.py:184-211`):
    * `create table t (col type, …)` + `diststyle even|all` (validated,
    * `core.py:201-204`) unless a `distkey` overrides it (`core.py:205-207`),
    * then `[interleaved] sortkey(…)` (`core.py:208-211`).
    */
  def createTableSql(
      tableName: String,
      columns: Seq[(String, String)],
      distStyle: String = "even",
      distKey: String = "",
      sortInterleaved: Boolean = false,
      sortKey: String = ""): String = {
    val cols = columns.map { case (n, t) => s"$n $t" }.mkString(", ")
    var q = s"create table $tableName ($cols)"
    if (distKey.isEmpty) {
      if (distStyle != "even" && distStyle != "all")
        throw new IllegalArgumentException("diststyle must be either 'even' or 'all'")
      q += s" diststyle $distStyle"
    } else q += s" distkey($distKey)"
    if (sortKey.nonEmpty) {
      if (sortInterleaved) q += " interleaved"
      q += s" sortkey($sortKey)"
    }
    q
  }

  def createTableSql(tableName: String, schema: StructType): String =
    createTableSql(tableName,
      schema.fields.toSeq.map(f => f.name -> TypeMap.extended(f.dataType)))

  /** ≙ `s3_to_redshift`'s COPY synthesis (`core.py:238-254`): the staged
    * CSV load command with delimiter/header/quote/date-time formats and
    * key/secret vs iam_role vs anonymous auth, optional region and
    * session token.
    */
  def copySql(
      tableName: String,
      stagedPath: String,
      delimiter: String = ",",
      quoteChar: String = "\"",
      dateFormat: String = "auto",
      timeFormat: String = "auto",
      accessKeyId: Option[String] = None,
      secretAccessKey: Option[String] = None,
      iamRole: Option[String] = None,
      region: Option[String] = None,
      sessionToken: Option[String] = None,
      parameters: String = ""): String = {
    val authorization = (accessKeyId, secretAccessKey, iamRole) match {
      case (Some(k), Some(s), _) =>
        s"""
        access_key_id '$k'
        secret_access_key '$s'
        """
      case (_, _, Some(r)) =>
        s"""
        iam_role '$r'
        """
      case _ => ""
    }
    var sql =
      s"""
    copy $tableName
    from '$stagedPath'
    delimiter '$delimiter'
    ignoreheader 1
    csv quote as '$quoteChar'
    dateformat '$dateFormat'
    timeformat '$timeFormat'
    $authorization
    $parameters
    """
    region.foreach(r => sql += s"region '$r'")
    sessionToken.filter(_.nonEmpty).foreach(t => sql += s"\n\tsession_token '$t'")
    sql + ";"
  }

  /** ≙ `mask_aws_credentials` (`core.py:43-48`): the same two lookaround
    * regexes, replacing key/secret values with eight asterisks.
    */
  def maskAwsCredentials(s: String, maskSecrets: Boolean = true): String =
    if (!maskSecrets) s
    else s
      .replaceAll("(?<=access_key_id ')(.*)(?=')", "*" * 8)
      .replaceAll("(?<=secret_access_key ')(.*)(?=')", "*" * 8)
}
