package graft.connector

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-parity tests for the pure connector functions, vectors from
  * FIXTURES.md ("Connector-parity test vectors") citing
  * /root/reference/pandas_redshift/core.py.
  */
class ConnectorParitySpec extends AnyFunSuite {

  // ---- type map (core.py:147-159) ----------------------------------

  test("legacy type map reproduces the 6-case reference behavior") {
    assert(TypeMap.legacy(LongType) == "BIGINT")
    assert(TypeMap.legacy(IntegerType) == "INTEGER")
    assert(TypeMap.legacy(ShortType) == "INTEGER")
    assert(TypeMap.legacy(DoubleType) == "REAL")
    assert(TypeMap.legacy(FloatType) == "REAL")
    assert(TypeMap.legacy(TimestampType) == "TIMESTAMP")
    assert(TypeMap.legacy(BooleanType) == "BOOLEAN")
    // the lossy catch-all (core.py:159)
    assert(TypeMap.legacy(StringType) == "VARCHAR(256)")
    assert(TypeMap.legacy(DecimalType(10, 2)) == "VARCHAR(256)")
    assert(TypeMap.legacy(DateType) == "VARCHAR(256)")
  }

  test("extended type map widens the lossy cases and is total") {
    assert(TypeMap.extended(DecimalType(10, 2)) == "DECIMAL(10,2)")
    assert(TypeMap.extended(DateType) == "DATE")
    assert(TypeMap.extended(DoubleType) == "DOUBLE PRECISION")
    assert(TypeMap.extended(StringType) == "VARCHAR(65535)")
    assert(TypeMap.extended(ArrayType(FloatType)) == "SUPER")
    assert(TypeMap.extended(MapType(StringType, LongType)) == "SUPER")
    val all: Seq[DataType] = Seq(LongType, IntegerType, ShortType, ByteType,
      FloatType, DoubleType, DecimalType(38, 6), TimestampType,
      TimestampNTZType, DateType, BooleanType, StringType, BinaryType,
      ArrayType(StringType), MapType(StringType, StringType),
      StructType(Seq(StructField("a", LongType))), NullType,
      CalendarIntervalType)
    all.foreach { dt =>
      assert(TypeMap.legacy(dt).nonEmpty && TypeMap.extended(dt).nonEmpty)
    }
  }

  // ---- reserved words / validation (core.py:90-117) -----------------

  // The reference file has 150 newlines but an unterminated final line —
  // 151 distinct words in total.
  test("reserved word list matches the reference file (151 words)") {
    assert(ColumnRules.reservedWords.size == 151)
  }

  test("reserved column names raise, matching core.py:102-108") {
    for (bad <- Seq("join", "select", "user", "table", "tag", "minus", "JOIN", "Select")) {
      val e = intercept[IllegalArgumentException](ColumnRules.validateName(bad))
      assert(e.getMessage.contains("reserve word in redshift"))
    }
  }

  test("names are lowercased; whitespace names get quoted (core.py:100,110-116)") {
    assert(ColumnRules.validateName("GAME_ID") == "game_id")
    assert(ColumnRules.validateName("My Col") == "\"my col\"")
  }

  test("validation is idempotent on clean names") {
    val once = ColumnRules.validateName("final_margin")
    assert(ColumnRules.validateName(once) == once)
  }

  test("ANY whitespace column quotes ALL columns (core.py:111-116)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((1, 2)).toDF("Plain", "With Space")
    val out = ColumnRules.validateColumnNames(df)
    assert(out.columns.toSeq == Seq("\"plain\"", "\"with space\""))
    // no whitespace anywhere → no quoting at all
    val clean = ColumnRules.validateColumnNames(Seq((1, 2)).toDF("A", "b_c"))
    assert(clean.columns.toSeq == Seq("a", "b_c"))
  }

  // ---- DDL synthesis (core.py:197-211) ------------------------------

  private val cols = Seq("a" -> "BIGINT", "b" -> "VARCHAR(256)")

  test("base DDL: diststyle even") {
    assert(Ddl.createTableSql("t", cols) ==
      "create table t (a BIGINT, b VARCHAR(256)) diststyle even")
  }

  test("distkey overrides diststyle (core.py:205-207)") {
    assert(Ddl.createTableSql("t", cols, distKey = "a") ==
      "create table t (a BIGINT, b VARCHAR(256)) distkey(a)")
  }

  test("sortkey and interleaved sortkey (core.py:208-211)") {
    assert(Ddl.createTableSql("t", cols, sortKey = "a,b") ==
      "create table t (a BIGINT, b VARCHAR(256)) diststyle even sortkey(a,b)")
    assert(Ddl.createTableSql("t", cols, sortInterleaved = true, sortKey = "a") ==
      "create table t (a BIGINT, b VARCHAR(256)) diststyle even interleaved sortkey(a)")
  }

  test("invalid diststyle raises (core.py:201-204)") {
    val e = intercept[IllegalArgumentException](
      Ddl.createTableSql("t", cols, distStyle = "key"))
    assert(e.getMessage.contains("diststyle must be either 'even' or 'all'"))
  }

  // ---- log config (core.py:30-40) -----------------------------------

  test("log level map has the reference's four keys; unknown keys throw") {
    assert(LogConfig.levelMap.keySet == Set("debug", "info", "warn", "error"))
    intercept[NoSuchElementException](
      LogConfig.setLogLevel(graft.TestSpark.spark, "trace"))
    LogConfig.setLogLevel(graft.TestSpark.spark, "warn", maskSecrets = false)
    assert(!LogConfig.maskSecrets)
    LogConfig.setLogLevel(graft.TestSpark.spark, "warn", maskSecrets = true)
    assert(LogConfig.maskSecrets)
  }

  test("jdbc url defaults to port 5439 like connect_to_redshift") {
    assert(Jdbc.url("host.example", "db") == "jdbc:redshift://host.example:5439/db")
  }

  // ---- COPY synthesis + masking (core.py:238-254, 43-48) ------------

  test("COPY with key/secret auth contains both credentials") {
    val sql = Ddl.copySql("t", "/stage/t-x.csv",
      accessKeyId = Some("AKIA123"), secretAccessKey = Some("SECRET456"))
    assert(sql.contains("copy t"))
    assert(sql.contains("from '/stage/t-x.csv'"))
    assert(sql.contains("delimiter ','"))
    assert(sql.contains("ignoreheader 1"))
    assert(sql.contains("csv quote as '\"'"))
    assert(sql.contains("dateformat 'auto'"))
    assert(sql.contains("timeformat 'auto'"))
    assert(sql.contains("access_key_id 'AKIA123'"))
    assert(sql.contains("secret_access_key 'SECRET456'"))
    assert(sql.trim.endsWith(";"))
  }

  test("COPY with iam_role; region and session_token appended") {
    val sql = Ddl.copySql("t", "/s/x.csv", iamRole = Some("arn:role/r"),
      region = Some("us-west-2"), sessionToken = Some("tok"))
    assert(sql.contains("iam_role 'arn:role/r'"))
    assert(!sql.contains("access_key_id"))
    assert(sql.contains("region 'us-west-2'"))
    assert(sql.contains("session_token 'tok'"))
  }

  test("credential masking hides both secrets as ******** (core.py:46-47)") {
    val sql = Ddl.copySql("t", "/s/x.csv",
      accessKeyId = Some("AKIA123"), secretAccessKey = Some("SECRET456"))
    val masked = Ddl.maskAwsCredentials(sql)
    assert(!masked.contains("AKIA123"))
    assert(!masked.contains("SECRET456"))
    assert(masked.contains("access_key_id '********'"))
    assert(masked.contains("secret_access_key '********'"))
    // mask disabled passes through (core.py:44)
    assert(Ddl.maskAwsCredentials(sql, maskSecrets = false) == sql)
  }
}
