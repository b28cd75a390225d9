package graft.connector

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck property (FIXTURES.md "CSV round-trip"): DataFrames of the
  * six reference-mapped types survive the staged-CSV write→read leg
  * unchanged — pinning the delimiter/quote/null/timestamp-format semantics
  * of `core.py:120-144` + `core.py:241-249`. Strings include quotes,
  * delimiters and unicode (newlines excluded: the reads are single-line
  * mode, as COPY's are).
  */
object CsvRoundTripProps extends Properties("CsvRoundTrip") {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c_int", IntegerType),
    StructField("c_double", DoubleType),
    StructField("c_bool", BooleanType),
    StructField("c_ts", TimestampType),
    StructField("c_str", StringType)))

  private val genString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', ',', '|', '"', '\'', ';', 'ü', '中', '$')))
    .map(_.mkString).map(s => if (s.isEmpty) "x" else s)

  private val genRow: Gen[(Int, Double, Boolean, Long, String)] = for {
    i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    d <- Gen.chooseNum(-1e12, 1e12)
    b <- Gen.oneOf(true, false)
    tsSec <- Gen.chooseNum(0L, 4102444800L) // 1970..2100
    s <- genString
  } yield (i, d, b, tsSec, s)

  property("write.csv then read.csv(schema) is identity") =
    Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val data = rows.zipWithIndex.map { case ((i, d, b, t, s), id) =>
        Row(id.toLong, i, d, b, new Timestamp(t * 1000L + id % 1000), s)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 2), schema)
      val path = "/tmp/graft_test_stage/csv_prop"
      df.write.mode("overwrite")
        .option("header", "true").option("sep", "|")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        // fidelity: don't trim surrounding whitespace, and write empty
        // strings quoted so they don't read back as null
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .option("emptyValue", "\"\"")
        .csv(path)
      val back = spark.read.schema(schema)
        .option("header", "true").option("sep", "|")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(path)
      val a = df.collect().sortBy(_.getLong(0)).toSeq
      val bk = back.collect().sortBy(_.getLong(0)).toSeq
      a == bk
    }
}
