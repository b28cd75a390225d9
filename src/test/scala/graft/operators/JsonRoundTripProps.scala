package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck property for the JSON-lines staging leg (q_scan_json's
  * generalization): rows of the engine's scalar types survive
  * write.json → read.json(schema) unchanged — pinning JSON escaping of
  * quotes, backslashes, control-adjacent punctuation and unicode, plus
  * null round-tripping (absent key ⇒ null on read).
  */
object JsonRoundTripProps extends Properties("JsonRoundTrip") {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("c_long", LongType),
    StructField("c_bool", BooleanType),
    StructField("c_str", StringType),
    StructField("c_arr", ArrayType(LongType, containsNull = false))))

  private val genString: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar,
    Gen.oneOf(' ', '"', '\\', '/', '{', '}', '[', ']', ':', ',', 'ü', '中', '€')))
    .map(_.mkString)

  private val genRow: Gen[(Option[Long], Boolean, Option[String], Seq[Long])] = for {
    l <- Gen.option(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2))
    b <- Gen.oneOf(true, false)
    s <- Gen.option(genString)
    a <- Gen.listOfN(3, Gen.chooseNum(-1000L, 1000L))
  } yield (l, b, s, a)

  property("write.json then read.json(schema) is identity") =
    Prop.forAll(Gen.nonEmptyListOf(genRow)) { rows =>
      val data = rows.zipWithIndex.map { case ((l, b, s, a), id) =>
        Row(id.toLong, l.orNull, b, s.orNull, a)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, 2), schema)
      val path = "/tmp/graft_test_stage/json_prop"
      df.write.mode("overwrite").json(path)
      val back = spark.read.schema(schema).json(path)
      val x = df.collect().sortBy(_.getLong(0)).toSeq
      val y = back.collect().sortBy(_.getLong(0)).toSeq
      x == y
    }
}
