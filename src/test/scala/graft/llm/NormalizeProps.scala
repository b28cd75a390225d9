package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for q_normalize's canonicalization chain: the
  * gate hashes its output, so the chain must be a true canonical form —
  * idempotent, closed over [a-z0-9 ] with single internal spaces, and
  * ASCII-case-insensitive — for ANY input, not just the pre-normalized
  * sf corpora.
  */
object NormalizeProps extends Properties("Normalize") {

  private lazy val spark = TestSpark.spark

  // adversarial mix: letters (both cases), digits, punctuation runs,
  // whitespace runs (space/tab/newline), and multi-byte UTF-8
  private val genChunk: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("!!!", "?.,;", "--", "__", "&*()", "\"'`"),
    Gen.oneOf(" ", "  ", "\t", "\n", " \t "),
    Gen.oneOf("中文", "ß", "café", "😀", "ñ"))
  private val genText: Gen[String] =
    Gen.listOf(genChunk).map(_.mkString).map(_.take(200))

  private def normalize(texts: Seq[String]): Seq[String] = {
    val rows = texts.map(Row(_))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("text", StringType, nullable = false))))
      .select(TextAnalysis.normalizeCol(col("text")).as("n"))
      .collect().map(_.getString(0)).toSeq
  }

  property("idempotent, and closed over single-spaced [a-z0-9]") =
    Prop.forAll(Gen.listOfN(5, genText)) { texts =>
      val once = normalize(texts)
      val twice = normalize(once)
      val canonical = once.forall(n =>
        n.isEmpty || (n.matches("[a-z0-9 ]+") && !n.contains("  ") &&
          !n.startsWith(" ") && !n.endsWith(" ")))
      once == twice && canonical
    }

  property("ASCII-case-insensitive (multi-byte case folds like ß→SS excluded)") =
    Prop.forAll(Gen.listOfN(5, Gen.asciiPrintableStr.map(_.take(100)))) { texts =>
      normalize(texts.map(_.toUpperCase)) == normalize(texts)
    }
}
