package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the round-11 kernels the gate hashes:
  * the exact-substring window projection (q_dedup_suffix /
  * q_span_provenance) and the DSIR hashed-feature space
  * (q_dsir_weights / s_dsir_gate). Both must hold for ANY
  * single-spaced token stream, not just the sf corpora.
  */
object SuffixDsirProps extends Properties("SuffixDsir") {

  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val genTok: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(_.mkString)

  // short docs (< 50 tokens, zero windows) through window-bearing ones
  private val genDoc: Gen[Seq[String]] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, genTok))

  property("suffixWindows equals the brute-force 50-token slide (positions AND md5 keys)") =
    Prop.forAll(Gen.listOfN(3, genDoc)) { docs =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => Row(i.toLong, t.mkString(" ")) }, 2),
        StructType(Seq(StructField("doc_id", LongType, nullable = false),
          StructField("text", StringType, nullable = false))))
      val got = Dedup.suffixWindows(df).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val want = docs.zipWithIndex.flatMap { case (t, i) =>
        // split("", " ") yields [""] — one token, never a window
        val toks = if (t.isEmpty) Seq("") else t
        toks.sliding(50).zipWithIndex.collect {
          case (w, p) if w.length == 50 =>
            (i.toLong, p + 1, md5hex(w.mkString(" ")))
        }
      }.toSet
      got == want
    }

  property("dsirBucketCol lands in [0, 1024) and replays MessageDigest md5 nibbles") =
    Prop.forAll(Gen.listOfN(8, genTok)) { grams =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(grams.map(Row(_)), 2),
        StructType(Seq(StructField("g", StringType, nullable = false))))
      val got = df.select(col("g"),
          TextAnalysis.dsirBucketCol(col("g")).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      grams.forall { g =>
        val b = java.lang.Long.parseLong(md5hex(g).substring(0, 4), 16) % 1024
        got(g) == b && b >= 0 && b < 1024
      }
    }

  property("s_dsir_gate's in-row gram array equals the batch unigram+bigram multiset") =
    Prop.forAll(Gen.listOfN(3, genDoc)) { docs =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) =>
            Row(i.toLong, "en", t.mkString(" ")) }, 2),
        StructType(Seq(StructField("doc_id", LongType, nullable = false),
          StructField("lang", StringType, nullable = false),
          StructField("text", StringType, nullable = false))))
      val inRow = df.select(col("doc_id"),
          explode(concat(split(col("text"), " "),
            graft.functions.TextExpressions.shingles(col("text"), 2))).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val batch = TextAnalysis.dsirFeatures(df)
        .collect().map(r => (r.getLong(0), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      inRow == batch
    }
}
