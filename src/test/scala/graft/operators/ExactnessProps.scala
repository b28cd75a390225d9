package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** ScalaCheck properties for the engine's two portability backbones:
  *
  *  - the Exact decimal policy (DESIGN.md "Exact-decimal numeric
  *    policy"): `sumMoney` over arbitrary 2dp money values must equal
  *    the BigDecimal reference sum regardless of row order or partition
  *    split — this is what lets the oracle gate run with zero float
  *    tolerance;
  *  - the int8 quantization contract (`Similarity.quantizeEmbeddings`):
  *    codes stay in [0, 255] and reconstruct to within one quantization
  *    step for ANY float corpus, not just the curated testdata.
  */
object ExactnessProps extends Properties("Exactness") {

  private lazy val spark = TestSpark.spark

  // 2dp money magnitudes up to ±10M, the Redshift money shape
  private val genMoney: Gen[BigDecimal] =
    Gen.chooseNum(-1000000000L, 1000000000L).map(c => BigDecimal(c) / 100)

  property("sumMoney equals the BigDecimal reference sum for any values and split") =
    Prop.forAll(Gen.nonEmptyListOf(genMoney), Gen.chooseNum(1, 8)) { (vals, parts) =>
      val rows = vals.map(v => Row(v.toDouble))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts),
        StructType(Seq(StructField("m", DoubleType, nullable = false))))
      val got = df.agg(Exact.sumMoney(col("m"))).head().getDouble(0)
      // reference: exact decimal sum of the 2dp values, rounded to 2dp
      val want = vals.sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      got == want
    }

  private val genVec: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-4.0f, 4.0f))

  property("quantizeEmbeddings: codes in [0,255] and one-step reconstruction, any corpus") =
    Prop.forAll(Gen.nonEmptyListOf(genVec)) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        StructType(Seq(StructField("vec_id", LongType, nullable = false),
          StructField("embedding", ArrayType(FloatType, containsNull = false)))))
      val out = graft.llm.Similarity.quantizeEmbeddings(df, keepStats = true)
        .select(col("vec_id"), col("codes"), col("q_min"), col("q_max"))
        .collect()
      val mn = out.head.getSeq[Long](2)
      val mx = out.head.getSeq[Long](3)
      out.forall { r =>
        val codes = r.getSeq[Int](1)
        val orig = vecs(r.getLong(0).toInt)
        codes.indices.forall { i =>
          val step = math.max(mx(i) - mn(i), 1L).toDouble / 255
          val dequant = mn(i) + codes(i) * step
          val xq = math.floor(orig(i).toDouble * 1000000)
          codes(i) >= 0 && codes(i) <= 255 &&
            math.abs(dequant - xq) <= step + 1e-9
        }
      }
    }
}
