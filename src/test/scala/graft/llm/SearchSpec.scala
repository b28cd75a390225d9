package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract edges of the retrieval operators beyond the oracle hash:
  * decontam's benchmark self-exclusion and bm25's rank/score invariants.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontam never flags a benchmark doc and every hit count is positive") {
    val out = Search.queries("q_decontam").fn(spark, TestSpark.sfDir)
    val benchFlagged = out.filter($"doc_id" % Search.benchMod === 0).count()
    assert(benchFlagged === 0L)
    assert(out.filter($"n_grams_hit" <= 0L).count() === 0L)
  }

  test("decontam flags a planted verbatim copy of a benchmark doc") {
    // doc 0 is benchmark (0 % 25 == 0); a copy under a non-benchmark id
    // must be flagged with at least (n_tokens - k + 1) shared grams
    val docs = graft.Engine.table(spark, TestSpark.sfDir, "documents")
    val bench0 = docs.filter($"doc_id" === 0L).select($"text").as[String].head()
    val planted = Seq((1000001L, bench0)).toDF("doc_id", "text")
    val grams = (df: org.apache.spark.sql.DataFrame) => df.select($"doc_id",
      explode(graft.functions.TextExpressions.shingles($"text", Search.decontamK))
        .as("gram"))
    val benchGrams = grams(docs.filter($"doc_id" % Search.benchMod === 0))
      .select($"gram").distinct()
    val hits = grams(planted).join(broadcast(benchGrams), "gram")
      .groupBy($"doc_id").agg(countDistinct($"gram").as("n")).as[(Long, Long)]
      .collect().toMap
    val nTok = bench0.split(" ").length
    val n = hits.getOrElse(1000001L, 0L)
    assert(n >= 1L, "planted verbatim copy of a benchmark doc was not flagged")
    assert(n <= (nTok - Search.decontamK + 1).toLong)
  }

  test("bm25 returns exactly 10 ranked rows with positive scores, rk dense 1..10") {
    val out = Search.queries("q_bm25").fn(spark, TestSpark.sfDir)
      .select($"rk", $"score_e6").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === (1 to 10))
    assert(out.forall(_._2 > 0L))
    // scores non-increasing in rank order
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }
}
