package graft

import org.apache.spark.sql.SparkSession

/** PQ tuning diagnostic (the IvfCurve twin): recall vs brute force across
  * (subspace count × Lloyd iterations × shortlist), averaged over several
  * query vectors — `SPARK_GRAFT_SF_DIR=… runMain graft.PqCurve`. Source of
  * the q_sim_pq operating point recorded in DESIGN.md.
  */
object PqCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Engine.table(spark, sfDir, "embeddings")
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val k = 10
    val exact = queryIds.map(q => q -> llm.Similarity.topK(emb, q, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet).toMap
    val derivedSl = llm.AnnIndex.adcShortlistFor(k, emb.count())
    println(s"[pqcurve] n=${emb.count()} derived shortlist=$derivedSl")
    for (m <- Seq(4, 8, 16); iters <- Seq(1, 2);
         shortlist <- Seq(100, 200, 400, derivedSl).distinct.sorted) {
      val t0 = System.nanoTime()
      val recalls = queryIds.map { q =>
        val got = llm.Similarity.pqTopK(emb, q, k, shortlist, m, iters)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(q).intersect(got).size.toDouble / exact(q).size
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[pqcurve] m=$m iters=$iters shortlist=$shortlist " +
        f"meanRecall=${recalls.sum / recalls.size}%.3f minRecall=${recalls.min}%.2f ${sec}%.1fs")
    }
    spark.stop()
  }
}
