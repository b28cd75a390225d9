package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF tuning diagnostic: recall vs brute force across (Lloyd iterations
  * × probed cells), averaged over several query vectors —
  * `SPARK_GRAFT_SF_DIR=… runMain graft.IvfCurve`. Source of the
  * recall/cost curve recorded in DESIGN.md.
  */
object IvfCurve {
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
    for (iters <- Seq(0, 1, 2, 3); nProbe <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      val cents = llm.Similarity.ivfCentroids(emb, nCentroids = 16, iters = iters)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val recalls = queryIds.map { q =>
        val assigned = llm.Similarity.assignToCentroids(emb, broadcast(cents))
        val qv = emb.filter(col("vec_id") === q)
          .select(llm.Similarity.toDouble(col("embedding")).as("qv"),
            llm.Similarity.norm(llm.Similarity.toDouble(col("embedding"))).as("qn"))
        val probes = cents.crossJoin(broadcast(qv))
          .withColumn("d", llm.Similarity.dot(col("qv"), col("cv")) /
            (col("qn") * llm.Similarity.norm(col("cv"))))
          .orderBy(col("d").desc, col("cent_id")).limit(nProbe).select("cent_id")
        val got = assigned.join(broadcast(probes), "cent_id")
          .filter(col("vec_id") =!= q)
          .crossJoin(broadcast(qv))
          .withColumn("v", llm.Similarity.toDouble(col("embedding")))
          .withColumn("cos_r", round(llm.Similarity.dot(col("v"), col("qv")) /
            (llm.Similarity.norm(col("v")) * col("qn")), 6))
          .orderBy(col("cos_r").desc, col("vec_id")).limit(k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(q).intersect(got).size.toDouble / exact(q).size
      }
      cents.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ivfcurve] iters=$iters nProbe=$nProbe " +
        f"meanRecall=${recalls.sum / recalls.size}%.3f minRecall=${recalls.min}%.2f ${sec}%.1fs")
    }
    spark.stop()
  }
}
