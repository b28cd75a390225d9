package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ stage-cost breakdown at a given SF dir — which of train / encode /
  * scan / rerank dominates q_sim_pq's cost (round-12 30× triage).
  */
object PqDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Engine.table(spark, sfDir, "embeddings")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val n = t("count")(emb.count())
    println(s"[pqdiag] n=$n")
    for (iters <- Seq(1, 2)) {
      val books = t(s"train(iters=$iters)") {
        val b = llm.Similarity.pqCodebooks(emb, iters)
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        b.count(); b
      }
      t("encode")(llm.Similarity.pqEncode(emb, books).count())
      books.unpersist()
    }
    t("pqTopK full")(llm.Similarity.pqTopK(emb, 0L, 10).collect())
    t("pqTopK again")(llm.Similarity.pqTopK(emb, 0L, 10).collect())
    spark.stop()
  }
}
