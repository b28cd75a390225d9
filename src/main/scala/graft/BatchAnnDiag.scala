package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BatchAnnDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf3.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[batchdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val emb = Engine.table(spark, sfDir, "embeddings")
    val qids = (0L until 16L)
    t("warm servedBatch (build/reuse index)")(
      llm.AnnIndex.servedBatchTopK(spark, sfDir, qids, 10).count())
    t("servedBatch again")(
      llm.AnnIndex.servedBatchTopK(spark, sfDir, qids, 10).count())
    t("exact topKBatch")(
      llm.Similarity.topKBatch(emb, 16, 10).count())
    t("exact topKBatch again")(
      llm.Similarity.topKBatch(emb, 16, 10).count())
    t("full gate")(Registry.all("q_sim_batch_ann").fn(spark, sfDir).count())
    spark.stop()
  }
}
