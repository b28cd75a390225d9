package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF-PQ stage-cost breakdown (round-12 30× triage twin of PqDiag). */
object IvfPqDiag {
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
      println(f"[ivfpqdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    import org.apache.spark.sql.Column
    val v = llm.Similarity.toDouble(col("embedding"))
    val cents = t("ivfCentroids collect") {
      llm.Similarity.ivfCentroids(emb, 16).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
    }
    val centsLit = typedLit(cents.map(_.toSeq).toSeq)
    def hofDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val cellScores = transform(centsLit, cv =>
      hofDot(v, cv) / (sqrt(hofDot(v, v)) * sqrt(hofDot(cv, cv))))
    val residPlan = emb
      .select(col("vec_id"), v.as("ve"),
        (array_position(cellScores, array_max(cellScores)) - 1)
          .cast("int").as("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("ve"), element_at(centsLit, col("cell") + 1),
          (x, c) => x - c).as("embedding"))
    t("resid count (no persist)")(residPlan.count())
    t("resid count again (no persist)")(residPlan.count())
    val resid = residPlan.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    t("resid persist materialize")(resid.count())
    t("resid read from persist")(resid.count())
    val books = t("pqCodebooks(resid, iters=2)")(
      llm.Similarity.pqCodebooks(resid, 2))
    t("collectBooks")(llm.Similarity.collectBooks(books, llm.Similarity.pqSubspaces))
    t("pqEncode count")(llm.Similarity.pqEncode(resid, books).count())
    t("full ivfpqTopK")(llm.Similarity.ivfpqTopK(emb, 0L, 10).collect())
    t("gate q_sim_ivfpq count")(
      Registry.all("q_sim_ivfpq").fn(spark, sfDir).count())
    t("gate q_sim_ivfpq count again")(
      Registry.all("q_sim_ivfpq").fn(spark, sfDir).count())
    // the BenchOne shape: warm at sf0.001 FIRST, then the big dir
    t("gate at sf0.001 (the BenchOne warmup)")(
      Registry.all("q_sim_ivfpq").fn(spark, "/root/testdata/sf0.001").count())
    t("gate after sf0.001 warmup")(
      Registry.all("q_sim_ivfpq").fn(spark, sfDir).count())
    spark.stop()
  }
}
