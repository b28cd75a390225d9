package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** One-off diagnostic behind the round-15 retrain column: on the
  * AppendDriftCurve's post-drift live corpus, how do (a) the frozen
  * drifted index, (b) retrainIndex's output, and (c) fresh builds at
  * coarseIters 1/5 compare on recall and occupancy? Separates "retrain
  * is broken" from "the drifted corpus itself bounds what any cosine
  * quantizer can do".
  */
object RetrainDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Engine.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def drifted(round: Int): DataFrame =
      base.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") + round * 10000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, (x + lit(0.5 * round)).cast(FloatType))
              .otherwise(x)).as("embedding"))
    val live = (1 to 4).map(drifted).foldLeft(base)(_ unionByName _)
      .persist()
    val k = 10
    val baseQueries = Seq(0L, 7L, 42L, 99L, 123L)
    val appendedQueries = Seq(0L, 42L, 124L).map(_ + 4 * 10000000L)
    def recall(path: String, queryIds: Seq[Long]): Double = {
      val rs = queryIds.map { q =>
        val exact = llm.Similarity.topK(live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = llm.AnnIndex.serveTopK(spark, path, live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(got).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }
    Seq(1, 3, 5, 10).foreach { ci =>
      val p = s"/tmp/graft_retrain_diag_ci$ci"
      graft.util.Fs.deleteRecursively(p)
      llm.AnnIndex.writeIndex(live, p, coarseIters = ci)
      val st = llm.AnnIndex.indexStats(spark, p)
      println(f"[retraindiag] fresh ci=$ci skew=${st.skew}%.2f " +
        f"maxCell=${st.maxCellRows} baseRecall=${recall(p, baseQueries)}%.3f " +
        f"appendedRecall=${recall(p, appendedQueries)}%.3f")
    }
    spark.stop()
  }
}
