package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Append-drift measurement behind [[graft.llm.AnnIndex.needsRetrain]]'s
  * thresholds (round 14, VERDICT-r13 #4): how does a FROZEN IVF-PQ index
  * degrade as appended mass drifts away from the trained distribution?
  *
  * Protocol: build the index on the base corpus, then append successive
  * half-corpus batches of increasingly SHIFTED replicas (a deterministic
  * offset along one dimension grows per round — the embedding-drift
  * shape a retrained upstream encoder produces, concentrating arrivals
  * in the few cells whose centroids point that way). After each append,
  * measure (a) serve recall for APPENDED queries vs brute force over the
  * live corpus, (b) serve recall for ORIGINAL queries, (c) cell-skew
  * stats and whether the retrain trigger fires.
  * `SPARK_GRAFT_SF_DIR=… runMain graft.AppendDriftCurve`. Results in
  * DESIGN.md.
  */
object AppendDriftCurve {
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
    val n = base.count()
    val k = 10
    val path = "/tmp/graft_append_drift_index"
    graft.util.Fs.deleteRecursively(path)
    val t0 = System.nanoTime()
    llm.AnnIndex.writeIndex(base, path)
    println(f"[appenddrift] n=$n build ${(System.nanoTime() - t0) / 1e9}%.1fs")

    // shifted replica of half the base per round: id-offset keys, the
    // drift grows with the round (0.5, 1.0, 1.5, 2.0 along dim 0 — the
    // corpus's per-dim scale is ~unit, so round 4 is far off-manifold)
    def drifted(round: Int): DataFrame = {
      val shift = 0.5 * round
      base.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") + round * 10000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, (x + lit(shift)).cast(FloatType))
              .otherwise(x)).as("embedding"))
    }

    def recall(live: DataFrame, queryIds: Seq[Long]): Double = {
      val rs = queryIds.map { q =>
        val exact = llm.Similarity.topK(live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = llm.AnnIndex.serveTopK(spark, path, live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(got).size.toDouble / exact.size
      }
      rs.sum / rs.size
    }

    val baseQueries = Seq(0L, 7L, 42L, 99L, 123L)
    println(f"[appenddrift] appended=0.00x baseRecall=${recall(base, baseQueries)}%.3f")
    var live = base
    for (round <- 1 to 4) {
      val add = drifted(round)
      llm.AnnIndex.appendToIndex(add, path)
      live = live.unionByName(add)
      val stats = llm.AnnIndex.indexStats(spark, path)
      val frac = (stats.liveRows - n).toDouble / n
      // even base ids only (the drifted filter), so these replicas exist
      val appendedQueries = Seq(0L, 42L, 124L).map(_ + round * 10000000L)
      println(f"[appenddrift] appended=$frac%.2fx shift=${0.5 * round}%.1f " +
        f"baseRecall=${recall(live, baseQueries)}%.3f " +
        f"appendedRecall=${recall(live, appendedQueries)}%.3f " +
        f"skew=${stats.skew}%.2f liveRows=${stats.liveRows} " +
        s"retrain=${llm.AnnIndex.needsRetrain(stats, trainedRows = n)}")
    }
    // the round-15 column (VERDICT-r14 #1): EXECUTE the retrain the
    // curve's trigger has been recommending, then re-measure on the same
    // live corpus, against the FRESH-BUILD reference (writeIndex on the
    // same live rows — the curve a retrain cannot beat and must match;
    // RetrainDiag holds the coarseIters trade study)
    val t1 = System.nanoTime()
    val epoch = llm.AnnIndex.retrainIndex(spark, path)
    val rs = llm.AnnIndex.indexStats(spark, path)
    val postAppended = Seq(0L, 42L, 124L).map(_ + 4 * 10000000L)
    println(f"[appenddrift] RETRAIN epoch=$epoch ${(System.nanoTime() - t1) / 1e9}%.1fs " +
      f"baseRecall=${recall(live, baseQueries)}%.3f " +
      f"appendedRecall=${recall(live, postAppended)}%.3f " +
      f"skew=${rs.skew}%.2f cells=${rs.nCells} liveRows=${rs.liveRows} " +
      s"retrain=${llm.AnnIndex.needsRetrainAt(spark, path)}")
    val ref = "/tmp/graft_append_drift_fresh"
    graft.util.Fs.deleteRecursively(ref)
    llm.AnnIndex.writeIndex(live, ref)
    val fs = llm.AnnIndex.indexStats(spark, ref)
    def recallAt(p: String, qs: Seq[Long]): Double = {
      val rss = qs.map { q =>
        val exact = llm.Similarity.topK(live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = llm.AnnIndex.serveTopK(spark, p, live, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(got).size.toDouble / exact.size
      }
      rss.sum / rss.size
    }
    println(f"[appenddrift] FRESH-REF " +
      f"baseRecall=${recallAt(ref, baseQueries)}%.3f " +
      f"appendedRecall=${recallAt(ref, postAppended)}%.3f " +
      f"skew=${fs.skew}%.2f cells=${fs.nCells}")
    spark.stop()
  }
}
