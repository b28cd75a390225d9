package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Measurement harness for the materialize-once question on the shared
  * simhash pair graph (the graph family's common upstream): per consumer,
  * time (a) the graded recompute plan vs (b) the identical downstream
  * builder reading a pre-materialized pair parquet
  * ([[graft.llm.Dedup.writePairGraph]]). Both modes run the SAME builder
  * functions, so the delta is exactly the pair-pipeline recompute vs the
  * parquet read. `SPARK_GRAFT_SF_DIR=… runMain graft.PairGraphBench`.
  *
  * Protocol: warm everything at sf0.001 (codegen), then min-of-2 per
  * (consumer, mode), interleaved across modes. The write itself is timed
  * separately — it amortizes over the consumer count, so the comparison
  * to report is Σrecompute vs (write + Σmaterialized).
  */
object PairGraphBench {
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
    import graft.llm.{Components, Dedup}

    val pairPath = s"/tmp/graft_pair_graph_${java.util.UUID.randomUUID()}"
    def docs(dir: String): DataFrame = Engine.table(spark, dir, "documents")
    def readPairs: DataFrame =
      spark.read.parquet(pairPath).select(col("d1"), col("d2"))

    // consumer name -> (recompute plan, materialized plan)
    def consumers(dir: String): Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_dedup_cc",
        () => Components.ccFromPairs(Components.simhashPairsRecompute(spark, dir)),
        () => Components.ccFromPairs(readPairs)),
      ("q_dedup_keep_best",
        () => Components.keepBestFromPairs(Components.simhashPairsRecompute(spark, dir), docs(dir)),
        () => Components.keepBestFromPairs(readPairs, docs(dir))),
      ("q_pagerank",
        () => Components.pageRank(Components.simhashPairsRecompute(spark, dir),
          docs(dir).select(col("doc_id"))),
        () => Components.pageRank(readPairs, docs(dir).select(col("doc_id")))),
      ("q_triangles",
        () => Components.triangleCounts(Components.simhashPairsRecompute(spark, dir),
          docs(dir).select(col("doc_id"))),
        () => Components.triangleCounts(readPairs, docs(dir).select(col("doc_id")))),
      ("q_graph_degree_hist",
        () => Components.degreeHistFromPairs(Components.simhashPairsRecompute(spark, dir), docs(dir)),
        () => Components.degreeHistFromPairs(readPairs, docs(dir))))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warmup at sf0.001: write + both modes of every consumer
    Dedup.writePairGraph(docs("/root/testdata/sf0.001"), pairPath)
    consumers("/root/testdata/sf0.001").foreach { case (_, rec, mat) =>
      rec().count(); mat().count()
    }

    val writeT = math.min(
      time(Dedup.writePairGraph(docs(sfDir), pairPath)),
      time(Dedup.writePairGraph(docs(sfDir), pairPath)))
    println(f"[pairbench] writePairGraph $writeT%.2fs")

    def onePass(tag: String): Seq[(String, Double, Double)] =
      consumers(sfDir).map { case (name, rec, mat) =>
        val tr = time(rec().count())
        val tm = time(mat().count())
        println(f"[pairbench] $tag $name recompute=$tr%.2fs materialized=$tm%.2fs")
        (name, tr, tm)
      }
    val p1 = onePass("pass1")
    val p2 = onePass("pass2")
    val mins = p1.zip(p2).map { case ((n, r1, m1), (_, r2, m2)) =>
      (n, math.min(r1, r2), math.min(m1, m2))
    }
    val sumR = mins.map(_._2).sum
    val sumM = mins.map(_._3).sum
    mins.foreach { case (n, r, m) =>
      println(f"[pairbench] MIN $n recompute=$r%.2fs materialized=$m%.2fs")
    }
    println(f"[pairbench] TOTAL recompute=$sumR%.2fs write+materialized=${writeT + sumM}%.2fs " +
      f"(write=$writeT%.2fs, materialized=$sumM%.2fs, sf=$sfDir)")
    graft.util.Fs.deleteRecursively(pairPath)
    spark.stop()
  }
}
