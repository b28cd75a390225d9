package graft

import org.apache.spark.sql.SparkSession

/** Serve-path cost vs corpus size (round 13 — the VERDICT-r12 #1 "probe
  * cost grows sublinearly" witness): builds (or reuses) the persisted
  * IVF-PQ index for `SPARK_GRAFT_SF_DIR`, then times
  * [[graft.llm.AnnIndex.serveTopK]] ALONE (no recallGate — the gate
  * wrapper adds a corpus-LINEAR brute-force pass for its recall floor,
  * which would mask the probe path's n^(3/4)). Prints the derived grid,
  * the probed fraction, and warm serve times. Results in DESIGN.md.
  */
object AnnServeBench {
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
    val n = emb.count()
    val nC = llm.AnnIndex.ivfCellsFor(n)
    val nP = llm.AnnIndex.ivfProbesFor(nC)
    val sl = llm.AnnIndex.adcShortlistFor(10, n)
    println(f"[annserve] n=$n cells=$nC probes=$nP (${100.0 * nP / nC}%.1f%% of cells) shortlist=$sl")
    val path = llm.AnnIndex.indexPath(sfDir)
    val t0 = System.nanoTime()
    val built = new java.io.File(path, "_SUCCESS").exists()
    // servedTopK builds on first use; time that explicitly
    llm.AnnIndex.servedTopK(spark, sfDir, 0L, 10).count()
    println(f"[annserve] ${if (built) "reused existing index +" else "BUILD + "}first serve ${(System.nanoTime() - t0) / 1e9}%.2fs (path=$path)")
    for (q <- Seq(0L, 7L, 42L)) {
      val times = (1 to 3).map { _ =>
        val t = System.nanoTime()
        llm.AnnIndex.serveTopK(spark, path, emb, q, 10).count()
        (System.nanoTime() - t) / 1e9
      }
      println(f"[annserve] serveTopK(q=$q) warm min ${times.min}%.2fs (${times.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
