package graft

import org.apache.spark.sql.SparkSession

/** IVF-PQ operating-point sweep (round 13 — source of the derived-grid
  * constants in [[graft.llm.AnnIndex]]): recall vs brute force across
  * (probe multiplier × shortlist rule) at the DERIVED √n cell grid,
  * averaged over 5 query vectors, plus the retired fixed-16/probe-8/n÷25
  * point for comparison. `SPARK_GRAFT_SF_DIR=… runMain graft.IvfPqCurve`.
  * Results recorded in DESIGN.md.
  */
object IvfPqCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    val queryIds = Seq(0L, 7L, 42L, 99L, 123L)
    val k = 10
    val exact = queryIds.map(q => q -> llm.Similarity.topK(emb, q, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet).toMap
    val nC = llm.AnnIndex.ivfCellsFor(n)
    println(s"[ivfpqcurve] n=$n derived nC=$nC " +
      s"defaultProbes=${llm.AnnIndex.ivfProbesFor(nC)} " +
      s"defaultShortlist=${llm.AnnIndex.adcShortlistFor(k, n)}")
    val model = {
      val t0 = System.nanoTime()
      val m = llm.AnnIndex.train(emb, nC)
      println(f"[ivfpqcurve] train(${nC}) ${(System.nanoTime() - t0) / 1e9}%.1fs")
      m
    }
    val codes = {
      val t0 = System.nanoTime()
      val c = llm.AnnIndex.encodeCodes(emb, model)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      c.count()
      println(f"[ivfpqcurve] encode ${(System.nanoTime() - t0) / 1e9}%.1fs")
      c
    }
    val sqc = math.ceil(math.sqrt(nC.toDouble)).toInt
    val probeGrid = Seq(1, 2, 3).map(mult =>
      (s"${mult}*sqrt(nC)", math.min(nC, math.max(8, mult * sqc))))
    val slGrid = Seq(
      ("10k fixed", 10 * k),
      ("10k+4sqrt(n)", llm.AnnIndex.adcShortlistFor(k, n)),
      ("n/25", math.max(100L, n / 25L).toInt))
    for ((pTag, nP) <- probeGrid; (sTag, sl) <- slGrid) {
      val t0 = System.nanoTime()
      val recalls = queryIds.map { q =>
        val got = llm.AnnIndex.topKFromCodes(emb, codes, model, q, k,
            nProbe = nP, shortlist = sl, n = n)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact(q).intersect(got).size.toDouble / exact(q).size
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpqcurve] probes=$nP%4d ($pTag%12s) sl=$sl%5d ($sTag%12s) " +
        f"meanRecall=${recalls.sum / recalls.size}%.3f minRecall=${recalls.min}%.2f ${sec}%.1fs " +
        s"perQuery=${queryIds.zip(recalls).map { case (q, r) => s"$q:$r" }.mkString(",")}")
    }
    codes.unpersist()
    // the retired round-12 point for comparison (fixed 16 cells, 8 probes,
    // n/25 shortlist — train-per-call)
    val t0 = System.nanoTime()
    val retired = queryIds.map { q =>
      val got = llm.Similarity.ivfpqTopK(emb, q, k, nCentroids = 16,
          nProbe = 8, shortlist = math.max(100L, n / 25L).toInt)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact(q).intersect(got).size.toDouble / exact(q).size
    }
    println(f"[ivfpqcurve] RETIRED 16/8/n÷25 meanRecall=" +
      f"${retired.sum / retired.size}%.3f minRecall=${retired.min}%.2f " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs (incl. per-query retrain)")
    spark.stop()
  }
}
