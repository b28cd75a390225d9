package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Measurement harness for the materialize-once question on the
  * connected-components LABELING (the round-8 verdict's top item): with
  * the pair graph already indexed, q_dedup_cc / q_dedup_keep_best /
  * q_dedup_cluster_sizes each re-run the star-contraction loop — this
  * bench times (a) that per-consumer loop recompute vs (b) the identical
  * downstream reading a pre-materialized `(id, label)` parquet. Both
  * modes read the SAME pair index, so the delta is exactly the cc loop
  * vs the labels read. `SPARK_GRAFT_SF_DIR=… runMain graft.LabelCacheBench`.
  *
  * Protocol: warm everything at sf0.001 (codegen), then min-of-2 per
  * (consumer, mode), interleaved across modes; the labels build (loop +
  * write) is timed separately and amortizes over the consumer count —
  * the comparison to report is Σrecompute vs (build + Σmaterialized).
  */
object LabelCacheBench {
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
    import graft.llm.Components

    def docs(dir: String): DataFrame = Engine.table(spark, dir, "documents")
    def pairs(dir: String): DataFrame = Components.simhashPairs(spark, dir)
    def labels(dir: String): DataFrame = Components.simhashLabels(spark, dir)

    def clusterSizes(cc: DataFrame): DataFrame = cc
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("n_docs"))

    // consumer name -> (loop-recompute plan, labels-materialized plan)
    def consumers(dir: String): Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_dedup_cc",
        () => Components.ccFromPairs(pairs(dir)),
        () => Components.ccFromLabels(labels(dir))),
      ("q_dedup_keep_best",
        () => Components.keepBestFromPairs(pairs(dir), docs(dir)),
        () => Components.keepBestFromLabels(labels(dir), docs(dir))),
      ("q_dedup_cluster_sizes",
        () => clusterSizes(Components.ccFromPairs(pairs(dir))),
        () => clusterSizes(Components.ccFromLabels(labels(dir)))))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warmup at sf0.001: indexes + both modes of every consumer
    consumers("/root/testdata/sf0.001").foreach { case (_, rec, mat) =>
      rec().count(); mat().count()
    }

    // pair index for the target SF built OUTSIDE the timed region (both
    // modes share it); the labels build is the quantity under test
    pairs(sfDir).count()
    val ccPath = s"${Components.pairGraphPath(sfDir)}_cc"
    def freshBuild(): Double = {
      Components.dropLabelMemo(sfDir)
      graft.util.Fs.deleteRecursively(ccPath)
      time(labels(sfDir).count())
    }
    val buildT = math.min(freshBuild(), freshBuild())
    println(f"[labelbench] labels build+write $buildT%.2fs")

    def onePass(tag: String): Seq[(String, Double, Double)] =
      consumers(sfDir).map { case (name, rec, mat) =>
        val tr = time(rec().count())
        val tm = time(mat().count())
        println(f"[labelbench] $tag $name recompute=$tr%.2fs materialized=$tm%.2fs")
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
      println(f"[labelbench] MIN $n recompute=$r%.2fs materialized=$m%.2fs")
    }
    println(f"[labelbench] TOTAL recompute=$sumR%.2fs build+materialized=${buildT + sumM}%.2fs " +
      f"(build=$buildT%.2fs, materialized=$sumM%.2fs, sf=$sfDir)")
    spark.stop()
  }
}
