package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the prefix-filter similarity join's cost structure:
  * times candidate generation vs exact verification separately and
  * reports candidate/survivor counts — the numbers that decide whether
  * a PPJoin-style length/position filter is worth its bookkeeping.
  * `SPARK_GRAFT_SF_DIR=… runMain graft.PrefixDiag`.
  */
object PrefixDiag {
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
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prefixdiag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Engine.table(spark, sfDir, "documents")
    val sh = llm.Dedup.shingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSh = time("shingles")(sh.count())
    val cands = llm.Dedup.prefixCandidates(sh, 4, 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCands = time("candidates")(cands.count())
    val verified = llm.Dedup.jaccardForCandidates(sh, cands)
      .filter(col("inter") * 9 >= (col("n1") + col("n2")) * 4)
    val nOut = time("verify")(verified.count())
    // how many candidates does the (implied-at-verify) length filter
    // den*min >= num*max already rule out before any intersection work?
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val withN = cands
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
    val nLenPruned = time("length-filter count")(withN
      .filter(lit(5) * least(col("n1"), col("n2"))
        < lit(4) * greatest(col("n1"), col("n2"))).count())
    println(s"[prefixdiag] shingles=$nSh cands=$nCands out=$nOut " +
      s"lenPrunable=$nLenPruned (${100.0 * nLenPruned / math.max(1, nCands)}%)")
    // variant: per-doc sorted shingle arrays + builtin array_intersect —
    // two doc-keyed joins moving arrays instead of the exploded
    // (cand × shingle) equi-join's row blowup
    val arrays = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("shingle"))).as("a"),
        count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    arrays.count()
    val viaArrays = cands
      .join(arrays.select(col("doc_id").as("d1"), col("a").as("a1"), col("n").as("n1")), "d1")
      .join(arrays.select(col("doc_id").as("d2"), col("a").as("a2"), col("n").as("n2")), "d2")
      .withColumn("inter", size(array_intersect(col("a1"), col("a2"))).cast("long"))
      .filter(col("inter") * 9 >= (col("n1") + col("n2")) * 4)
    val nOut2 = time("verify-via-arrays")(viaArrays.count())
    println(s"[prefixdiag] out-via-arrays=$nOut2 (must equal out=$nOut)")
    arrays.unpersist(); sh.unpersist(); cands.unpersist()
    spark.stop()
  }
}
