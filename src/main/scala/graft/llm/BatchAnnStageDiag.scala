package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Engine

/** Stage-cost isolation for topKBatchFromCodes (round-13 triage). */
object BatchAnnStageDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf3.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stagediag] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val emb = Engine.table(spark, sfDir, "embeddings")
    val n = emb.count()
    val path = AnnIndex.indexPath(sfDir)
    val model = AnnIndex.readModel(spark, path)
    val codes = spark.read.parquet(s"$path/codes")
    val qids = (0L until
      sys.env.getOrElse("GRAFT_DIAG_QUERIES", "16").toLong)
    val nP = AnnIndex.ivfProbesFor(model.nCells)
    val qs = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), Similarity.toDouble(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val pairs = qs.indices.flatMap { qp =>
      AnnIndex.probeCells(model, qs(qp)._2, nP).map(c => (qp, c)) }
    val cellToPairs = pairs.zipWithIndex.groupBy(_._1._2)
      .map { case (c, xs) => c -> xs.map(_._2) }
    val unionCells = cellToPairs.keys.toSeq.sorted
    println(s"[stagediag] n=$n cells=${model.nCells} pairs=${pairs.size} unionCells=${unionCells.size}")
    val cellPairsMap = map(cellToPairs.toSeq.sortBy(_._1).flatMap {
      case (c, pids) => Seq(lit(c), array(pids.map(lit): _*)) }: _*)
    val base = codes.filter(col("cell").isin(unionCells: _*))
    t("scan probed cells")(base.count())
    val exploded = base.withColumn("pid", explode(element_at(cellPairsMap, col("cell"))))
    t("+ explode pairs")(exploded.count())
    val m = model.m
    val nibArr = array((0 until m).map(s =>
      (shiftrightunsigned(col("codes64"), 4 * s).bitwiseAND(lit(15L)) + 1)
        .cast(IntegerType)): _*)
    t("+ nibbles only")(exploded.select(col("pid"), nibArr.as("nb")).count())
    val num = pairs.map { case (qp, c) => (0 until m).map { s =>
      (0 until 16).map { kk => kk * 0.001 + qp + c } } }  // shape-equal dummy
    val numLit = typedLit(num)
    def tblSum(tc: org.apache.spark.sql.Column) =
      aggregate(zip_with(tc, nibArr, (tbl, code) => element_at(tbl, code)),
        lit(0.0), (a, x) => a + x)
    t("+ one tblSum")(exploded.select(tblSum(element_at(numLit, col("pid") + 1)).as("x"))
      .agg(sum(col("x"))).count())
    t("+ two tblSums")(exploded.select(
      (tblSum(element_at(numLit, col("pid") + 1)) +
        tblSum(element_at(numLit, col("pid") + 1))).as("x"))
      .agg(sum(col("x"))).count())
    // round 14 (VERDICT-r13 #3): the reference-object AdcTableSum kernel
    // vs the one-Literal zip_with decode — plan-time (analysis +
    // optimization + physical planning, where Literal hashing bites) and
    // end-to-end, at this batch's pair count (pairs × 16 × 16 doubles
    // per table, ×2 tables in the literal plan vs ZERO plan bytes for
    // the kernel)
    val numArr = num.map(_.map(_.toArray).toArray).toArray
    def litForm = exploded.select(
      (tblSum(element_at(numLit, col("pid") + 1)) +
        tblSum(element_at(numLit, col("pid") + 1))).as("x"))
      .agg(sum(col("x")))
    def kerForm = exploded.select(
      (graft.functions.VectorExpressions.adcTableSum(
        col("pid"), col("codes64"), numArr) +
        graft.functions.VectorExpressions.adcTableSum(
          col("pid"), col("codes64"), numArr)).as("x"))
      .agg(sum(col("x")))
    t("plan-time literal x2")((1 to 2).foreach(_ =>
      litForm.queryExecution.executedPlan))
    t("plan-time kernel  x2")((1 to 2).foreach(_ =>
      kerForm.queryExecution.executedPlan))
    t("e2e literal")(litForm.count())
    t("e2e kernel")(kerForm.count())
    spark.stop()
  }
}
