package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Measurement harness for the materialize-once question on the MinHash
  * SIGNATURE + band-candidate indexes (the round-9 verdict's top item):
  * q_dedup_sig / minhash / est / occupancy / fuzzy / incremental /
  * agreement each re-ran the fused tokenize+shingle+6-md5-minima corpus
  * pass and (for the pair consumers) the band self-join — this bench
  * times (a) that per-consumer recompute vs (b) the identical downstream
  * reading the pre-materialized `_mh`/`_mhc` parquet
  * ([[graft.llm.Components.minhashSigs]]/[[graft.llm.Components.minhashCands]],
  * which the graded queries now use). Recompute plans replicate the
  * pre-round-10 query bodies from the same public Dedup primitives.
  * `SPARK_GRAFT_SF_DIR=… runMain graft.MinhashCacheBench`.
  *
  * Protocol: warm everything at sf0.001 (codegen), then min-of-2 per
  * (consumer, mode), interleaved across modes; the index build (sign +
  * band-join + write) is timed separately and amortizes over the consumer
  * count — the comparison to report is Σrecompute vs (build + Σmaterialized).
  */
object MinhashCacheBench {
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

    def docs(dir: String): DataFrame = Engine.table(spark, dir, "documents")

    // the pre-round-10 recompute upstreams
    def sigsRe(dir: String): DataFrame =
      Dedup.minhashSignaturesStateless(docs(dir))
    def candsRe(dir: String): DataFrame = Dedup.lshCandidates(sigsRe(dir))

    val hs = Dedup.minhashSeeds.indices
    def sigDedup(sigs: DataFrame): DataFrame = sigs
      .groupBy(hs.map(i => col(s"h$i")): _*)
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    def minhashVerify(dir: String, cands: DataFrame): DataFrame =
      Dedup.jaccardForCandidates(Dedup.shingles(docs(dir)), cands)
        .filter(col("jac") >= 0.35)
    def occupancy(sigs: DataFrame): DataFrame =
      Dedup.lshBands(sigs).groupBy(col("band_id"), col("key"))
        .agg(count(lit(1)).as("occ"))
        .groupBy(col("band_id")).agg(max(col("occ")).as("max_occ"))
    def fuzzy(dir: String, cands: DataFrame): DataFrame = {
      val ascii = docs(dir).filter(col("text").rlike("^[ -~]*$"))
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      cands
        .join(ascii.select(col("doc_id").as("d1"), col("text").as("t1"),
          col("len").as("len1")), "d1")
        .join(ascii.select(col("doc_id").as("d2"), col("text").as("t2"),
          col("len").as("len2")), "d2")
        .withColumn("lev", levenshtein(col("t1"), col("t2")).cast(LongType))
        .filter(col("lev") * 5 <= greatest(col("len1"), col("len2")))
    }
    def incremental(sigs: DataFrame): DataFrame = {
      val bands = Dedup.lshBands(sigs)
        .withColumn("is_new",
          conv(substring(md5(col("doc_id").cast(StringType).cast(BinaryType)),
            1, 2), 16, 10).cast(LongType) % 10 === 9)
      val corpk = bands.filter(!col("is_new"))
        .select(col("band_id"), col("key")).distinct()
        .withColumn("hit", lit(1))
      bands.filter(col("is_new"))
        .join(corpk, Seq("band_id", "key"), "left")
        .groupBy(col("doc_id")).agg(count(col("hit")).as("n_bands_hit"))
    }
    def agreement(dir: String, cands: DataFrame): DataFrame = {
      val sp = Components.simhashPairs(spark, dir)
        .select(col("d1"), col("d2"), lit(1L).as("in_s"), lit(0L).as("in_m"))
      val mp = minhashVerify(dir, cands)
        .select(col("d1"), col("d2"), lit(0L).as("in_s"), lit(1L).as("in_m"))
      sp.union(mp).groupBy(col("d1"), col("d2"))
        .agg(max(col("in_s")).as("s"), max(col("in_m")).as("m"))
        .agg(sum(col("s")).as("ns"), sum(col("m")).as("nm"),
          sum(col("s") * col("m")).as("nb"))
    }

    // consumer name -> (recompute plan, index-materialized plan)
    def consumers(dir: String): Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_dedup_sig",
        () => sigDedup(sigsRe(dir)),
        () => sigDedup(Components.minhashSigs(spark, dir))),
      ("q_dedup_minhash",
        () => minhashVerify(dir, candsRe(dir)),
        () => minhashVerify(dir, Components.minhashCands(spark, dir))),
      ("q_lsh_occupancy",
        () => occupancy(sigsRe(dir)),
        () => occupancy(Components.minhashSigs(spark, dir))),
      ("q_dedup_fuzzy",
        () => fuzzy(dir, candsRe(dir)),
        () => fuzzy(dir, Components.minhashCands(spark, dir))),
      ("q_dedup_incremental",
        () => incremental(sigsRe(dir)),
        () => incremental(Components.minhashSigs(spark, dir))),
      ("q_dedup_agreement",
        () => agreement(dir, candsRe(dir)),
        () => agreement(dir, Components.minhashCands(spark, dir))))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warmup at sf0.001: indexes + both modes of every consumer
    consumers("/root/testdata/sf0.001").foreach { case (_, rec, mat) =>
      rec().count(); mat().count()
    }

    // the simhash pair index for the target SF is built OUTSIDE the timed
    // region (agreement reads it in BOTH modes); the minhash index build
    // is the quantity under test
    Components.simhashPairs(spark, sfDir).count()
    val base = Components.pairGraphPath(sfDir)
    def freshBuild(): Double = {
      Components.dropMinhashMemo(sfDir)
      graft.util.Fs.deleteRecursively(s"${base}_mh")
      graft.util.Fs.deleteRecursively(s"${base}_mhc")
      time(Components.minhashCands(spark, sfDir).count())
    }
    val buildT = math.min(freshBuild(), freshBuild())
    println(f"[minhashbench] sig+cand index build+write $buildT%.2fs")

    def onePass(tag: String): Seq[(String, Double, Double)] =
      consumers(sfDir).map { case (name, rec, mat) =>
        val tr = time(rec().count())
        val tm = time(mat().count())
        println(f"[minhashbench] $tag $name recompute=$tr%.2fs materialized=$tm%.2fs")
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
      println(f"[minhashbench] MIN $n recompute=$r%.2fs materialized=$m%.2fs")
    }
    println(f"[minhashbench] TOTAL recompute=$sumR%.2fs build+materialized=${buildT + sumM}%.2fs " +
      f"(build=$buildT%.2fs, materialized=$sumM%.2fs, sf=$sfDir)")
    spark.stop()
  }
}
