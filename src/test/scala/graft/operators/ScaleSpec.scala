package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin returns the same result as the plain join") {
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val sup = graft.Engine.table(spark, TestSpark.sfDir, "supplier")
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = li.join(sup, Seq("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = Scale.saltedJoin(li, sup, "k", salt = 8).groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("bandedDateBand equals the naive range join and plans no nested loop") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val naive = orders.join(li,
      abs(datediff(col("o_orderdate").cast("date"),
        col("l_shipdate").cast("date"))) <= 3)
      .select("o_orderkey", "l_orderkey", "l_linenumber")
    val banded = Scale.bandedDateBand(orders, col("o_orderdate"),
        li, col("l_shipdate"), band = 3)
      .select("o_orderkey", "l_orderkey", "l_linenumber")
    // identical PAIR MULTISET (both keys unique per side ⇒ set compare
    // after count equality is a multiset compare)
    assert(naive.count() == banded.count())
    assert(naive.except(banded).isEmpty && banded.except(naive).isEmpty)
    // the whole point: the banded form is an equi-join, not a BNLJ scan
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
    // a band wider than the bucket would silently lose pairs — refused
    val err = intercept[IllegalArgumentException] {
      Scale.bandedDateBand(orders, col("o_orderdate"), li, col("l_shipdate"),
        band = 8, width = 7)
    }
    assert(err.getMessage.contains("bucket"))
  }

  test("saltedJoin spreads a hot key across partitions") {
    import spark.implicits._
    val big = Seq.fill(1000)(1L).toDF("k")         // one pathological key
    val small = Seq((1L, "x")).toDF("k", "v")
    val parts = Scale.saltedJoin(big, small, "k", salt = 8)
      .withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    assert(parts > 1, "hot key should span multiple post-shuffle partitions")
  }

  test("skew stress: salted join balances a 50%-hot key and matches the naive result") {
    // one key owns half of 200k rows — the shape where a plain shuffle
    // join funnels half the table through one reducer. Broadcast is
    // disabled so both plans actually shuffle (with a broadcastable dim
    // there is no skew problem to solve), and row counts stay below
    // AQE's byte-based skew-split threshold so the naive plan really is
    // imbalanced — this spec proves the salting story with metrics, not
    // scaladoc.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // fix the reducer count for a meaningful balance measurement: AQE's
      // byte-based coalescing would fold this (tiny-by-bytes) fixture into
      // one partition and hide the row skew entirely
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val big = spark.range(200000)
        .select(when(col("id") % 2 === 0, lit(1L))
          .otherwise(col("id") % 1000 + 1).as("k"), col("id").as("payload"))
      val small = spark.range(1, 1001)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
        df.withColumn("pid", spark_partition_id())
          .groupBy("pid").count().agg(max("count")).head().getLong(0)
      val naive = big.join(small, Seq("k"))
      val salted = Scale.saltedJoin(big, small, "k", salt = 16)
      // identical results
      val a = naive.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      val b = salted.groupBy("k").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
      // balance: the naive join's hot reducer holds >= the 100k hot rows;
      // salting must spread them at least 4x better (salt = 16)
      val naiveMax = maxPartRows(naive)
      val saltedMax = maxPartRows(salted)
      assert(naiveMax >= 100000, s"fixture lost its skew (naiveMax=$naiveMax)")
      assert(saltedMax <= naiveMax / 4,
        s"salted join still skewed: naiveMax=$naiveMax saltedMax=$saltedMax")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("two-level stratified quota sampling equals the single-level rank") {
    val docs = graft.Engine.table(spark, TestSpark.sfDir, "documents")
    val two = Scale.stratifiedQuotaTwoLevel(docs, "lang", "doc_id", quota = 20)
      .select(col("lang"), col("doc_id"), col("rk"))
    val one = graft.Registry.all("q_sample_strat").fn(spark, TestSpark.sfDir)
    assert(one.except(two).isEmpty && two.except(one).isEmpty,
      "heavy-stratum two-level form must reproduce the single-level sample exactly")
  }

  test("compact bounds file count from below and file size from above, losslessly") {
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
    val path = "/tmp/graft_test/compact_spec"
    def parquetFiles = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    Scale.compact(li, path, targetFiles = 3)
    assert(parquetFiles == 3, "targetFiles partitions → exactly 3 files")
    assert(spark.read.parquet(path).count() == li.count(), "compaction is lossless")
    // a small maxRecordsPerFile must split one partition into many files
    val rows = li.count()
    Scale.compact(li, path, targetFiles = 1, maxRecordsPerFile = rows / 4)
    assert(parquetFiles >= 4,
      s"maxRecordsPerFile=${rows / 4} over $rows rows must split the single partition")
  }

  test("partitioned layout prunes partitions at the scan") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val path = "/tmp/graft_test_stage/orders_by_year"
    Scale.writePartitioned(orders, path, "o_year")
    val pruned = spark.read.parquet(path).filter(col("o_year") === 1996)
    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"), plan)
    val years = pruned.select("o_year").distinct().collect().map(_.getInt(0)).toSeq
    assert(years == Seq(1996))
    assert(pruned.count() == orders.filter(col("o_year") === 1996).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Scale.writeBucketed(orders, "t_bkt_orders", "o_orderkey")
    Scale.writeBucketed(li, "t_bkt_lineitem", "o_orderkey")
    val joined = spark.table("t_bkt_orders")
      .join(spark.table("t_bkt_lineitem"), "o_orderkey")
    // disable broadcast so the co-located path is what gets planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
      // the follow-on per-key aggregate (q_join_bucketed's shape) also
      // rides the bucket partitioning: zero hash exchanges end to end
      val aggPlan = joined.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed join + key agg should not shuffle:\n$aggPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minAboveStrict equals the driver reference at any partition count, no single-partition exchange (round 7)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pairs = (0 until 500)
      .map(_ => (rnd.nextInt(100000).toLong, rnd.nextInt(1000).toLong))
      .distinctBy(_._1)
    val df = pairs.toDF("k", "v")
    val want: Map[Long, Option[Long]] = pairs.map { case (k, _) =>
      val above = pairs.filter(_._1 > k).map(_._2)
      k -> (if (above.isEmpty) None else Some(above.min))
    }.toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = Scale.minAboveStrict(df, "k", "v", parts).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(got == want, s"diverges at parts=$parts: " +
        want.collect { case (k, w) if got.get(k) != Some(w) =>
          s"$k: got ${got.get(k)} want $w" }.take(3).mkString("; "))
    }
    val result = Scale.minAboveStrict(df, "k", "v")
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix scan must never plan a global window:\n$plan")
    // The returned plan must read the SAME materialized partitioning the
    // driver combine observed (a LogicalRDD leaf over the persisted
    // scan) — an unpinned plan re-runs repartitionByRange with fresh
    // boundary samples and can pair pids with the wrong prefix map (the
    // one-row skyline drift this structure fixed).
    val leaves = result.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"two-pass scan must be re-rooted on the persisted RDD: $leaves")
  }

  test("morton curve: known values and bijection on the 8-bit grid (round 7)") {
    val df = spark.range(256)
      .select(expr("id % 16").as("x"), expr("id div 16").as("y"))
      .withColumn("z", expr(Scale.mortonSpark("x", "y")))
    // a bijection [0,16)² → [0,256): every z distinct and the max is 255
    assert(df.select("z").distinct().count() == 256)
    val mm = df.agg(min(col("z")), max(col("z"))).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == 255L)
    // hand-checked value: x=3 → bits {0,2} → 1+4=5; y=5 → bits {1,5} →
    // 2+32=34; z=39
    assert(df.filter(col("x") === 3 && col("y") === 5)
      .select("z").head().getLong(0) == 39L)
  }

  test("writeZOrdered: per-file zone maps tight in BOTH dims; date sort is not (round 7)") {
    val orders = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .select(col("o_custkey"),
        expr("datediff(cast(o_orderdate as date), to_date('1970-01-01'))")
          .cast("long").as("eday"))
    val b = orders.agg(min(col("o_custkey")).as("ck_mn"),
      max(col("o_custkey")).as("ck_mx"),
      min(col("eday")).as("day_mn"), max(col("eday")).as("day_mx"))
    val z = orders.crossJoin(broadcast(b))
      .withColumn("xq",
        expr("((o_custkey - ck_mn) * 65535) div greatest(ck_mx - ck_mn, 1)"))
      .withColumn("yq",
        expr("((eday - day_mn) * 65535) div greatest(day_mx - day_mn, 1)"))
      .withColumn("z", expr(Scale.mortonSpark("xq", "yq")))
      .select("o_custkey", "eday", "z")
    val zPath = "/tmp/graft_zorder_files"
    Scale.writeZOrdered(z, zPath, col("z"), parts = 16)
    val dPath = "/tmp/graft_datesort_files"
    orders.repartitionByRange(16, col("eday")).sortWithinPartitions(col("eday"))
      .write.mode("overwrite").parquet(dPath)
    def avgSpan(path: String, c: String): Double = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length >= 8, s"expected many part files under $path")
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    val g = orders.agg(
      (max(col("o_custkey")) - min(col("o_custkey"))).cast("double"),
      (max(col("eday")) - min(col("eday"))).cast("double")).head()
    val (gCk, gDay) = (g.getDouble(0), g.getDouble(1))
    // Z-order: every file's zone map is well under the global span in
    // BOTH dims (16 curve ranges ≈ a 4×4 grid → ~1/4 span each)
    assert(avgSpan(zPath, "o_custkey") < 0.55 * gCk,
      "z-order should bound custkey per file")
    assert(avgSpan(zPath, "eday") < 0.55 * gDay,
      "z-order should bound eday per file")
    // single-dim date sort: dates tight, but custkey spans stay ~global —
    // the failure mode Z-ordering exists to fix
    assert(avgSpan(dPath, "eday") < 0.25 * gDay)
    assert(avgSpan(dPath, "o_custkey") > 0.8 * gCk)
  }

  test("bloom prefilter: real reduction, no false negatives, exact final result") {
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
    val sel = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
    val pre = Scale.bloomPrefilter(li, "l_orderkey", sel, "o_orderkey")
    val preN = pre.count()
    val liN = li.count()
    assert(preN < liN, s"bloom should reduce the probe ($preN vs $liN)")
    val exact = li.join(sel, li("l_orderkey") === sel("o_orderkey"), "left_semi")
    assert(exact.count() <= preN, "bloom survivors must be a superset of true matches")
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("l_orderkey"), col("l_linenumber"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(key(Scale.bloomSemiJoin(li, "l_orderkey", sel, "o_orderkey")) === key(exact))
  }

  test("bloom prefilter rejects a driver-hostile mBits before allocating") {
    val li = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
    val sel = li.select(col("l_orderkey"))
    // 2^27 bits (16 MB) is the cap; one word past it must fail the
    // require, not allocate gigabytes driver-side
    val err = intercept[IllegalArgumentException] {
      Scale.bloomPrefilter(li, "l_orderkey", sel, "l_orderkey",
        mBits = (1 << 27) + 64)
    }
    assert(err.getMessage.contains("2^27"))
    // the cap itself is accepted (boundary is inclusive)
    Scale.bloomPrefilter(li, "l_orderkey", sel, "l_orderkey", mBits = 1 << 27)
  }

  test("rankGlobal equals the single-partition window and never plans one (round 7)") {
    val docs = graft.Engine.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val windowed = docs.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
    val ranked = Scale.rankGlobal(docs, col("n_chars").desc, col("doc_id"))
    assert(windowed.except(ranked).isEmpty && ranked.except(windowed).isEmpty)
    // the scale point: the window form funnels every row through ONE
    // reducer; rankGlobal's plan must not contain that exchange
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"rankGlobal planned a single-partition exchange:\n$plan")
    assert(windowed.queryExecution.executedPlan.toString
      .contains("SinglePartition")) // the window form really is the cliff
  }

  test("rankGlobal ranks are boundary-independent: stable across partition counts (round 7)") {
    val docs = graft.Engine.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val at4 = Scale.rankGlobal(docs.repartition(4),
      col("n_chars").desc, col("doc_id"))
    val at17 = Scale.rankGlobal(docs.repartition(17),
      col("n_chars").desc, col("doc_id"))
    assert(at4.except(at17).isEmpty && at17.except(at4).isEmpty)
  }

  test("leadGlobal equals the single-partition lead window and never plans one (round 16)") {
    val ids = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey").as("id")).distinct()
    val windowed = ids.withColumn("nxt",
      lead(col("id"), 1).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("id"))))
    val led = Scale.leadGlobal(ids, "id")
    assert(windowed.except(led).isEmpty && led.except(windowed).isEmpty)
    val plan = led.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"leadGlobal planned a single-partition exchange:\n$plan")
    // boundary-independence: successors are stable across partition counts
    val at3 = Scale.leadGlobal(ids, "id", parts = 3)
    val at17 = Scale.leadGlobal(ids, "id", parts = 17)
    assert(at3.except(at17).isEmpty && at17.except(at3).isEmpty)
  }

  test("q_shard_balance: round-robin-by-size totals spread at most one max document (round 7)") {
    val stats = graft.Registry.all("q_shard_balance")
      .fn(spark, TestSpark.sfDir)
      .select(col("sum_chars").cast("long")).collect().map(_.getLong(0))
    val maxDoc = graft.Engine.table(spark, TestSpark.sfDir, "documents")
      .agg(max(col("n_chars"))).head().getLong(0)
    assert(stats.length == 16)
    assert(stats.max - stats.min <= maxDoc,
      s"shard spread ${stats.max - stats.min} exceeds one max doc ($maxDoc)")
  }

  test("q_id_gaps: gaps partition the id range exactly and contain no present id") {
    val ids = graft.Engine.table(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey").as("id")).distinct()
    val gaps = graft.Registry.all("q_id_gaps").fn(spark, TestSpark.sfDir)
    // conservation: present ids + missing ids tile [min, max] exactly
    val (mn, mx, n) = {
      val r = ids.agg(min(col("id")), max(col("id")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val missing = gaps.agg(coalesce(sum(col("n_missing")), lit(0L)))
      .head().getLong(0)
    assert(n + missing === mx - mn + 1,
      s"ids($n) + missing($missing) must tile the range (${mx - mn + 1})")
    // soundness: no present id falls inside any reported gap
    val inside = gaps.join(ids,
        col("id") >= col("gap_start") && col("id") <= col("gap_end"))
      .count()
    assert(inside === 0L, "a reported gap contains a present id")
    assert(gaps.count() > 0, "test data is known to contain gaps")
  }

  test("fused CmsHashes equals the concat+md5+hex+conv chain (round 9)") {
    import spark.implicits._
    // the exploded chain is the semantic spec (and exactly what the
    // q_join_size_est ORACLE still computes in SQL) — the fused
    // expression must be bit-identical on negatives, zero, boundaries
    val keys = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 42L)
      ++ (1 to 200).map(i => i * 2654435761L % 1000003L - 500000L)).toDF("k")
    def hash8(seed: org.apache.spark.sql.Column,
        k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(concat(seed.cast("string"), lit(":"),
        k.cast("string")).cast("binary")), 1, 8), 16, 10).cast(
        org.apache.spark.sql.types.LongType)
    val chain = keys.select(col("k"),
      explode(sequence(lit(0L), lit(2L))).as("r"))
      .select(col("k"), col("r"), hash8(col("r"), col("k")).as("h"))
    val fused = keys.select(col("k"),
      posexplode(graft.functions.TextExpressions.cmsHashes(col("k"), 3))
        .as(Seq("r", "h")))
      .select(col("k"), col("r").cast(org.apache.spark.sql.types.LongType)
        .as("r"), col("h"))
    assert(chain.except(fused).isEmpty && fused.except(chain).isEmpty)
  }

  test("q_bitmap_distinct: bitmap popcount equals both its own exact column " +
      "and a brute-force distinct per type") {
    import graft.{Engine, Registry, TestSpark}
    val dir = TestSpark.sfDir
    val rows = Registry.all("q_bitmap_distinct").fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Engine.table(spark, dir, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exp = ev.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(rows.keySet === exp.keySet)
    exp.foreach { case (t, users) =>
      val (nWords, nBitmap, nExact) = rows(t)
      assert(nBitmap === users.size.toLong, s"type $t bitmap count")
      assert(nExact === users.size.toLong, s"type $t exact count")
      assert(nWords === users.map(_ / 32).distinct.size.toLong, s"type $t words")
    }
  }

  test("q_snapshot_diff: classes partition the key space and drift is the " +
      "brute-force cents delta (relational family; no RelationalSpec file)") {
    import graft.{Engine, Registry, TestSpark}
    val dir = TestSpark.sfDir
    val got = Registry.all("q_snapshot_diff").fn(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = Engine.table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").cast("string"),
        floor(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    def snap(cut: String) = orders.filter(_._2 < cut).groupBy(_._1)
      .view.mapValues(os => (os.size.toLong, os.map(_._3).sum)).toMap
    val (a, b) = (snap("1998-01-01"), snap("2000-01-01"))
    val classes = (a.keySet ++ b.keySet).toSeq.map { k =>
      val status =
        if (!a.contains(k)) "added"
        else if (!b.contains(k)) "removed"
        else if (a(k) != b(k)) "changed" else "unchanged"
      (status, math.abs(b.getOrElse(k, (0L, 0L))._2 - a.getOrElse(k, (0L, 0L))._2))
    }
    val exp = classes.groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    assert(got === exp)
    // snapshots are monotone cuts of one table: nothing can be removed
    assert(!got.contains("removed"))
  }
}
