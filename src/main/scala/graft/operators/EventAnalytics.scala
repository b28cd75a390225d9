package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** Event-log analytics: gap sessionization, ordered funnels, retention
  * cohorts. Not present in the reference (its event-ish surface is raw SQL
  * passthrough, `/root/reference/pandas_redshift/core.py:84` — `EXT` in
  * SURVEY §2); these are the standard warehouse queries a product-analytics
  * user of the reference would run through `redshift_to_pandas`.
  *
  * Scale shapes: every operator here shuffles on `user_id` only — one
  * partitioned sort for sessionize, aggregate-then-self-join for the
  * funnel, distinct + join for cohorts. No global windows, no cross
  * products; per-user state is bounded by that user's events.
  */
object EventAnalytics {

  private def events(s: SparkSession, dir: String): DataFrame =
    Engine.table(s, dir, "events")

  /** Session gap: a new session starts after 30 min of inactivity.
    * Interpolated into the oracle SQL so both engines share one constant.
    */
  val sessionGapUs: Long = 30L * 60 * 1000000

  /** q_label_horizon's label window: a view converts if the same user
    * purchases within this many µs after it (strictly-after in the
    * (ts, event_id) row order). Shared with the oracle SQL.
    */
  val labelHorizonUs: Long = 3600L * 1000000

  /** Gaps-and-islands session labeling: each row of `df` gains a
    * `session_id` (1-based ordinal per key) that increments whenever the
    * time since the previous event of the same key exceeds `gapUs`.
    *
    * Unlike `session_window` (streaming/Streams.scala) this ASSIGNS ids to
    * individual events, so downstream operators can join on (key, session)
    * — the labeling a warehouse sessionization produces. One shuffle on
    * `key`; both windows share the same partitioning + (ts, tieBreak)
    * sort order so the sort runs once.
    */
  /** q_dedup_window's cooldown (1 h in µs); shared with its oracle SQL. */
  val debounceUs: Long = 3600L * 1000000L

  /** q_dedup_window's debounce-island frame: every event tagged with its
    * (user_id, event_type) gap-island number (a new island opens when
    * the gap to the previous event exceeds [[debounceUs]]). Shared by
    * the registry builder and the spec's struct-ordering reference
    * finisher.
    */
  private[graft] def dedupWindowIslands(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val brk = when(lag(col("ts"), 1).over(w).isNull
        .or(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
          > debounceUs), 1L)
      .otherwise(0L)
    ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("island",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q_funnel_window's conversion box (1 h in µs); shared with its oracle. */
  val convertWindowUs: Long = 3600L * 1000000L

  /** q_negative_sampling's catalog bucket size (items per plan-shaping
    * hash bucket). The output is provably bucket-count-invariant, so the
    * value only shapes the plan. StatsSpec forces a multi-bucket grid
    * (nBuckets >= 3) on the tiny test catalogs by calling
    * [[negativeSampling]] with a smaller `bucketItems` — at the 2048
    * default every graded SF (100-3000 items) resolves to 1 bucket, which
    * would leave the >1-bucket top-2 closure and seen-array prune
    * untested (round-11 ADVICE #1; a parameter since round 13 — the
    * previous mutable var was a latent flake under suite parallelism).
    */
  val negSamplingBucketItems: Long = 2048L

  /** q_negative_sampling_user's sample-bucket size: the catalog divides
    * into greatest(1, |I| div this) md5-derived buckets and each user
    * draws ONLY from their hashed bucket — the CONTRACT change (a stated
    * per-user sample, not the exact global top-2) that caps the draw at
    * |U|·this md5 evaluations instead of the exact form's |U|·|I|.
    * Unlike [[negSamplingBucketItems]] this is part of the semantics, so
    * it is interpolated into the oracle SQL and the bucket hash must be
    * engine-portable (md5 nibbles, not xxhash64).
    */
  val negSamplingUserBucketItems: Long = 64L

  /** First-4-md5-nibble integer (0..65535) of a varchar SQL expression —
    * the oracle twin of `conv(substring(md5(x), 1, 4), 16, 10)` (the
    * dsirBucketCol idiom).
    */
  private[graft] def oMd5Hex4(e: String): String =
    s"((instr('0123456789abcdef', substr(md5($e), 1, 1)) - 1) * 4096" +
      s" + (instr('0123456789abcdef', substr(md5($e), 2, 1)) - 1) * 256" +
      s" + (instr('0123456789abcdef', substr(md5($e), 3, 1)) - 1) * 16" +
      s" + (instr('0123456789abcdef', substr(md5($e), 4, 1)) - 1))"

  /** q_negative_sampling_user core (see the queries entry for the full
    * contract): per user, the top-`k` md5-ranked unseen items from the
    * user's hashed catalog bucket. `bucketItems` is exposed so StatsSpec
    * can force a multi-bucket grid on the tiny test catalog; the graded
    * query always passes the [[negSamplingUserBucketItems]] default (the
    * constant the oracle SQL interpolates).
    */
  /** props `$.k` as BIGINT via from_json, NOT get_json_object: JsonToStructs
    * builds its Jackson parser once per task, while get_json_object creates
    * one PER ROW — each acquiring a buffer recycler through a ThreadLocal
    * probe that degrades linearly as the map fills (jstack'd as the entire
    * 100× cost of the negative-sampling draws: every worker pinned in
    * ThreadLocalMap.getEntryAfterMiss under JsonFactory.createParser,
    * 200 s cold vs ~13 s with this extraction). Value-identical on the
    * numeric props payload: absent/malformed k → null in both forms.
    */
  private[graft] def propsItem: Column =
    from_json(col("props"), StructType(Seq(StructField("k", LongType))))
      .getField("k")

  /** q_negative_sampling core (the EXACT global-complement draw; see the
    * queries entry for the full contract and scale notes): per user, the
    * top-`k` md5-ranked items they never interacted with. `bucketItems`
    * only shapes the plan (the draw is provably bucket-count-invariant);
    * StatsSpec passes a small value to force a multi-bucket grid on the
    * tiny test catalogs.
    */
  def negativeSampling(ev: DataFrame,
      bucketItems: Long = negSamplingBucketItems, k: Int = 2): DataFrame = {
    val it = ev.select(col("item")).distinct()
    // one bounded catalog count sizes the bucket grid (~2k items per
    // bucket); the output is bucket-count-invariant, so this only
    // shapes the plan
    val nBuckets = math.max(1L, it.count() / bucketItems).toInt
    val bucketOf = pmod(xxhash64(col("item")), lit(nBuckets.toLong))
      .cast(IntegerType)
    val itB = it.withColumn("bucket", bucketOf)
    val uB = ev.select(col("user_id")).distinct()
      .select(col("user_id"),
        explode(sequence(lit(0), lit(nBuckets - 1))).as("bucket"))
    val seenB = ev.distinct().withColumn("bucket", bucketOf)
      .groupBy(col("user_id"), col("bucket"))
      .agg(collect_set(col("item")).as("seen_arr"))
    val cand = uB
      .join(seenB, Seq("user_id", "bucket"), "left")
      .join(broadcast(itB), Seq("bucket"))
      .filter(!coalesce(array_contains(col("seen_arr"), col("item")),
        lit(false)))
    val key = md5(concat(col("user_id").cast(StringType), lit(":"),
      col("item").cast(StringType)).cast(BinaryType))
    val wb = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(key, col("item"))
    val w = Window.partitionBy(col("user_id")).orderBy(key, col("item"))
    cand.withColumn("rkb", row_number().over(wb)).filter(col("rkb") <= k)
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("user_id"), col("item").as("neg_item"), col("rk"))
      .orderBy(col("user_id"), col("rk"))
  }

  // per-(session, input-plan) memo of the persisted distinct interaction
  // table: every registry invocation (Bench warmup + two timed passes +
  // the gate) previously persisted a FRESH corpus-sized frame and never
  // unpersisted it — the shared-JVM ambient-cost leak round-12 ADVICE
  // flagged. The Components.simhashPairs discipline applied to a cached
  // FRAME instead of a parquet dir: one persisted table per dataset per
  // JVM, every consumer reads it.
  // keyed on the FULL canonicalized plan string, not its 32-bit
  // semanticHash (ADVICE-r13: an Int collision between two datasets in
  // one shared bench/gate JVM would silently serve the wrong corpus's
  // cached table) — one string per dataset per JVM, bytes are irrelevant
  private val seenMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def negativeSamplingUser(e: DataFrame,
      bucketItems: Long = negSamplingUserBucketItems, k: Int = 2): DataFrame = {
    val ev = e.select(col("user_id"), propsItem.as("item"))
      .filter(col("item").isNotNull)
    // ONE json-parse pass: everything downstream (catalog, user list,
    // bucket count, the anti-join's right side) derives from the
    // persisted distinct interaction table — the raw plan re-parsed the
    // 10M-row props column four times and that, not the draw, was the
    // 100× cost (BenchOne: 65-105 s → ~9 s)
    val seen = seenMemo.getOrElseUpdate(
      (e.sparkSession, ev.queryExecution.analyzed.canonicalized.toString),
      ev.distinct()
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY))
    val it = seen.select(col("item")).distinct()
    // one bounded catalog count derives the bucket grid — the same count
    // the oracle's `nb` CTE states, so both engines land on the same B
    val nB = math.max(1L, it.count() / bucketItems)
    def hex4(c: Column): Column =
      conv(substring(md5(c.cast(BinaryType)), 1, 4), 16, 10).cast(LongType)
    val itB = it.withColumn("sb", hex4(col("item").cast(StringType)) % nB)
    val uB = seen.select(col("user_id")).distinct()
      .withColumn("sb",
        hex4(concat(lit("u:"), col("user_id").cast(StringType))) % nB)
    val cand = uB.join(broadcast(itB), Seq("sb"))
      .join(seen, Seq("user_id", "item"), "left_anti")
    val key = md5(concat(col("user_id").cast(StringType), lit(":"),
      col("item").cast(StringType)).cast(BinaryType))
    val w = Window.partitionBy(col("user_id")).orderBy(key, col("item"))
    cand.withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= k)
      .select(col("user_id"), col("item").as("neg_item"), col("rk"))
      .orderBy(col("user_id"), col("rk"))
  }

  def sessionize(df: DataFrame, key: String, ts: String, tieBreak: String,
      gapUs: Long = sessionGapUs): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val brk = when(lag(col(ts), 1).over(w).isNull
        .or(unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(w)) > gapUs), 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel view→click→purchase over any (user_id, event_type,
    * ts) frame: per user, t_view = min view ts, t_click = min click at or
    * after t_view, t_purchase = min purchase at or after t_click; stage =
    * steps reached. Three aggregate-then-equi-join passes keyed on
    * user_id only. Shared by q_funnel and its spec so the tested
    * composition IS the graded one.
    */
  def funnel(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1)
          + when(col("t_click").isNull, 0).otherwise(1)
          + when(col("t_purchase").isNull, 0).otherwise(1))
          .cast(IntegerType).as("stage"))
  }

  val queries: Map[String, Q] = Map(

    // Per-session rollup: ordinal session ids + microsecond-exact
    // durations (timestamps are µs-aligned in both engines — Engine.scala
    // nanos note — so epoch_us/unix_micros arithmetic is bit-exact).
    "q_sessionize" -> Q(
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $sessionGapUs
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x)
         |SELECT user_id, cast(sid as bigint) AS session_id,
         |  cast(count(*) as bigint) AS n_events,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      sessionize(events(s, dir), "user_id", "ts", "event_id")
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // A/B-test readout (round 7 continuation): users deterministically
    // hash-split into two arms (first md5 nibble parity — the
    // q_sample_hash discipline, no rng), conversion = the user ever
    // purchased; emits per-arm exposure/conversion counts, conversion
    // rates, and the relative lift of B over A — every number an exact
    // integer or a floor-ppm ratio of exact integers, so the whole
    // experiment readout is hash-gated (significance testing would sit
    // on top of these same four counts). Scale shape: one map-side-
    // combinable per-user agg (the only corpus shuffle), then a single-
    // row conditional aggregate. Every ratio is guarded (empty arm or
    // zero-conversion arm A → NULL on BOTH engines — DuckDB's `//`
    // raises on a zero divisor where Spark `div` yields NULL) and lifted
    // to decimal(38,0)/HUGEINT before the multiply: conv_b * n_a * 1e6
    // passes 2^63 at ~3M users/arm, where non-ANSI Spark wraps silently
    // while DuckDB errors (the q_rarity_score lift discipline).
    "q_abtest_lift" -> Q(
      """WITH u AS (
        |  SELECT user_id,
        |    (instr('0123456789abcdef',
        |           substr(md5(cast(user_id as varchar)), 1, 1)) - 1) % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    cast(count(CASE WHEN arm = 0 THEN 1 END) as bigint) AS n_a,
        |    cast(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) as bigint) AS conv_a,
        |    cast(count(CASE WHEN arm = 1 THEN 1 END) as bigint) AS n_b,
        |    cast(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) as bigint) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  CASE WHEN n_a = 0 THEN NULL
        |       ELSE cast((cast(1000000 as hugeint) * conv_a) // n_a as bigint)
        |       END AS cvr_a_ppm,
        |  CASE WHEN n_b = 0 THEN NULL
        |       ELSE cast((cast(1000000 as hugeint) * conv_b) // n_b as bigint)
        |       END AS cvr_b_ppm,
        |  CASE WHEN conv_a = 0 OR n_b = 0 THEN NULL
        |       ELSE cast((cast(1000000 as hugeint) * conv_b * n_a)
        |            // (cast(conv_a as hugeint) * n_b) - 1000000 as bigint)
        |       END AS lift_ppm
        |FROM c ORDER BY n_a""".stripMargin) { (s, dir) =>
      val u = events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
        .withColumn("arm",
          conv(substring(md5(col("user_id").cast(StringType).cast(BinaryType)),
            1, 1), 16, 10).cast(LongType) % 2)
      u.agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0)).as("conv_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0)).as("conv_b"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          expr("CASE WHEN n_a = 0 THEN NULL ELSE cast(" +
            "(cast(1000000 as decimal(38,0)) * conv_a) div n_a as bigint) END")
            .as("cvr_a_ppm"),
          expr("CASE WHEN n_b = 0 THEN NULL ELSE cast(" +
            "(cast(1000000 as decimal(38,0)) * conv_b) div n_b as bigint) END")
            .as("cvr_b_ppm"),
          expr("CASE WHEN conv_a = 0 OR n_b = 0 THEN NULL ELSE cast(" +
            "(cast(1000000 as decimal(38,0)) * conv_b * n_a)" +
            " div (cast(conv_a as decimal(38,0)) * n_b) - 1000000 as bigint) END")
            .as("lift_ppm"))
    },

    // Sample-ratio-mismatch guardrail (round 9): the FIRST check an
    // experimentation platform runs before trusting q_abtest_lift /
    // q_abtest_cuped — are the md5-parity arms actually 50/50, or did
    // assignment/logging bias the split? χ²(1 dof, equal expected) =
    // (n_a−n_b)²/N, emitted in exact integer milli-units with the
    // 3.841 critical-value flag evaluated identically on both engines.
    // Scale shape: one user-distinct agg (the only corpus shuffle) +
    // a 1-row close; (n_a−n_b)²·1000 lifts to decimal(38,0)/HUGEINT.
    "q_ab_srm" -> Q(
      """WITH u AS (
        |  SELECT DISTINCT user_id,
        |    (instr('0123456789abcdef',
        |           substr(md5(cast(user_id as varchar)), 1, 1)) - 1) % 2 AS arm
        |  FROM events),
        |c AS (SELECT
        |    cast(count(CASE WHEN arm = 0 THEN 1 END) as bigint) AS n_a,
        |    cast(count(CASE WHEN arm = 1 THEN 1 END) as bigint) AS n_b
        |  FROM u)
        |SELECT n_a, n_b, n_a + n_b AS n_total,
        |  cast((cast(n_a - n_b as hugeint) * (n_a - n_b) * 1000)
        |       // (n_a + n_b) as bigint) AS chi2_milli,
        |  (cast(n_a - n_b as hugeint) * (n_a - n_b) * 1000)
        |    // (n_a + n_b) > 3841 AS srm_flag
        |FROM c ORDER BY n_total""".stripMargin) { (s, dir) =>
      events(s, dir)
        .select(col("user_id")).distinct()
        .withColumn("arm",
          conv(substring(md5(col("user_id").cast(StringType).cast(BinaryType)),
            1, 1), 16, 10).cast(LongType) % 2)
        .agg(count(when(col("arm") === 0, 1)).as("n_a"),
          count(when(col("arm") === 1, 1)).as("n_b"))
        .select(col("n_a"), col("n_b"),
          (col("n_a") + col("n_b")).as("n_total"),
          expr("cast((cast(n_a - n_b as decimal(38,0)) * (n_a - n_b) * 1000)" +
            " div (n_a + n_b) as bigint)").as("chi2_milli"),
          expr("(cast(n_a - n_b as decimal(38,0)) * (n_a - n_b) * 1000)" +
            " div (n_a + n_b) > 3841").as("srm_flag"))
        .orderBy(col("n_total"))
    },

    // CUPED variance-reduced A/B readout (round 9; Deng et al. 2013 —
    // the adjustment every mature experimentation platform applies):
    // adjusted_i = post_i − θ·(pre_i − mean_pre), θ = cov(pre,post)/
    // var(pre) POOLED across arms, computed on a pre/post split at the
    // data's midpoint day (SF-adaptive, no calendar constant). Same
    // md5-parity arms as q_abtest_lift. Everything integer with staged
    // floors: θ in ppm from decimal-lifted moment forms, and the
    // per-user adjustment scaled by n·1e6 (A_i = y_i·n·1e6 −
    // θ_ppm·(x_i·n − SX)) so no mean is ever divided out before the
    // final per-arm close — identical on both engines; zero pre-period
    // variance degrades to θ=0 (the unadjusted readout) on both.
    // Scale shape: one per-user agg (the only corpus shuffle), a 1-row
    // pooled-moment aggregate broadcast back, one per-arm agg.
    "q_abtest_cuped" -> Q(
      """WITH d AS (SELECT (min(epoch_us(ts) // 86400000000)
        |    + max(epoch_us(ts) // 86400000000) + 1) // 2 AS mid
        |  FROM events),
        |u AS (SELECT user_id,
        |    (instr('0123456789abcdef',
        |           substr(md5(cast(user_id as varchar)), 1, 1)) - 1) % 2 AS arm,
        |    sum(CASE WHEN epoch_us(ts) // 86400000000 < d.mid
        |             THEN cast(floor(value * 100) as bigint) ELSE 0 END) AS x,
        |    sum(CASE WHEN epoch_us(ts) // 86400000000 >= d.mid
        |             THEN cast(floor(value * 100) as bigint) ELSE 0 END) AS y
        |  FROM events, d GROUP BY user_id, arm),
        |g AS (SELECT cast(count(*) as bigint) AS n,
        |        cast(sum(x) as hugeint) AS sx, cast(sum(y) as hugeint) AS sy,
        |        cast(sum(cast(x as hugeint) * y) as hugeint) AS sxy,
        |        cast(sum(cast(x as hugeint) * x) as hugeint) AS sxx
        |      FROM u),
        |th AS (SELECT n, sx,
        |         CASE WHEN n * sxx - sx * sx > 0
        |              THEN ((n * sxy - sx * sy) * 1000000)
        |                   // (n * sxx - sx * sx)
        |              ELSE 0 END AS theta_ppm
        |       FROM g)
        |SELECT u.arm,
        |  cast(count(*) as bigint) AS n_users,
        |  cast(sum(u.x) as bigint) AS sum_pre_cents,
        |  cast(sum(u.y) as bigint) AS sum_post_cents,
        |  cast(max(th.theta_ppm) as bigint) AS theta_ppm,
        |  cast((sum(u.y) * 1000000) // count(*) as bigint) AS mean_post_micro,
        |  cast(sum(cast(u.y as hugeint) * th.n * 1000000
        |           - th.theta_ppm * (cast(u.x as hugeint) * th.n - th.sx))
        |       // (count(*) * max(th.n)) as bigint) AS mean_adj_micro
        |FROM u, th GROUP BY u.arm ORDER BY u.arm""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val day = expr("unix_micros(ts) div 86400000000L")
      val mid = ev.agg(((min(day) + max(day) + 1L) / 2).cast(LongType).as("mid"))
      val u = ev.crossJoin(broadcast(mid))
        .groupBy(col("user_id"),
          (conv(substring(md5(col("user_id").cast(StringType).cast(BinaryType)),
            1, 1), 16, 10).cast(LongType) % 2).as("arm"))
        .agg(
          sum(when(day < col("mid"),
            floor(col("value") * 100).cast(LongType)).otherwise(0L)).as("x"),
          sum(when(day >= col("mid"),
            floor(col("value") * 100).cast(LongType)).otherwise(0L)).as("y"))
      val dec = "decimal(38,0)"
      val g = u.agg(count(lit(1)).as("n"),
          sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
          sum(expr(s"cast(x as $dec) * y")).as("sxy"),
          sum(expr(s"cast(x as $dec) * x")).as("sxx"))
        .select(col("n"), col("sx"),
          expr(s"""CASE WHEN n * sxx - sx * sx > 0
                  |THEN ((n * sxy - sx * sy) * 1000000)
                  |     div (n * sxx - sx * sx)
                  |ELSE cast(0 as $dec) END""".stripMargin).as("theta_ppm"))
      u.crossJoin(broadcast(g))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sum_pre_cents"),
          sum(col("y")).as("sum_post_cents"),
          max(col("theta_ppm")).cast(LongType).as("theta_ppm"),
          expr("cast((cast(sum(y) as decimal(38,0)) * 1000000)" +
            " div count(*) as bigint)").as("mean_post_micro"),
          expr(s"""cast(sum(cast(y as $dec) * n * 1000000
                  |         - theta_ppm * (cast(x as $dec) * n - sx))
                  |div (count(*) * max(n)) as bigint)""".stripMargin)
            .as("mean_adj_micro"))
        .orderBy(col("arm"))
    },

    // Event debouncing (round 7 continuation): within each (user, type)
    // stream, keep only the FIRST event of every burst — bursts being the
    // gaps-and-islands under a 1-hour cooldown (the sessionize kernel on
    // a composite key) — and count what was suppressed. The rate-limit
    // dedup a notification/alerting pipeline runs (send the first alert,
    // swallow the repeats until the stream goes quiet for the cooldown).
    // Scale shape: one hash partition on (user_id, event_type), both the
    // break flag and the island sum share one sort, and the per-island
    // representative is a map-side-combinable min/min_by — state per
    // group is that group's events, never the whole log. µs arithmetic is
    // integer-exact in both engines.
    "q_dedup_window" -> Q(
      s"""WITH x AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $debounceUs
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
         |isl AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    sum(brk) OVER (PARTITION BY user_id, event_type
         |                   ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS island
         |  FROM x)
         |SELECT user_id, event_type,
         |  min(event_id) FILTER (ts = kept_ts) AS kept_event_id, kept_ts,
         |  cast(count(*) - 1 as bigint) AS n_suppressed
         |FROM (SELECT *, min(ts) OVER (PARTITION BY user_id, event_type, island)
         |        AS kept_ts FROM isl)
         |GROUP BY user_id, event_type, island, kept_ts
         |ORDER BY user_id, event_type, kept_ts""".stripMargin) { (s, dir) =>
      // round 16: a struct(ts, event_id) min_by ordering key is not
      // hash-buffer-mutable — the corpus-sized island aggregation paid a
      // post-window re-Sort + SortAggregate. The SAME total order as one
      // scalar decimal(38,0) (epoch_us·10^10 + event_id — exact while
      // event_id ∈ [0, 10^10), guarded loudly; the q_ewma `ord` pack is
      // the in-file precedent) keeps a fixed-width mutable buffer, so
      // the aggregate plans as codegen HashAggregate and the extra Sort
      // disappears. min_by semantics and every output are unchanged;
      // EventOpsSpec pins fused ≡ struct form on the real events table.
      val eidCap = 10000000000L
      val ord = when(col("event_id") < 0 || col("event_id") >= eidCap,
          raise_error(concat(lit("q_dedup_window: event_id outside "
            + "[0, 10^10): "), col("event_id").cast(StringType))))
        .otherwise(unix_micros(col("ts")).cast(DecimalType(38, 0))
          * eidCap + col("event_id"))
      dedupWindowIslands(events(s, dir))
        .groupBy(col("user_id"), col("event_type"), col("island"))
        .agg(min_by(col("event_id"), ord).as("kept_event_id"),
          min(col("ts")).as("kept_ts"),
          (count(lit(1)) - 1).as("n_suppressed"))
        .select(col("user_id"), col("event_type"), col("kept_event_id"),
          col("kept_ts"), col("n_suppressed"))
        .orderBy(col("user_id"), col("event_type"), col("kept_ts"))
    },

    // Ordered funnel view -> click -> purchase: each step's timestamp is
    // the user's earliest qualifying event AT OR AFTER the previous step
    // (min(ts) per step is deterministic, so no cross-engine tie issues).
    // Three aggregate-then-equi-join passes, all keyed on user_id — the
    // scale-safe formulation (no per-user event collection, no window over
    // the whole log).
    "q_funnel" -> Q(
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  cast(1 + (CASE WHEN t_click IS NULL THEN 0 ELSE 1 END)
        |         + (CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END) as int)
        |    AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      funnel(events(s, dir)).orderBy(col("user_id"))
    },

    // Time-boxed conversion funnel: of the users whose FIRST view fell
    // on day d, how many purchased within ONE HOUR of that view — the
    // bounded-window companion to q_funnel's unbounded ordered funnel
    // (a marketing CVR wants "converted promptly", not "converted
    // eventually"). The box is integer µs arithmetic
    // (0 ≤ epoch_us(purchase) − epoch_us(first view) ≤ 3.6e9 — the
    // at-or-after convention q_funnel uses), never engine interval
    // types. Scale shape: one user-keyed min agg, one user-keyed
    // semi-join-shaped EXISTS aggregate, one calendar-sized day rollup —
    // all map-side combinable, no windows at all.
    "q_funnel_window" -> Q(
      s"""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT v.user_id,
         |        max(CASE WHEN e.event_type = 'purchase'
         |                  AND epoch_us(e.ts) - epoch_us(v.t_view)
         |                      BETWEEN 0 AND $convertWindowUs
         |                 THEN 1 ELSE 0 END) AS conv
         |      FROM v JOIN events e USING (user_id)
         |      GROUP BY v.user_id)
         |SELECT cast(v.t_view as date) AS view_day,
         |  cast(count(*) as bigint) AS n_viewers,
         |  cast(sum(c.conv) as bigint) AS n_converted_1h,
         |  cast((sum(c.conv) * 1000000) // count(*) as bigint) AS cvr_ppm
         |FROM v JOIN c USING (user_id)
         |GROUP BY 1 ORDER BY view_day""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val conv = ev.join(v, "user_id")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          (unix_micros(col("ts")) - unix_micros(col("t_view")))
            .between(0L, convertWindowUs), 1L).otherwise(0L)).as("conv"))
      v.join(conv, "user_id")
        .groupBy(to_date(col("t_view")).as("view_day"))
        .agg(count(lit(1)).as("n_viewers"), sum(col("conv")).as("n_converted_1h"))
        .select(col("view_day"), col("n_viewers"), col("n_converted_1h"),
          expr("(n_converted_1h * 1000000L) div n_viewers").as("cvr_ppm"))
        .orderBy(col("view_day"))
    },

    // DAU/WAU stickiness per ISO week — the product-health ratio next
    // to q_dau_window's rolling actives: mean daily actives over weekly
    // actives, in floor-ppm (Σ daily_dau · 1e6 // (days · wau), one
    // floor division so the gate hashes; weekly rather than monthly
    // because the synthetic timeline spans one month — same algebra at
    // any granularity). Both engines truncate weeks to Monday (q_cohort
    // precedent). Scale shape: the corpus collapses to distinct
    // (day, user) in one shuffle; dau is a calendar-sized agg; wau
    // shuffles (week, user) pairs bounded by users × weeks. Nothing
    // bigger than distinct-user-day survives the first exchange.
    "q_stickiness" -> Q(
      """WITH du AS (SELECT DISTINCT cast(ts as date) AS d, user_id
        |            FROM events),
        |daily AS (SELECT d, cast(count(*) as bigint) AS dau FROM du
        |          GROUP BY d),
        |weekly AS (
        |  SELECT cast(date_trunc('week', d) as date) AS week,
        |    cast(count(DISTINCT user_id) as bigint) AS wau
        |  FROM du GROUP BY 1),
        |dm AS (
        |  SELECT cast(date_trunc('week', d) as date) AS week,
        |    cast(count(*) as bigint) AS n_days,
        |    cast(sum(dau) as bigint) AS sum_dau
        |  FROM daily GROUP BY 1)
        |SELECT w.week, dm.n_days, dm.sum_dau, w.wau,
        |  cast((dm.sum_dau * 1000000) // (dm.n_days * w.wau) as bigint)
        |    AS stickiness_ppm
        |FROM weekly w JOIN dm USING (week)
        |ORDER BY week""".stripMargin) { (s, dir) =>
      val du = events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      val daily = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      val weekly = du
        .groupBy(to_date(date_trunc("week", col("d"))).as("week"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val dm = daily
        .groupBy(to_date(date_trunc("week", col("d"))).as("week"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      weekly.join(dm, "week")
        .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
          expr("(sum_dau * 1000000L) div (n_days * wau)").as("stickiness_ppm"))
        .orderBy(col("week"))
    },

    // Time-weighted average value per user — the metering/billing
    // aggregate (a step function holds each reading until the next
    // one; TWA = ∫value dt / ∫dt): plain avg() over-weights bursty
    // readings. All integer µs × cents arithmetic: weighted terms are
    // cents·Δt ≤ 5e4·2.6e12 ≈ 1.3e17 per step and user-lifetime sums
    // stay under 2^63, but the ·1e6 ppm lift does NOT — lifted to
    // decimal(38,0)/HUGEINT before the floor division (q_rarity_score
    // discipline). Same-timestamp users (dur_us = 0) are filtered on
    // both engines — DuckDB `//` raises on zero where Spark yields
    // NULL. Scale shape: one user-partitioned lead window (per-user
    // bounded state), one map-side-combinable per-user agg.
    "q_twa" -> Q(
      """WITH x AS (
        |  SELECT user_id, cast(floor(value * 100) as bigint) AS cents,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id)
        |      - epoch_us(ts) AS dt
        |  FROM events),
        |u AS (SELECT user_id,
        |        cast(count(dt) as bigint) AS n_steps,
        |        cast(sum(dt) as bigint) AS dur_us,
        |        cast(sum(cents * dt) as bigint) AS wsum
        |      FROM x GROUP BY user_id)
        |SELECT user_id, n_steps, dur_us, wsum,
        |  cast((cast(wsum as hugeint) * 1000000) // dur_us as bigint)
        |    AS twa_cents_ppm
        |FROM u WHERE dur_us > 0 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .select(col("user_id"),
          floor(col("value") * 100).cast(LongType).as("cents"),
          (lead(unix_micros(col("ts")), 1).over(w)
            - unix_micros(col("ts"))).as("dt"))
        .groupBy(col("user_id"))
        .agg(count(col("dt")).as("n_steps"),
          sum(col("dt")).as("dur_us"),
          sum(col("cents") * col("dt")).as("wsum"))
        .filter(col("dur_us") > 0L)
        .select(col("user_id"), col("n_steps"), col("dur_us"), col("wsum"),
          expr("cast((cast(wsum as decimal(38,0)) * 1000000) div dur_us as bigint)")
            .as("twa_cents_ppm"))
        .orderBy(col("user_id"))
    },

    // Per-user EWMA smoothing with dyadic weights — the trend readout
    // over a noisy value stream. A true EWMA is a linear recurrence
    // (not window-expressible portably); the 8-lag geometric window
    // with integer weights 128,64,…,1 (denominator 255) is its
    // truncated form and is FULLY integer: wsum ≤ 5e4·255, ppm lift
    // fits bigint with room. Only positions with complete 8-lag
    // history smooth (identical filter both engines); users with <8
    // events drop out. The per-user "latest smoothed value" argmax
    // crosses engines on a composite integer key (µs·1e6 + event_id,
    // lifted decimal(38,0)/HUGEINT — epoch_us·1e6 passes 2^63) —
    // struct-keyed arg_max is not portable to the oracle. Scale shape:
    // one user-partitioned 8-lag window, one map-side max_by/arg_max.
    "q_ewma_smooth" -> Q(
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    cast(floor(value * 100) as bigint) AS cents,
        |    row_number() OVER w AS rn,
        |    128 * cast(floor(value * 100) as bigint)
        |      + 64 * lag(cast(floor(value * 100) as bigint), 1) OVER w
        |      + 32 * lag(cast(floor(value * 100) as bigint), 2) OVER w
        |      + 16 * lag(cast(floor(value * 100) as bigint), 3) OVER w
        |      +  8 * lag(cast(floor(value * 100) as bigint), 4) OVER w
        |      +  4 * lag(cast(floor(value * 100) as bigint), 5) OVER w
        |      +  2 * lag(cast(floor(value * 100) as bigint), 6) OVER w
        |      +  1 * lag(cast(floor(value * 100) as bigint), 7) OVER w
        |      AS wsum
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sm AS (SELECT user_id,
        |         (wsum * 1000000) // 255 AS ewma_ppm,
        |         cast(us as hugeint) * 1000000 + event_id AS ord
        |       FROM x WHERE rn >= 8)
        |SELECT user_id, cast(count(*) as bigint) AS n_smoothed,
        |  cast(max(ewma_ppm) as bigint) AS peak_ewma_ppm,
        |  cast(min(ewma_ppm) as bigint) AS min_ewma_ppm,
        |  cast(arg_max(ewma_ppm, ord) as bigint) AS last_ewma_ppm
        |FROM sm GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cents = floor(col("value") * 100).cast(LongType)
      val wsum = (2 to 8).foldLeft(lit(128L) * cents) { (acc, k) =>
        acc + lit(256L >> k) * lag(cents, k - 1).over(w)
      }
      events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          row_number().over(w).as("rn"), wsum.as("wsum"))
        .filter(col("rn") >= 8)
        .select(col("user_id"),
          expr("(wsum * 1000000L) div 255L").as("ewma_ppm"),
          (col("us").cast(DecimalType(38, 0)) * 1000000 + col("event_id"))
            .as("ord"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_smoothed"),
          max(col("ewma_ppm")).as("peak_ewma_ppm"),
          min(col("ewma_ppm")).as("min_ewma_ppm"),
          max_by(col("ewma_ppm"), col("ord")).as("last_ewma_ppm"))
        .orderBy(col("user_id"))
    },

    // Interval-overlap join (round 9): which user sessions overlap each
    // event type's BUSY periods (active hours with count > 2× that
    // type's mean hourly rate, merged into maximal runs — SF-adaptive by
    // construction, no absolute threshold constant). The ORACLE states
    // the semantic spec — a theta overlap join between merged intervals
    // and session spans — while the graded plan runs the scale shape: a
    // GRID-BUCKETED equi-join (sessions exploded to their covered hours
    // ⋈ busy hours on the hour key, then distinct), which is
    // result-identical because the intervals are by construction unions
    // of whole busy hours. That replacement (theta/BNLJ interval join →
    // grid equi-join + dedup) is THE standard 100 TB interval-join move;
    // the q_join_range band join is its point-to-interval sibling.
    // Explode factor = hours actually spanned by a session (bounded by
    // the 30-min gap rule's activity span). All remaining shapes are
    // hour-grid- or session-bounded.
    "q_join_interval" -> Q(
      s"""WITH x AS (
         |  SELECT user_id, ts, event_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $sessionGapUs
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS MATERIALIZED (
         |  SELECT user_id, sid, epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
         |  FROM (SELECT user_id, ts,
         |          sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                         ROWS UNBOUNDED PRECEDING) AS sid
         |        FROM x)
         |  GROUP BY user_id, sid),
         |hr AS MATERIALIZED (
         |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         |    cast(count(*) as bigint) AS c
         |  FROM events GROUP BY 1, 2),
         |tt AS (SELECT event_type, cast(sum(c) as bigint) AS total,
         |         cast(count(*) as bigint) AS n_hours
         |       FROM hr GROUP BY event_type),
         |busy AS MATERIALIZED (
         |  SELECT hr.event_type, hr.h
         |  FROM hr JOIN tt USING (event_type)
         |  WHERE hr.c * tt.n_hours > 2 * tt.total),
         |iv AS MATERIALIZED (
         |  SELECT event_type, min(h) AS hs, max(h) AS he
         |  FROM (SELECT event_type, h,
         |          h - row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp
         |        FROM busy)
         |  GROUP BY event_type, grp),
         |ic AS (SELECT event_type, cast(count(*) as bigint) AS n_intervals
         |       FROM iv GROUP BY event_type),
         |ovd AS (SELECT DISTINCT iv.event_type, s.user_id, s.sid
         |        FROM sess s JOIN iv
         |          ON s.s_us < (iv.he + 1) * 3600000000
         |         AND iv.hs * 3600000000 <= s.e_us),
         |agg AS (SELECT event_type, cast(count(*) as bigint) AS n_sessions,
         |          cast(count(DISTINCT user_id) as bigint) AS n_users
         |        FROM ovd GROUP BY event_type)
         |SELECT ic.event_type, ic.n_intervals,
         |  coalesce(agg.n_sessions, 0) AS n_sessions,
         |  coalesce(agg.n_users, 0) AS n_users
         |FROM ic LEFT JOIN agg USING (event_type)
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      val sess = sessionize(ev, "user_id", "ts", "event_id")
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(unix_micros(col("ts"))).as("s_us"),
          max(unix_micros(col("ts"))).as("e_us"))
      val hr = ev
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000L").as("h"))
        .agg(count(lit(1)).as("c"))
      val tt = hr.groupBy(col("event_type"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("n_hours"))
      val busy = hr.join(tt, "event_type")
        .filter(col("c") * col("n_hours") > lit(2L) * col("total"))
        .select(col("event_type"), col("h"))
      val ic = busy
        .withColumn("grp", col("h") - row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("h"))))
        .groupBy(col("event_type"), col("grp")).agg(count(lit(1)).as("len"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_intervals"))
      val sh = sess.select(col("user_id"), col("session_id"),
        explode(sequence(expr("s_us div 3600000000L"),
          expr("e_us div 3600000000L"))).as("h"))
      val agg = sh.join(busy, "h")
        .select(col("event_type"), col("user_id"), col("session_id")).distinct()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
      ic.join(agg, Seq("event_type"), "left")
        .select(col("event_type"), col("n_intervals"),
          coalesce(col("n_sessions"), lit(0L)).as("n_sessions"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
        .orderBy(col("event_type"))
    },

    // Out-of-orderness audit (round 9): how late do events arrive
    // relative to event time, per type — the measurement that SIZES a
    // watermark delay for the s_* streaming twins (a watermark is a bet
    // about this distribution; this audit prices the bet from the
    // settled log). The testdata's ingest sequence is already perfectly
    // time-ordered (event_id monotone in ts — a real audit would read
    // an ingest/commit timestamp column), so arrival is REPLAYED with a
    // deterministic md5-derived network delay of 0..30 min per event
    // (the q_sample_hash hash discipline, mirrored in the oracle —
    // stated openly; the OPERATOR, not the jitter, is the deliverable).
    // An event is late if a same-user event with a strictly later
    // event-time already arrived; its lag is the distance to that
    // running frontier. The running max is a per-USER window (bounded
    // partitions), never a global order; the per-type rollup is
    // map-side combinable. Integer µs arithmetic throughout.
    "q_lateness_audit" -> Q(
      """WITH a AS (
        |  SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) + (
        |      ((instr('0123456789abcdef', substr(md5(cast(event_id as varchar)), 1, 1)) - 1) * 4096
        |       + (instr('0123456789abcdef', substr(md5(cast(event_id as varchar)), 2, 1)) - 1) * 256
        |       + (instr('0123456789abcdef', substr(md5(cast(event_id as varchar)), 3, 1)) - 1) * 16
        |       + (instr('0123456789abcdef', substr(md5(cast(event_id as varchar)), 4, 1)) - 1))
        |      % 1800) * 1000000 AS arrival_us
        |  FROM events),
        |x AS (
        |  SELECT event_type, us,
        |    max(us) OVER (PARTITION BY user_id ORDER BY arrival_us, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING
        |                  AND 1 PRECEDING) AS frontier
        |  FROM a)
        |SELECT event_type,
        |  cast(count(*) as bigint) AS n_events,
        |  cast(count(CASE WHEN frontier > us THEN 1 END) as bigint) AS n_late,
        |  cast((count(CASE WHEN frontier > us THEN 1 END) * 1000000)
        |       // count(*) as bigint) AS late_ppm,
        |  cast(coalesce(max(CASE WHEN frontier > us
        |                         THEN frontier - us END), 0) as bigint)
        |    AS max_lag_us
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val delayUs = (conv(substring(
          md5(col("event_id").cast(StringType).cast(BinaryType)), 1, 4), 16, 10)
        .cast(LongType) % 1800L) * 1000000L
      val a = events(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          (unix_micros(col("ts")) + delayUs).as("arrival_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("arrival_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      a.select(col("event_type"), col("us"), max(col("us")).over(w).as("frontier"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(when(col("frontier") > col("us"), 1)).as("n_late"),
          expr("(count(CASE WHEN frontier > us THEN 1 END) * 1000000L)" +
            " div count(*)").as("late_ppm"),
          coalesce(max(when(col("frontier") > col("us"),
            col("frontier") - col("us"))), lit(0L)).as("max_lag_us"))
        .orderBy(col("event_type"))
    },

    // Weekly retention cohorts: cohort = ISO week of the user's first
    // signup; a user is active in week-offset k if they have ANY event in
    // cohort_week + k weeks. Both engines truncate weeks to Monday.
    // distinct (user, week) bounds the join input at users x weeks —
    // far below the raw event count at 100 TB.
    "q_cohort" -> Q(
      """WITH f AS (SELECT user_id,
        |    cast(date_trunc('week', min(ts)) as date) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, cast(date_trunc('week', ts) as date) AS wk
        |      FROM events)
        |SELECT cohort_week,
        |  date_diff('day', cohort_week, wk) // 7 AS week_offset,
        |  cast(count(DISTINCT user_id) as bigint) AS n_active
        |FROM a JOIN f USING (user_id)
        |WHERE wk >= cohort_week
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val f = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
      val a = e.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk")).distinct()
      a.join(f, "user_id")
        .filter(col("wk") >= col("cohort_week"))
        .withColumn("week_offset",
          expr("cast(datediff(wk, cohort_week) div 7 as bigint)"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Gaps-and-islands interval merge: each order opens a 30-day activity
    // interval; overlapping/touching intervals per customer coalesce into
    // islands (running-max-of-end vs next start — one window pass, one
    // shuffle on the key). The standard warehouse "merge overlapping
    // ranges" primitive; dates are integer-exact in both engines.
    "q_interval_merge" -> Q(
      """WITH iv AS (SELECT o_custkey, cast(o_orderdate as date) AS ivl_start,
        |              cast(o_orderdate as date) + 30 AS ivl_end, o_orderkey FROM orders),
        |x AS (SELECT o_custkey, ivl_start, ivl_end, o_orderkey,
        |        CASE WHEN pmax IS NULL OR ivl_start > pmax THEN 1 ELSE 0 END AS brk
        |      FROM (SELECT *, max(ivl_end) OVER (PARTITION BY o_custkey
        |              ORDER BY ivl_start, ivl_end, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |            FROM iv)),
        |y AS (SELECT o_custkey, ivl_start, ivl_end,
        |        sum(brk) OVER (PARTITION BY o_custkey
        |          ORDER BY ivl_start, ivl_end, o_orderkey
        |          ROWS UNBOUNDED PRECEDING) AS island_id
        |      FROM x)
        |SELECT o_custkey, cast(island_id as bigint) AS island_id,
        |  min(ivl_start) AS island_start, max(ivl_end) AS island_end,
        |  cast(count(*) as bigint) AS n_intervals
        |FROM y GROUP BY o_custkey, island_id
        |ORDER BY o_custkey, island_id""".stripMargin) { (s, dir) =>
      val iv = Engine.table(s, dir, "orders").select(
        col("o_custkey"), to_date(col("o_orderdate")).as("ivl_start"),
        date_add(col("o_orderdate"), 30).as("ivl_end"), col("o_orderkey"))
      mergeIntervals(iv, "o_custkey", "ivl_start", "ivl_end", "o_orderkey")
        .groupBy(col("o_custkey"), col("island_id"))
        .agg(min(col("ivl_start")).as("island_start"),
          max(col("ivl_end")).as("island_end"),
          count(lit(1)).as("n_intervals"))
        .orderBy(col("o_custkey"), col("island_id"))
    },

    // Calendar densification: a month spine (global min..max order month,
    // one-row agg -> sequence) cross-joined with the 25-row nation dim
    // (the one legal BroadcastNestedLoopJoin shape: crossJoin(broadcast(
    // tiny))), left-joined with per-(nation, month) order counts and
    // zero-filled — the gap-fill every reporting rollup needs. The spine
    // is O(months), never O(rows); the count agg is the only real shuffle.
    "q_gap_fill" -> Q(
      """WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |             date_trunc('month', max(o_orderdate)) AS hi FROM orders),
        |months AS (SELECT cast(unnest(generate_series(lo, hi,
        |             INTERVAL 1 MONTH)) as date) AS month FROM b),
        |cnt AS (SELECT c_nationkey,
        |          date_trunc('month', o_orderdate) AS month,
        |          count(*) AS n_orders
        |        FROM orders JOIN customer ON o_custkey = c_custkey
        |        GROUP BY 1, 2)
        |SELECT n.n_name, m.month,
        |  cast(coalesce(cnt.n_orders, 0) as bigint) AS n_orders
        |FROM months m CROSS JOIN nation n
        |LEFT JOIN cnt ON cnt.c_nationkey = n.n_nationkey
        |             AND cnt.month = m.month
        |ORDER BY n.n_name, m.month""".stripMargin) { (s, dir) =>
      val orders = Engine.table(s, dir, "orders")
      val spine = orders
        .agg(trunc(min(col("o_orderdate")), "MM").as("lo"),
          trunc(max(col("o_orderdate")), "MM").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
      val cnt = orders
        .join(Engine.table(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"),
          trunc(col("o_orderdate"), "MM").as("month"))
        .agg(count(lit(1)).as("n_orders"))
      val grid = spine.crossJoin(broadcast(
        Engine.table(s, dir, "nation").select(col("n_nationkey"), col("n_name"))))
      grid
        .join(cnt, cnt("c_nationkey") === grid("n_nationkey")
          && cnt("month") === grid("month"), "left")
        .select(col("n_name"), grid("month").as("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("n_name"), col("month"))
    },

    // SCD Type 2 from an event log: per user, consecutive runs of the
    // tracked attribute (event_type) collapse to versioned rows with
    // [valid_from, valid_to) ranges and an is_current flag — the
    // dimension-versioning pattern every warehouse load pipeline carries.
    // One shuffle on user_id; both windows share its sort.
    "q_scd2" -> Q(
      """WITH x AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (SELECT user_id, ts, event_type,
        |        sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS version
        |      FROM x),
        |v AS (SELECT user_id, cast(version as bigint) AS version, event_type,
        |        min(ts) AS valid_from, cast(count(*) as bigint) AS n_events
        |      FROM r GROUP BY user_id, version, event_type)
        |SELECT user_id, version, event_type, valid_from,
        |  lead(valid_from) OVER w2 AS valid_to,
        |  lead(valid_from) OVER w2 IS NULL AS is_current, n_events
        |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      scd2(events(s, dir), "user_id", "event_type", "ts", "event_id")
        .orderBy(col("user_id"), col("version"))
    },

    // First-order Markov transition matrix over per-user event streams:
    // lead(event_type) within each user's (ts, event_id) order, pair
    // counts, and an integer-exact transition probability in ppm
    // (n*1e6 div row_total — both engines use integer division, so no
    // float ratio ever crosses the gate). Scale shape: one shuffle on
    // user_id for the lead window, then an agg to |types|² rows; the
    // normalizing window runs on that tiny table.
    "q_event_transitions" -> Q(
      """WITH x AS (SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |p AS (SELECT event_type AS from_type, next_type AS to_type,
        |        count(*) AS n
        |      FROM x WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cast(n as bigint) AS n,
        |  cast((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
        |       as bigint) AS p_ppm
        |FROM p ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = events(s, dir)
        .select(col("event_type"), col("user_id"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("p_ppm", expr(
          "(n * CAST(1000000 AS BIGINT)) div sum(n) OVER (PARTITION BY from_type)"))
        .select(col("from_type"), col("to_type"), col("n"), col("p_ppm"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Stationary distribution of the first-order event-type Markov chain
    // (round 9) — where does a user's behavior settle long-run: 3 rounds
    // of integer power iteration on q_event_transitions' matrix, ranks
    // in parts-per-billion (the q_pagerank discipline applied to a
    // ROW-STOCHASTIC chain: per-term floor (r·n) // rowsum, no damping —
    // a type with outgoing but zero INCOMING transitions keeps its row
    // with stationary_ppb=0 on both engines: the oracle's final join on
    // m3 is a LEFT JOIN with coalesce(r,0), matching the engine's empty
    // sum). The oracle unrolls the same three rounds as chained CTEs. Scale shape:
    // the corpus collapses to the |types|² matrix in one user-windowed
    // pass (shared with q_event_transitions); every round is a
    // grid-sized join.
    "q_markov_stationary" -> Q(
      s"""WITH x AS (SELECT event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |                           ORDER BY ts, event_id) AS next_type
         |  FROM events),
         |p AS MATERIALIZED (
         |  SELECT from_type, to_type, n,
         |    sum(n) OVER (PARTITION BY from_type) AS rowsum
         |  FROM (SELECT event_type AS from_type, next_type AS to_type,
         |          cast(count(*) as bigint) AS n
         |        FROM x WHERE next_type IS NOT NULL GROUP BY 1, 2)),
         |ty AS (SELECT DISTINCT from_type AS t FROM p),
         |nt AS (SELECT cast(count(*) as bigint) AS n FROM ty),
         |m0 AS (SELECT t, 1000000000 // nt.n AS r FROM ty, nt),
         |${(1 to 3).map(k =>
            s"""m$k AS (SELECT p.to_type AS t,
               |  cast(sum((cast(pr.r as hugeint) * p.n) // p.rowsum)
               |    as bigint) AS r
               |FROM p JOIN m${k - 1} pr ON pr.t = p.from_type
               |GROUP BY p.to_type)""".stripMargin).mkString(",\n")}
         |SELECT ty.t AS event_type,
         |  cast(max(p.rowsum) as bigint) AS n_out,
         |  cast(coalesce(max(m3.r), 0) as bigint) AS stationary_ppb
         |FROM ty JOIN p ON p.from_type = ty.t LEFT JOIN m3 ON m3.t = ty.t
         |GROUP BY ty.t ORDER BY event_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // ONE corpus pass builds the |types|^2 matrix; the 3-round power
      // iteration then runs driver-side on that bounded state (the
      // q_bpe_merges bounded-driver-cost precedent — a DataFrame loop
      // here would re-derive the corpus window once per round, measured
      // 1.5 s vs 0.4 s at 10x). BigInt per term: r*n passes 2^63 on
      // petabyte transition counts.
      val mat = events(s, dir)
        .select(col("event_type"), col("user_id"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val types = mat.map(_._1).distinct.sorted
      val rowsum = types.map(t => t -> mat.collect {
        case (`t`, _, n) => n }.sum).toMap
      var r = types.map(_ -> 1000000000L / types.length).toMap
      for (_ <- 1 to 3)
        r = types.map(to => to -> mat.collect {
          case (from, `to`, n) =>
            (BigInt(r(from)) * n / rowsum(from)).toLong
        }.sum).toMap
      import s.implicits._
      types.map(t => (t, rowsum(t), r(t))).toSeq
        .toDF("event_type", "n_out", "stationary_ppb")
        .orderBy(col("event_type"))
    },

    // Weekly feature churn (round 9): of the users who did event type T
    // in week w, how many did NOT do T in week w+1 — the retention
    // complement next to q_stickiness's intensity ratio and q_cohort's
    // long-horizon grid, at the (type, week) grain where the numbers
    // are non-degenerate (all-activity churn on a dense product rounds
    // to zero; feature-level churn is the metric teams actually watch).
    // The last observed week's successor may be PARTIAL — its churn row
    // reads high, which is the honest truncation semantics (only weeks
    // with no successor at all are excluded). The corpus collapses to
    // distinct (type, user, week) first; churn is one self left-join on
    // the shifted week key (never a window over users); the final-week
    // exclusion rides the one legal BNLJ shape, crossJoin(broadcast(
    // 1-row max-week)). One floor-ppm division.
    "q_churn" -> Q(
      """WITH du AS (SELECT DISTINCT event_type,
        |    cast(date_trunc('week', cast(ts as date)) as date) AS wk, user_id
        |  FROM events),
        |mx AS (SELECT max(wk) AS mw FROM du),
        |nw AS (SELECT event_type, user_id, wk - 7 AS pw FROM du),
        |j AS (SELECT d.event_type, d.wk, d.user_id,
        |        CASE WHEN n.pw IS NULL THEN 1 ELSE 0 END AS churned
        |      FROM du d LEFT JOIN nw n
        |        ON n.user_id = d.user_id AND n.event_type = d.event_type
        |       AND n.pw = d.wk)
        |SELECT j.event_type, j.wk AS week,
        |  cast(count(*) as bigint) AS n_active,
        |  cast(sum(churned) as bigint) AS n_churned,
        |  cast((sum(churned) * 1000000) // count(*) as bigint) AS churn_ppm
        |FROM j, mx WHERE j.wk < mx.mw
        |GROUP BY j.event_type, j.wk ORDER BY event_type, week""".stripMargin) { (s, dir) =>
      val du = events(s, dir)
        .select(col("event_type"),
          to_date(date_trunc("week", col("ts"))).as("wk"), col("user_id"))
        .distinct()
      val mx = du.agg(max(col("wk")).as("mw"))
      val nw = du.select(col("event_type").as("nt"), col("user_id").as("nu"),
        date_sub(col("wk"), 7).as("pw"))
      du.join(nw, col("nu") === col("user_id") && col("nt") === col("event_type")
          && col("pw") === col("wk"), "left")
        .select(col("event_type"), col("wk"), col("user_id"),
          when(col("pw").isNull, 1L).otherwise(0L).as("churned"))
        .crossJoin(broadcast(mx))
        .filter(col("wk") < col("mw"))
        .groupBy(col("event_type"), col("wk").as("week"))
        .agg(count(lit(1)).as("n_active"), sum(col("churned")).as("n_churned"),
          expr("(sum(churned) * 1000000L) div count(*)").as("churn_ppm"))
        .orderBy(col("event_type"), col("week"))
    },

    // Row-pattern detection (round 9): the MATCH_RECOGNIZE shape —
    // find V patterns (a strict drop then a strict rebound across three
    // consecutive readings) in each user's value series, reduced to lag
    // algebra (neither engine ships MATCH_RECOGNIZE; a consecutive-row
    // pattern over a keyed order IS two lags and a conjunction, which
    // is also how a 100 TB plan wants it: one user-partitioned window,
    // no NFA state). Emits per user the pattern count and the deepest
    // drop/strongest rebound in cents. Bounded per-user windows; the
    // rollup is map-side combinable.
    "q_match_pattern" -> Q(
      """WITH x AS (
        |  SELECT user_id,
        |    lag(cast(floor(value * 100) as bigint), 2) OVER w AS a,
        |    lag(cast(floor(value * 100) as bigint), 1) OVER w AS b,
        |    cast(floor(value * 100) as bigint) AS c
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT user_id, a - b AS drop_c, c - b AS rebound_c
        |      FROM x WHERE a IS NOT NULL AND b < a AND c > b)
        |SELECT user_id,
        |  cast(count(*) as bigint) AS n_v,
        |  cast(max(drop_c) as bigint) AS max_drop_cents,
        |  cast(max(rebound_c) as bigint) AS max_rebound_cents
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cents = floor(col("value") * 100).cast(LongType)
      events(s, dir)
        .select(col("user_id"), lag(cents, 2).over(w).as("a"),
          lag(cents, 1).over(w).as("b"), cents.as("c"))
        .filter(col("a").isNotNull && col("b") < col("a") && col("c") > col("b"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_v"),
          max(col("a") - col("b")).as("max_drop_cents"),
          max(col("c") - col("b")).as("max_rebound_cents"))
        .orderBy(col("user_id"))
    },

    // Maximum drawdown per user (round 9): the classic risk scan — the
    // deepest drop from a running peak across the user's value series,
    // plus where the peak stood. One user-partitioned running-max window
    // then a map-side max agg; all integer cents. The financial shape
    // (peak-to-trough on an equity curve) applied to per-user metric
    // streams: a large drawdown flags a user whose engagement/value
    // collapsed mid-stream — q_cusum_shift's per-entity complement.
    "q_drawdown" -> Q(
      """WITH x AS (
        |  SELECT user_id,
        |    max(cast(floor(value * 100) as bigint))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS peak,
        |    cast(floor(value * 100) as bigint) AS c
        |  FROM events)
        |SELECT user_id,
        |  cast(max(peak) as bigint) AS max_peak_cents,
        |  cast(max(peak - c) as bigint) AS max_drawdown_cents,
        |  cast(max(((peak - c) * 1000000) // peak) as bigint)
        |    AS drawdown_ppm_of_peak
        |FROM x WHERE peak > 0 GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cents = floor(col("value") * 100).cast(LongType)
      events(s, dir)
        .select(col("user_id"), max(cents).over(w).as("peak"), cents.as("c"))
        .filter(col("peak") > 0L)
        .groupBy(col("user_id"))
        .agg(max(col("peak")).as("max_peak_cents"),
          max(col("peak") - col("c")).as("max_drawdown_cents"),
          max(expr("((peak - c) * 1000000L) div peak"))
            .as("drawdown_ppm_of_peak"))
        .orderBy(col("user_id"))
    },

    // Rolling 7-day distinct actives (the DAU/WAU reporting primitive):
    // exact rolling COUNT(DISTINCT) is not window-expressible, so both
    // engines expand each (user, day) to the 7 window-ends it supports
    // and hash-aggregate — input bounded at users × days × 7, far below
    // the raw event count, and the only real shuffle is that agg. The
    // day-spine clamp (windows ending after the last observed day are
    // dropped) rides the one legal BNLJ shape: crossJoin(broadcast(
    // 1-row max-date aggregate)).
    // Group-aware train/val/test split (the leakage-free split a training
    // pipeline needs): the split is a deterministic function of the GROUP
    // key (user_id — first md5 byte, 80/10/10 by bucket mod 10), so every
    // event of a user lands in exactly one split by construction — unlike
    // row-level sampling (q_sample_hash), no user's history can straddle
    // train and eval. The gated output is the per-split audit (user /
    // event / purchase counts + exact-decimal value mass) a pipeline
    // records before training. Scale shape: the split column is a narrow
    // per-row projection (no shuffle), the audit one map-side-combined
    // 3-group aggregate; distinct-user counts shuffle on (split, user)
    // pairs, bounded by the user dimension.
    "q_split_group" -> Q(
      s"""WITH b AS (SELECT user_id, event_type, value,
        |    (instr('0123456789abcdef', substr(md5(cast(user_id as varchar)), 1, 1)) - 1) * 16
        |  + (instr('0123456789abcdef', substr(md5(cast(user_id as varchar)), 2, 1)) - 1) AS bucket
        |  FROM events)
        |SELECT CASE WHEN bucket % 10 < 8 THEN 'train'
        |            WHEN bucket % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  cast(count(DISTINCT user_id) as bigint) AS n_users,
        |  cast(count(*) as bigint) AS n_events,
         |  cast(count(*) FILTER (event_type = 'purchase') as bigint) AS n_purchases,
         |  ${Exact.oIntScaled("sum(cast(value as decimal(18,6)))", 30, 6)} AS total_value
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("bucket",
          conv(substring(md5(col("user_id").cast(StringType).cast(BinaryType)), 1, 2),
            16, 10).cast(LongType))
        .withColumn("split",
          when(col("bucket") % 10 < 8, "train")
            .when(col("bucket") % 10 === 8, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
          Exact.intScaled(sum(col("value").cast(DecimalType(18, 6))), 30, 6)
            .as("total_value"))
        .orderBy(col("split"))
    },

    "q_dau_window" -> Q(
      """WITH du AS (SELECT DISTINCT cast(ts as date) AS d, user_id
        |            FROM events),
        |mx AS (SELECT max(cast(ts as date)) AS dmax FROM events),
        |w AS (SELECT d + cast(o as int) AS win_end, user_id
        |      FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS o))
        |SELECT win_end, cast(count(DISTINCT user_id) as bigint) AS active_7d
        |FROM w, mx WHERE win_end <= dmax
        |GROUP BY win_end ORDER BY win_end""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val du = e.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      val dmax = e.agg(max(to_date(col("ts"))).as("dmax"))
      du.withColumn("o", explode(sequence(lit(0), lit(6))))
        .withColumn("win_end", expr("date_add(d, o)"))
        .crossJoin(broadcast(dmax))
        .filter(col("win_end") <= col("dmax"))
        .groupBy(col("win_end"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy(col("win_end"))
    },

    // Conversion-latency distribution: per user, first signup -> first
    // purchase at or after it (the q_funnel step discipline), duration in
    // integer microseconds, then the ANSI discrete percentiles (always an
    // element of the input — exact bigints cross the gate). The oracle
    // states the smallest-value-whose-cume_dist-reaches-p definition
    // explicitly (the q_pctl_disc precedent; its global window is
    // oracle-side only). Spark side: two user-keyed agg+join passes and
    // one ordered-set aggregate over the users-sized duration table.
    "q_latency_dist" -> Q(
      """WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM events e JOIN s USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= s.t_signup
        |      GROUP BY e.user_id),
        |d AS (SELECT epoch_us(t_purchase) - epoch_us(t_signup) AS dur_us
        |      FROM s JOIN p USING (user_id)),
        |c AS (SELECT dur_us, cume_dist() OVER (ORDER BY dur_us) AS cd FROM d)
        |SELECT cast(count(*) as bigint) AS n_converted,
        |  cast(min(CASE WHEN cd >= 0.50 THEN dur_us END) as bigint) AS p50_us,
        |  cast(min(CASE WHEN cd >= 0.90 THEN dur_us END) as bigint) AS p90_us
        |FROM c ORDER BY n_converted""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val su = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
      val pu = e.filter(col("event_type") === "purchase")
        .join(su, "user_id").filter(col("ts") >= col("t_signup"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      su.join(pu, "user_id")
        .select((unix_micros(col("t_purchase"))
          - unix_micros(col("t_signup"))).as("dur_us"))
        .createOrReplaceTempView("graft_latency_dur")
      s.sql(
        """SELECT count(*) AS n_converted,
          |  cast(percentile_disc(0.50) WITHIN GROUP (ORDER BY dur_us)
          |       as bigint) AS p50_us,
          |  cast(percentile_disc(0.90) WITHIN GROUP (ORDER BY dur_us)
          |       as bigint) AS p90_us
          |FROM graft_latency_dur""".stripMargin)
    },

    // Cumulative-unique growth curve (the "total users to date" metric
    // every activation dashboard carries): first-seen day per user, new
    // users per day, running total. Exact distributed shape: the
    // first-seen agg shuffles on user_id once; the running sum's window
    // input is DAYS (timeline-bounded — 30 rows here, ~36k rows for a
    // century), never users or events, so the global window is safe at
    // any corpus size.
    "q_user_growth" -> Q(
      """WITH f AS (SELECT user_id, min(cast(ts as date)) AS first_day
        |           FROM events GROUP BY user_id),
        |d AS (SELECT first_day, count(*) AS n_new FROM f GROUP BY first_day)
        |SELECT first_day, cast(n_new as bigint) AS n_new,
        |  cast(sum(n_new) OVER (ORDER BY first_day ROWS UNBOUNDED PRECEDING)
        |       as bigint) AS cum_users
        |FROM d ORDER BY first_day""".stripMargin) { (s, dir) =>
      val d = events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("first_day"))
        .groupBy(col("first_day"))
        .agg(count(lit(1)).as("n_new"))
      // single-partition cumsum window is BENIGN (WindowExec warns):
      // input is the per-first_day agg — CALENDAR-sized, never event
      // rows (PlanAuditSpec bounded-window list)
      d.withColumn("cum_users",
        sum(col("n_new")).over(Window.orderBy(col("first_day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("first_day"))
    },

    // Activity streaks (round 7): per user, the longest run of
    // CONSECUTIVE active days plus streak count — the gaps-and-islands
    // kernel (day − row_number over distinct days is constant within a
    // run) applied to engagement analysis. All integers; windows
    // partition by user over that user's distinct DAYS (bounded by the
    // calendar, not the event volume — a user's million events collapse
    // to ≤ a few thousand day rows before any sort).
    "q_streaks" -> Q(
      """WITH days AS (SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', cast(ts as date)) AS day
        |  FROM events),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |st AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
        |SELECT user_id, cast(sum(len) as bigint) AS n_active_days,
        |  cast(max(len) as bigint) AS longest_streak,
        |  cast(count(*) as bigint) AS n_streaks
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val days = events(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast(LongType).as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days.withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy(col("user_id"))
    },

    // Lag-1 autocorrelation of the daily event-count series per event
    // type (round 7) — the day-over-day persistence signal behind
    // anomaly detection and seasonality checks. Daily counts are pure
    // integers, so every moment sum is integer-valued under 2^53 and
    // both engines close the SAME IEEE expression tree (the q_agg_corr /
    // q_linreg float-portability discipline); the result is ppm-floored.
    // The lagged pair comes from a (type, day = day+1) EQUI-join on the
    // day-aggregated series — calendar-sized input, never raw events,
    // and no window at all. Zero-variance groups are excluded by the
    // same exact-double predicate on both engines.
    "q_autocorr" -> Q(
      """WITH daily AS (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', cast(ts as date)) AS day,
        |    cast(count(*) as bigint) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type, b.c AS x, a.c AS y
        |      FROM daily a JOIN daily b
        |        ON a.event_type = b.event_type AND a.day = b.day + 1),
        |m AS (SELECT event_type, count(*) AS n,
        |        cast(count(*) as double) AS n_d,
        |        cast(sum(x) as double) AS sx, cast(sum(y) as double) AS sy,
        |        cast(sum(x*y) as double) AS sxy,
        |        cast(sum(x*x) as double) AS sxx,
        |        cast(sum(y*y) as double) AS syy
        |      FROM p GROUP BY event_type)
        |SELECT event_type, cast(n as bigint) AS n_pairs,
        |  cast(floor(((n_d*sxy - sx*sy)
        |    / (sqrt(n_d*sxx - sx*sx) * sqrt(n_d*syy - sy*sy))) * 1000000)
        |    as bigint) AS autocorr_ppm
        |FROM m
        |WHERE n_d*sxx - sx*sx > 0 AND n_d*syy - sy*sy > 0
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast(LongType).as("day"))
        .agg(count(lit(1)).as("c"))
      val cur = daily.select(col("event_type"), col("day"), col("c").as("y"))
      val prev = daily.select(col("event_type"),
        (col("day") + 1L).as("day"), col("c").as("x"))
      val m = cur.join(prev, Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(lit(1)).cast(DoubleType).as("n_d"),
          sum(col("x")).cast(DoubleType).as("sx"),
          sum(col("y")).cast(DoubleType).as("sy"),
          sum(col("x") * col("y")).cast(DoubleType).as("sxy"),
          sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
          sum(col("y") * col("y")).cast(DoubleType).as("syy"))
      val (nD, sx, sy, sxy, sxx, syy) = (col("n_d"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"))
      m.filter(nD * sxx - sx * sx > 0 && nD * syy - sy * sy > 0)
        .select(col("event_type"), col("n").as("n_pairs"),
          floor(((nD * sxy - sx * sy)
            / (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy))) * 1000000)
            .cast(LongType).as("autocorr_ppm"))
        .orderBy(col("event_type"))
    },

    // IQR-fence outlier audit (round 8 continuation): per event type,
    // the Tukey boxplot rule — count values beyond
    // [q1 − 1.5·IQR, q3 + 1.5·IQR] — the robust numeric-anomaly screen a
    // feature pipeline runs on heavy-tailed columns (q_mad_outliers'
    // quartile sibling; q_winsorize CLAMPS where this one COUNTS).
    // Values reach integers through ONE deterministic IEEE step
    // (floor(value·100): a single multiply + floor is bit-identical in
    // both engines); the 1.5 factor stays integral by doubling both
    // fence sides (2v < 2·q1 − 3·IQR), so every compared number is an
    // exact bigint. Scale shape: quartiles are one per-type ordered-set
    // AGGREGATE (hash agg — the oracle's cume_dist window only states
    // the ANSI definition); the count pass re-scans with the types-sized
    // bounds table broadcast into an equi-join and map-side-combines.
    "q_outlier_iqr" -> Q(
      """WITH v AS (SELECT event_type,
        |             cast(floor(value * 100) as bigint) AS cents
        |           FROM events WHERE value IS NOT NULL),
        |b AS MATERIALIZED (
        |  SELECT event_type,
        |    min(CASE WHEN cd >= 0.25 THEN cents END) AS q1,
        |    min(CASE WHEN cd >= 0.75 THEN cents END) AS q3
        |  FROM (SELECT event_type, cents,
        |          cume_dist() OVER (PARTITION BY event_type
        |                            ORDER BY cents) AS cd
        |        FROM v)
        |  GROUP BY event_type)
        |SELECT v.event_type, cast(count(*) as bigint) AS n,
        |  max(b.q1) AS q1_cents, max(b.q3) AS q3_cents,
        |  cast(count(CASE WHEN 2*v.cents < 2*b.q1 - 3*(b.q3 - b.q1)
        |             THEN 1 END) as bigint) AS n_low,
        |  cast(count(CASE WHEN 2*v.cents > 2*b.q3 + 3*(b.q3 - b.q1)
        |             THEN 1 END) as bigint) AS n_high
        |FROM v JOIN b ON v.event_type = b.event_type
        |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin) { (s, dir) =>
      // value IS NOT NULL on BOTH sides: Spark's percentile_disc
      // aggregate ignores NULLs while the oracle's cume_dist window
      // would count NULL rows in the partition denominator (NULLS
      // LAST), shifting q1/q3 — filter before either engine sees them.
      events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * 100).cast(LongType).as("cents"))
        .createOrReplaceTempView("graft_iqr_cents")
      s.sql(
        """WITH b AS (
          |  SELECT event_type,
          |    cast(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
          |         as bigint) AS q1,
          |    cast(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
          |         as bigint) AS q3
          |  FROM graft_iqr_cents GROUP BY event_type)
          |SELECT v.event_type, count(*) AS n,
          |  max(b.q1) AS q1_cents, max(b.q3) AS q3_cents,
          |  count(CASE WHEN 2*v.cents < 2*b.q1 - 3*(b.q3 - b.q1)
          |        THEN 1 END) AS n_low,
          |  count(CASE WHEN 2*v.cents > 2*b.q3 + 3*(b.q3 - b.q1)
          |        THEN 1 END) AS n_high
          |FROM graft_iqr_cents v JOIN b ON v.event_type = b.event_type
          |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin)
    },

    // Rolling 7-day MEDIAN of daily volume (round 8 continuation): the
    // robust trend line an ops dashboard lays over a spiky daily count —
    // the median, unlike the rolling mean, shrugs off one anomalous day.
    // An exact rolling median is not window-expressible cross-engine, so
    // both engines build the dense zero-filled per-type day grid (the
    // spine is generate_series over [min_day, max_day] — every full
    // window holds exactly 7 integer cells) and expand each cell to the
    // ≤7 window-ends it supports (the q_dau_window day-expansion
    // discipline); the median of 7 bigints is the ANSI discrete
    // 0.5-percentile — always an element of the input. Scale shape: the
    // only corpus-scale work is the daily-count agg (map-side
    // combinable); everything after runs on types × days × 7 rows,
    // bounded by the CALENDAR, never the event volume. The day-bounds
    // and types tables ride the legal crossJoin(broadcast(tiny)) shape.
    "q_rolling_median" -> Q(
      """WITH daily AS MATERIALIZED (
        |  SELECT event_type,
        |    datediff('day', DATE '1970-01-01', cast(ts as date)) AS day,
        |    cast(count(*) as bigint) AS c
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT unnest(generate_series(lo, hi)) AS day FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM daily),
        |grid AS (SELECT t.event_type, s.day, coalesce(d.c, 0) AS c
        |         FROM types t CROSS JOIN spine s
        |         LEFT JOIN daily d ON d.event_type = t.event_type
        |                          AND d.day = s.day),
        |contrib AS (SELECT g.event_type, g.day + o.off AS wend, g.c
        |            FROM grid g CROSS JOIN
        |              (SELECT unnest(generate_series(0, 6)) AS off) o),
        |win AS (SELECT c.event_type, c.wend, c.c
        |        FROM contrib c, bounds b
        |        WHERE c.wend BETWEEN b.lo + 6 AND b.hi),
        |cd AS (SELECT event_type, wend, c,
        |         cume_dist() OVER (PARTITION BY event_type, wend
        |                           ORDER BY c) AS cd
        |       FROM win)
        |SELECT event_type,
        |  DATE '1970-01-01' + cast(wend as int) AS day,
        |  cast(sum(c) as bigint) AS n_7d,
        |  cast(min(CASE WHEN cd >= 0.5 THEN c END) as bigint) AS med_7d
        |FROM cd GROUP BY event_type, wend
        |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .cast(LongType).as("day"))
        .agg(count(lit(1)).as("c"))
      val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val types = daily.select(col("event_type")).distinct()
      spine.crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("c"), lit(0L)).as("c"))
        .withColumn("wend", explode(sequence(col("day"), col("day") + 6)))
        .crossJoin(broadcast(bounds))
        .filter(col("wend").between(col("lo") + 6, col("hi")))
        .createOrReplaceTempView("graft_roll7")
      s.sql(
        """SELECT event_type,
          |  date_add(DATE '1970-01-01', cast(wend as int)) AS day,
          |  sum(c) AS n_7d,
          |  cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
          |       as bigint) AS med_7d
          |FROM graft_roll7 GROUP BY event_type, wend
          |ORDER BY event_type, day""".stripMargin)
    },

    // Weekly-seasonality profile (round 8 continuation): per event type,
    // the ISO-day-of-week volume distribution with an integer-ppm share
    // — the periodicity fingerprint an anomaly detector baselines
    // against (q_rolling_median smooths the trend; this isolates the
    // cycle). Spark's weekday() (0 = Monday) + 1 aligns exactly with
    // DuckDB's isodow (1 = Monday). Scale shape: one map-side-combined
    // agg to ≤ types × 7 rows; the normalizing window runs on that tiny
    // table (the q_event_transitions discipline).
    "q_seasonality" -> Q(
      """WITH d AS (
        |  SELECT event_type,
        |    cast(date_part('isodow', cast(ts as date)) as bigint) AS isodow,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, isodow, n,
        |  cast((n * 1000000) // sum(n) OVER (PARTITION BY event_type)
        |       as bigint) AS share_ppm
        |FROM d ORDER BY event_type, isodow""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"),
          (weekday(col("ts")) + 1).cast(LongType).as("isodow"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_ppm", expr(
          "cast((n * cast(1000000 as bigint))" +
            " div sum(n) OVER (PARTITION BY event_type) as bigint)"))
        .orderBy(col("event_type"), col("isodow"))
    },

    // Calendar heatmap (round 9): the weekday × hour activity grid with
    // distinct-user reach and each hour's share of its weekday — the 2D
    // traffic fingerprint behind capacity planning and anomaly
    // baselining (q_seasonality isolates the weekly cycle; this crosses
    // it with the daily one). Same weekday()+1 ≡ isodow alignment.
    // Scale shape: one map-side-combined agg to ≤ 7×24 cells (the
    // distinct-user count shuffles (cell, user) pairs once); the
    // normalizing window partitions by weekday over ≤ 24 rows.
    // k-anonymity audit (round 10): before events leave the lake as a
    // training/analytics extract, how identifying is the
    // quasi-identifier tuple (event_type, weekday, hour) — the weekly
    // behavioral pattern a linker would join on? Rows in an equivalence
    // class smaller than k = 5 are linkable — the governance readout
    // next to q_pii_redact's content scrub (that op cleans the text;
    // this one prices the metadata). Per type: classes, rows, at-risk
    // rows (class size < 5), and the at-risk share in floor-ppm — all
    // exact integers. Scale shape: the corpus collapses to the QI grid
    // (types × 7 × 24) in one map-side-combinable agg; everything after
    // is grid-sized.
    "q_k_anonymity" -> Q(
      """WITH q AS (
        |  SELECT event_type,
        |    cast(date_part('isodow', cast(ts as date)) as bigint) AS isodow,
        |    cast(hour(ts) as bigint) AS hr,
        |    cast(count(*) as bigint) AS c
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type,
        |  cast(count(*) as bigint) AS n_classes,
        |  cast(sum(c) as bigint) AS n_rows,
        |  cast(count(CASE WHEN c < 5 THEN 1 END) as bigint)
        |    AS n_small_classes,
        |  cast(sum(CASE WHEN c < 5 THEN c ELSE 0 END) as bigint)
        |    AS n_rows_at_risk,
        |  cast((cast(sum(CASE WHEN c < 5 THEN c ELSE 0 END) as hugeint)
        |        * 1000000) // sum(c) as bigint) AS risk_ppm
        |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"),
          (weekday(col("ts")) + 1).cast(LongType).as("isodow"),
          hour(col("ts")).cast(LongType).as("hr"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_classes"), sum(col("c")).as("n_rows"),
          count(when(col("c") < 5, 1)).as("n_small_classes"),
          sum(when(col("c") < 5, col("c")).otherwise(0L)).as("n_rows_at_risk"))
        .select(col("event_type"), col("n_classes"), col("n_rows"),
          col("n_small_classes"), col("n_rows_at_risk"),
          expr("cast((cast(n_rows_at_risk as decimal(38,0)) * 1000000)" +
            " div n_rows as bigint)").as("risk_ppm"))
        .orderBy(col("event_type"))
    },

    "q_calendar_heatmap" -> Q(
      """WITH d AS (
        |  SELECT cast(date_part('isodow', cast(ts as date)) as bigint) AS isodow,
        |    cast(hour(ts) as bigint) AS hr,
        |    cast(count(*) as bigint) AS n,
        |    cast(count(DISTINCT user_id) as bigint) AS n_users
        |  FROM events GROUP BY 1, 2)
        |SELECT isodow, hr, n, n_users,
        |  cast((n * 1000000) // sum(n) OVER (PARTITION BY isodow)
        |       as bigint) AS day_share_ppm
        |FROM d ORDER BY isodow, hr""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy((weekday(col("ts")) + 1).cast(LongType).as("isodow"),
          hour(col("ts")).cast(LongType).as("hr"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .withColumn("day_share_ppm", expr(
          "cast((n * cast(1000000 as bigint))" +
            " div sum(n) OVER (PARTITION BY isodow) as bigint)"))
        .orderBy(col("isodow"), col("hr"))
    },

    // Calendar-aware anomaly screen (round 9): each (day, hour) cell's
    // volume vs the baseline of the SAME weekday-hour on every OTHER
    // day — the seasonality-adjusted spike detector (a Monday-9am surge
    // is only anomalous relative to other Monday 9ams; q_anomaly_alerts
    // is the per-user value monitor, this is the traffic-shape one).
    // Spike test is the integer cross-multiplication n·k_others >
    // 2·base_n (no mean division, the q_anomaly_alerts discipline);
    // cells with no baseline (k_others = 0) are unjudgeable and emit
    // false. Scale shape: corpus collapses to the (day, hour) grid in
    // one map-side agg; the baseline is a (dow, hr)-keyed agg over that
    // calendar-bounded grid joined back on the same key.
    "q_calendar_anomaly" -> Q(
      """WITH c AS (
        |  SELECT cast(ts as date) AS day,
        |    cast(date_part('isodow', cast(ts as date)) as bigint) AS isodow,
        |    cast(hour(ts) as bigint) AS hr,
        |    cast(count(*) as bigint) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |b AS (SELECT isodow, hr, cast(sum(n) as bigint) AS tot,
        |        cast(count(*) as bigint) AS k
        |      FROM c GROUP BY 1, 2)
        |SELECT c.day, c.hr, c.n,
        |  cast(b.tot - c.n as bigint) AS base_n,
        |  cast(b.k - 1 as bigint) AS k_others,
        |  (b.k > 1 AND c.n * (b.k - 1) > 2 * (b.tot - c.n)) AS spike
        |FROM c JOIN b USING (isodow, hr)
        |ORDER BY day, hr""".stripMargin) { (s, dir) =>
      val c = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"),
          (weekday(col("ts")) + 1).cast(LongType).as("isodow"),
          hour(col("ts")).cast(LongType).as("hr"))
        .agg(count(lit(1)).as("n"))
      val b = c.groupBy(col("isodow"), col("hr"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("k"))
      c.join(b, Seq("isodow", "hr"))
        .select(col("day"), col("hr"), col("n"),
          (col("tot") - col("n")).as("base_n"),
          (col("k") - 1L).as("k_others"),
          (col("k") > 1L &&
            col("n") * (col("k") - 1L) > lit(2L) * (col("tot") - col("n")))
            .as("spike"))
        .orderBy(col("day"), col("hr"))
    },

    // Feature engineering for tabular ML (round 9): per event, the
    // PAST-ONLY per-user feature row a training pipeline materializes —
    // lag-1/lag-2 values and the previous-3 rolling sum/count, all in
    // integer cents, all from frames ending at 1 PRECEDING so no
    // feature can leak the current row (q_label_horizon is the matching
    // future-only label; together they are the leakage-safe
    // feature/label split). First events keep NULL lags and n=0 windows
    // — real "cold start" rows, identical in both engines. Scale shape:
    // one user-partitioned window with a constant frame — per-user
    // state is O(frame), embarrassingly parallel across users.
    "q_feature_lags" -> Q(
      """SELECT event_id, user_id, cents,
        |  lag(cents, 1) OVER w AS lag1_cents,
        |  lag(cents, 2) OVER w AS lag2_cents,
        |  cast(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) as bigint) AS prev3_sum,
        |  cast(count(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) as bigint) AS prev3_n
        |FROM (SELECT event_id, user_id, ts,
        |        cast(floor(value * 100) as bigint) AS cents FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wPrev3 = w.rowsBetween(-3, -1)
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 100).cast(LongType).as("cents"))
        .select(col("event_id"), col("user_id"), col("cents"),
          lag(col("cents"), 1).over(w).as("lag1_cents"),
          lag(col("cents"), 2).over(w).as("lag2_cents"),
          sum(col("cents")).over(wPrev3).as("prev3_sum"),
          count(col("cents")).over(wPrev3).as("prev3_n"))
        .orderBy(col("event_id"))
    },

    // Label generation for tabular ML (round 9): per VIEW event, did
    // the same user purchase within the next hour — the FUTURE-ONLY
    // label column next to q_feature_lags' past-only features
    // (strictly-after is defined by the (ts, event_id) row order, so
    // the label can never see its own row; horizon = labelHorizonUs).
    // Computed as a conditional running min over the FOLLOWING frame —
    // one user-partitioned window, no per-event self-join, no
    // event×purchase blowup. tt_us is NULL exactly when the label is
    // false (no purchase inside the horizon).
    "q_label_horizon" -> Q(
      s"""WITH x AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
         |      AS next_p_us
         |  FROM events)
         |SELECT event_id, user_id,
         |  (next_p_us IS NOT NULL AND next_p_us - us <= $labelHorizonUs)
         |    AS label,
         |  CASE WHEN next_p_us - us <= $labelHorizonUs
         |       THEN cast(next_p_us - us as bigint) END AS tt_us
         |FROM x WHERE event_type = 'view'
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
            .over(Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))
              .rowsBetween(1, Window.unboundedFollowing)).as("next_p_us"))
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"),
          (col("next_p_us").isNotNull &&
            col("next_p_us") - col("us") <= labelHorizonUs).as("label"),
          when(col("next_p_us") - col("us") <= labelHorizonUs,
            col("next_p_us") - col("us")).as("tt_us"))
        .orderBy(col("event_id"))
    },

    // Deterministic negative sampling (round 10; catalog-scale-safe form
    // round 11): per user, the 2 ITEMS (the props.k catalog, NULLs
    // excluded — an event missing props.k is not a catalog item, and a
    // NULL md5 key would sort FIRST in Spark but LAST in DuckDB) they
    // have NEVER interacted with, ranked by an md5-derived pseudo-random
    // key — the (user, negative) pairs a recommender/contrastive
    // training feed draws beside the positive interactions. No RNG: both
    // engines rank md5(user ‖ ':' ‖ item) hex with an item tiebreak, so
    // the draw is reproducible and hash-gated. Scale shape (the round-11
    // rework — no crossJoin, nothing user×catalog is ever SHUFFLED):
    // the catalog is hash-bucketed (~2k items per bucket, bucket count
    // derived from |catalog|; the draw is provably bucket-invariant, so
    // the bucketing never touches the output), users expand to
    // (user, bucket) probes that pick up their per-bucket SEEN set as a
    // collect_set array in one equi-join, candidates stream map-side out
    // of the broadcast bucket join with an array_contains prune (the
    // anti-join became a map-side filter), and ranking is a per-(user,
    // bucket) top-2 (WindowGroupLimit partial — per-bucket top-2 of
    // UNSEEN items provably contains the global top-2) closed by a
    // per-user top-2 over ≤ 2·buckets pre-limited rows. The |U|·|I| md5
    // evaluations are inherent to the exact draw and stay inside one
    // codegen'd map stage; at enormous catalogs drop the broadcast hint
    // and let the bucket join shuffle (bucket count scales with the
    // catalog, so there is no 16-key skew cliff). Measured: 38.8 s at
    // 30× (3k items × 45k users), 148 s at 100× (10k × 150k = 1.5G
    // md5 evals — ~11× candidates for ~4× time). Past that, the cost
    // ceiling is the |U|·|I| term itself, which no plan shape removes:
    // a true web-scale recommender changes the OPERATOR CONTRACT to a
    // per-user hash-sampled candidate subset (rank md5 within
    // user-keyed buckets only — same determinism, candidates |U|·k),
    // trading the exact global top-2 for a stated sample.
    "q_negative_sampling" -> Q(
      """WITH ev AS MATERIALIZED (
        |  SELECT user_id,
        |    cast(json_extract_string(props, '$.k') as bigint) AS item
        |  FROM events
        |  WHERE cast(json_extract_string(props, '$.k') as bigint) IS NOT NULL),
        |it AS MATERIALIZED (SELECT DISTINCT item FROM ev),
        |u AS MATERIALIZED (SELECT DISTINCT user_id FROM ev),
        |seen AS MATERIALIZED (SELECT DISTINCT user_id, item FROM ev),
        |cand AS (
        |  SELECT u.user_id, it.item FROM u CROSS JOIN it
        |  WHERE NOT EXISTS (SELECT 1 FROM seen s
        |    WHERE s.user_id = u.user_id AND s.item = it.item)),
        |r AS (SELECT user_id, item,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY md5(cast(user_id as varchar) || ':'
        |                       || cast(item as varchar)), item) AS rk
        |      FROM cand)
        |SELECT user_id, item AS neg_item, cast(rk as bigint) AS rk
        |FROM r WHERE rk <= 2 ORDER BY user_id, rk""".stripMargin) { (s, dir) =>
      negativeSampling(events(s, dir)
        .select(col("user_id"), propsItem.as("item"))
        .filter(col("item").isNotNull))
    },

    // Sampled-contract negative sampling (round 12, VERDICT-r11 #1 — the
    // web-scale variant of q_negative_sampling): per user, the top-2
    // md5-ranked unseen items drawn from a deterministic per-user
    // HASH-SAMPLED candidate subset — the catalog divides into
    // greatest(1, |I| div 64) md5-derived buckets and user u draws only
    // from bucket md5('u:' ‖ u) mod B. The exact form's |U|·|I| md5
    // evaluations (its 100× cost ceiling: 148-214 s at 10k items × 150k
    // users, growing as the product) become |U|·~64: the candidate set
    // per user is bucket-sized regardless of catalog growth, because the
    // bucket COUNT scales with the catalog while the bucket SIZE stays
    // pinned. The trade is stated, not hidden: the draw is a sample of
    // the complement (a user whose sampled bucket is fully seen gets
    // fewer than 2 negatives), which is exactly what production
    // recommenders do — uniform negatives from a hashed shard, never a
    // catalog sweep. Both the bucket hash (first 4 md5 nibbles — the
    // dsirBucketCol idiom) and the ranking key are engine-portable, and
    // B derives IN THE SQL from the catalog (the derived-constant rule),
    // so the whole draw is hash-gated. StatsSpec pins subset determinism,
    // agreement with the exact form whenever the sample covers the
    // catalog (B = 1), and a forced multi-bucket draw against a
    // driver-side reference. Scale shape: one bounded catalog count, one
    // bucket equi-join (broadcast here — catalog-sized; at enormous
    // catalogs drop the hint and it shuffles on the B-valued key, no
    // skew cliff since buckets are ~equal), one corpus-linear left-anti
    // on (user, item), and a per-user top-2 over ~64 rows
    // (WindowGroupLimit partial).
    "q_negative_sampling_user" -> Q(
      s"""WITH ev AS MATERIALIZED (
        |  SELECT user_id,
        |    cast(json_extract_string(props, '$$.k') as bigint) AS item
        |  FROM events
        |  WHERE cast(json_extract_string(props, '$$.k') as bigint) IS NOT NULL),
        |it AS MATERIALIZED (SELECT DISTINCT item FROM ev),
        |u AS MATERIALIZED (SELECT DISTINCT user_id FROM ev),
        |seen AS MATERIALIZED (SELECT DISTINCT user_id, item FROM ev),
        |nb AS (SELECT greatest(1, count(*) // $negSamplingUserBucketItems) AS b
        |       FROM it),
        |ib AS (SELECT item,
        |         ${oMd5Hex4("cast(item as varchar)")} % (SELECT b FROM nb) AS sb
        |       FROM it),
        |ub AS (SELECT user_id,
        |         ${oMd5Hex4("'u:' || cast(user_id as varchar)")} % (SELECT b FROM nb) AS sb
        |       FROM u),
        |cand AS (
        |  SELECT ub.user_id, ib.item FROM ub JOIN ib USING (sb)
        |  WHERE NOT EXISTS (SELECT 1 FROM seen s
        |    WHERE s.user_id = ub.user_id AND s.item = ib.item)),
        |r AS (SELECT user_id, item,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY md5(cast(user_id as varchar) || ':'
        |                       || cast(item as varchar)), item) AS rk
        |      FROM cand)
        |SELECT user_id, item AS neg_item, cast(rk as bigint) AS rk
        |FROM r WHERE rk <= 2 ORDER BY user_id, rk""".stripMargin) { (s, dir) =>
      negativeSamplingUser(events(s, dir))
    },

    // Top entry paths (round 8 continuation): the first-3-events journey
    // per user, counted and ranked — the "how do users actually start"
    // path-analysis readout next to q_funnel's fixed three-step
    // hypothesis. The path string is assembled from per-rank conditional
    // mins (order-insensitive aggregation — no collect_list ordering
    // hazard); concat_ws skips NULLs identically in both engines, so
    // 1- and 2-event users keep their short paths. Scale shape: one
    // user_id-partitioned rank window (rk ≤ 3 triggers the
    // WindowGroupLimit partial top-k), one user agg, one path agg; the
    // ranking window runs on the path-vocabulary table (≤ |types|³
    // rows at any corpus size).
    "q_funnel_paths" -> Q(
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rk
        |  FROM events),
        |p AS (SELECT user_id,
        |        concat_ws('>',
        |          min(CASE WHEN rk = 1 THEN event_type END),
        |          min(CASE WHEN rk = 2 THEN event_type END),
        |          min(CASE WHEN rk = 3 THEN event_type END)) AS path
        |      FROM r WHERE rk <= 3 GROUP BY user_id),
        |c AS (SELECT path, cast(count(*) as bigint) AS n_users
        |      FROM p GROUP BY path)
        |SELECT path, n_users, rk FROM (
        |  SELECT path, n_users,
        |    cast(row_number() OVER (ORDER BY n_users DESC, path) as int) AS rk
        |  FROM c)
        |WHERE rk <= 10 ORDER BY rk""".stripMargin) { (s, dir) =>
      val r = events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .filter(col("rk") <= 3)
      val p = r.groupBy(col("user_id")).agg(concat_ws(">",
        min(when(col("rk") === 1, col("event_type"))),
        min(when(col("rk") === 2, col("event_type"))),
        min(when(col("rk") === 3, col("event_type")))).as("path"))
      p.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        // single-partition rank window is BENIGN (WindowExec warns):
        // input is the path-vocabulary agg — ≤ |event_type|³ rows, never
        // user/event rows (PlanAuditSpec bounded-window list)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_users").desc, col("path"))).cast(IntegerType))
        .filter(col("rk") <= 10)
        .orderBy(col("rk"))
    },

    // Wilson confidence interval for conversion rates (round 8
    // continuation): the experiment readout q_abtest_lift's point
    // estimates were missing — per md5 arm, the 95% Wilson score bounds,
    // the interval that stays sane at small n and extreme rates where
    // the normal approximation lies. The bounds are doubles, and they
    // hash-gate because BOTH engines evaluate the ONE shared expression
    // string (interpolated verbatim into the plan and the oracle —
    // q_linreg's fixed-IEEE-tree discipline) on integer-exact (k, n):
    // +,*,/ and sqrt are correctly-rounded IEEE ops, every literal is
    // cast(... as double) so DuckDB cannot lift 1.96 into decimal
    // arithmetic, and neither optimizer reassociates floats. Scale
    // shape: one user-keyed agg + a 2-row rollup.
    "q_rate_ci" -> Q(
      s"""WITH u AS (
         |  SELECT user_id,
         |    (instr('0123456789abcdef',
         |           substr(md5(cast(user_id as varchar)), 1, 1)) - 1) % 2 AS arm,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY user_id),
         |a AS (SELECT arm, cast(count(*) as bigint) AS n,
         |        cast(sum(conv) as bigint) AS k
         |      FROM u GROUP BY arm)
         |SELECT cast(arm as int) AS arm, n AS n_users, k AS n_conv,
         |  CASE WHEN n = 0 THEN NULL
         |       ELSE cast((cast(1000000 as hugeint) * k) // n as bigint)
         |       END AS cvr_ppm,
         |  ${wilsonExpr("k", "n", "-")} AS wilson_lo,
         |  ${wilsonExpr("k", "n", "+")} AS wilson_hi
         |FROM a ORDER BY arm""".stripMargin) { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
        .withColumn("arm",
          conv(substring(md5(col("user_id").cast(StringType).cast(BinaryType)),
            1, 1), 16, 10).cast(LongType) % 2)
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
        .select(col("arm").cast(IntegerType).as("arm"),
          col("n").as("n_users"), col("k").as("n_conv"),
          expr("CASE WHEN n = 0 THEN NULL ELSE cast(" +
            "(cast(1000000 as decimal(38,0)) * k) div n as bigint) END")
            .as("cvr_ppm"),
          expr(wilsonExpr("k", "n", "-")).as("wilson_lo"),
          expr(wilsonExpr("k", "n", "+")).as("wilson_hi"))
        .orderBy(col("arm"))
    }
  )

  /** The 95% Wilson score bound as ONE SQL expression string shared
    * verbatim by the Spark plan and the DuckDB oracle (sign "-" = lower,
    * "+" = upper). Everything is double from the first cast — identical
    * IEEE trees on integer-exact (k, n) make the bounds bit-equal
    * cross-engine (the q_linreg discipline).
    */
  private def wilsonExpr(k: String, n: String, sign: String): String = {
    val z = "cast(1.96 as double)"
    val p = s"(cast($k as double) / cast($n as double))"
    val nd = s"cast($n as double)"
    s"(($p + $z*$z/(2*$nd) $sign " +
      s"$z*sqrt(($p*(1 - $p) + $z*$z/(4*$nd))/$nd)) / (1 + $z*$z/$nd))"
  }

  /** q_interval_merge core over any (key, start, end) frame: running max
    * of interval ends (excluding the current row) vs the current start —
    * a new island begins when the start clears every previous end. Adds
    * `island_id` (1-based per key). Same single-sort discipline as
    * [[sessionize]]: both windows share one partitioning + total order.
    */
  def mergeIntervals(df: DataFrame, key: String, start: String, end: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(start), col(end), col(tieBreak))
    val pmax = max(col(end)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val brk = when(pmax.isNull.or(col(start) > pmax), 1L).otherwise(0L)
    df.withColumn("island_id",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q_scd2 core: run-length collapse of `attr` per `key` in (ts,
    * tieBreak) order → (key, version, attr, valid_from, valid_to,
    * is_current, n_events). valid_to is the next version's valid_from
    * (half-open ranges); NULL marks the current row.
    */
  def scd2(df: DataFrame, key: String, attr: String, ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val prev = lag(col(attr), 1).over(w)
    val chg = when(prev.isNull.or(prev =!= col(attr)), 1L).otherwise(0L)
    val runs = df.withColumn("version",
      sum(chg).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val v = runs.groupBy(col(key), col("version"), col(attr))
      .agg(min(col(ts)).as("valid_from"), count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col(key)).orderBy(col("version"))
    v.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col("version"), col(attr), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events"))
  }
}
