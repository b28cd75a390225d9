package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The stateful streaming surface under the RocksDB state store
  * (round 7): the HDFS-backed default keeps every key's state ON-HEAP in
  * the executor, which is the one part of the streaming surface that
  * would not survive 100 TB of state keys — RocksDB spills state to
  * local SSTs and is the provider a production deployment of these
  * operators would run. Same operators, same inputs, same expected
  * outputs as the default-provider StreamingSpec tests; what's new is
  * the provider matrix leg plus proof (via the query's state-operator
  * metrics) that RocksDB is actually the store in use, not silently the
  * default.
  *
  * Isolation: the provider is set on a CHILD session
  * (`spark.newSession()`), so concurrently-running default-provider
  * suites (and their checkpoints) never see a mid-run provider flip.
  */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val rocks = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def assertRocksDbActive(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ops = q.lastProgress.stateOperators
    assert(ops.nonEmpty, "query must have a stateful operator")
    val keys = ops.flatMap(_.customMetrics.keySet.toArray.map(_.toString))
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"state metrics show no rocksdb counters — provider not active? got: ${keys.mkString(",")}")
  }

  test("s_dedup_stream: dropDuplicates state round-trips through RocksDB") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val mem = MemoryStream[Ev]
    val q = Streams.streamingDedup(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_dedup").start()
    try {
      mem.addData(Ev(1, ts(1), 1, "view", 1.0), Ev(1, ts(1), 1, "view", 1.0),
        Ev(2, ts(2), 1, "view", 1.0))
      q.processAllAvailable()
      // the duplicate arrives from a LATER batch: suppression proves the
      // state survived a RocksDB commit/load cycle, not just in-batch dedup
      mem.addData(Ev(2, ts(3), 2, "view", 9.0), Ev(3, ts(4), 2, "view", 1.0))
      q.processAllAvailable()
      val ids = rocks.table("r_dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
      assertRocksDbActive(q)
    } finally q.stop()
  }

  test("s_sessionize: custom flatMapGroupsWithState state + timeout under RocksDB matches batch") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val evs = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .select($"user_id", $"ts", $"event_id").as[SessEvent]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val maxMs = evs.map(_.ts.getTime).max
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[SessEvent]
    val q = Streams.streamingSessionize(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_sessionize").start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      val day = 24L * 3600 * 1000
      mem.addData(SessEvent(-1L, new Timestamp(maxMs + 2 * day), 0L))
      q.processAllAvailable()
      mem.addData(SessEvent(-1L, new Timestamp(maxMs + 4 * day), 1L))
      q.processAllAvailable()
      assertRocksDbActive(q)
      val got = rocks.table("r_sessionize")
        .filter($"user_id" >= 0L)
        .select($"user_id", $"session_id", $"n_events",
          $"session_start", $"session_end", $"dur_us")
        .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().toSet
      val want = graft.operators.EventAnalytics.queries("q_sessionize")
        .fn(rocks, TestSpark.sfDir)
        .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(got == want,
        s"rocksdb sessions diverge from batch: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("s_funnel: accumulated funnel state under RocksDB matches batch") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val evs = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .select($"user_id", $"event_type", $"ts").as[FunnelEvent]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos))
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[FunnelEvent]
    val q = Streams.streamingFunnel(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_funnel").start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      assertRocksDbActive(q)
      val got = rocks.table("r_funnel")
        .as[FunnelState].collect()
        .groupBy(_.user_id).map { case (_, rows) => rows.maxBy(_.stage) }
        .map(f => (f.user_id, f.t_view, f.t_click, f.t_purchase, f.stage))
        .toSet
      val want = graft.operators.EventAnalytics.queries("q_funnel")
        .fn(rocks, TestSpark.sfDir)
        .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Int)]
        .collect()
        .map(r => (r._1, r._2, r._3, r._4, r._5))
        .toSet
      assert(got == want,
        s"rocksdb funnel diverges: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("s_transitions: last-event state under RocksDB matches batch pair counts") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val evs = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id").as[TypedEvent]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[TypedEvent]
    val q = Streams.streamingTransitions(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_transitions").start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b.toSeq: _*); q.processAllAvailable() }
      assertRocksDbActive(q)
      val got = rocks.table("r_transitions")
        .groupBy($"from_type", $"to_type").count()
        .as[(String, String, Long)].collect().toSet
      val want = graft.operators.EventAnalytics.queries("q_event_transitions")
        .fn(rocks, TestSpark.sfDir)
        .select($"from_type", $"to_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(got == want,
        s"rocksdb transitions diverge: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("s_streaks: day-interval merge state under RocksDB matches batch q_streaks (round 7)") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val days = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .select($"user_id",
        datediff(to_date($"ts"), to_date(lit("1970-01-01")))
          .cast("long").as("day"))
      .distinct().as[DayActive].collect()
    val shuffled = new scala.util.Random(11).shuffle(days.toSeq)
    val (b1, b2) = shuffled.splitAt(shuffled.length / 2)
    val mem = MemoryStream[DayActive]
    val q = Streams.streamingStreaks(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("r_streaks").start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      assertRocksDbActive(q)
      val got = rocks.table("r_streaks").as[StreakRow].collect()
        .groupBy(_.user_id)
        .map { case (_, rows) => rows.maxBy(_.n_active_days) }
        .map(r => (r.user_id, r.n_active_days, r.longest_streak, r.n_streaks))
        .toSet
      val want = graft.operators.EventAnalytics.queries("q_streaks")
        .fn(rocks, TestSpark.sfDir)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == want,
        s"rocksdb streaks diverge: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("checkpoint restart under RocksDB: sig-dedup state reloads from SSTs") {
    val base = "/tmp/graft_test_stage/rocksdb_restart"
    graft.util.Fs.deleteRecursively(base)
    val srcDir = s"$base/src"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema
    def start() = Streams.streamingSigDedup(
        rocks.readStream.schema(schema).parquet(srcDir))
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt).option("path", outDir).start()
    Seq((1L, "the quick brown fox jumps"), (2L, "a totally different doc here"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val q1 = start(); try { q1.processAllAvailable(); assertRocksDbActive(q1) } finally q1.stop()
    // the duplicate arrives after a full stop/start: suppression proves
    // the signature state came back from the RocksDB checkpoint
    Seq((3L, "the quick brown fox jumps"), (4L, "yet another unseen document body"))
      .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
    val q2 = start(); try q2.processAllAvailable() finally q2.stop()
    val ids = rocks.read.parquet(outDir).select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 4L),
      "restarted query must still suppress the pre-restart signature")
  }

  test("s_dedup_incremental: sig-dedup -> band-probe ingest pipeline under RocksDB (round 9)") {
    // the full ingest-time dedup story in one pipeline: exact new-vs-new
    // tier (streamingSigDedup — THE stateful operator, its signature
    // state in RocksDB) feeding the stateless new-vs-corpus band probe.
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val docs = graft.Engine.table(rocks, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val idx = graft.llm.Dedup.bandIndex(corpus)
    val probe = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 400)
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = Streams.streamingBandDedup(
        Streams.streamingSigDedup(mem.toDF().toDF("doc_id", "text")), idx)
      .writeStream.outputMode("append")
      .format("memory").queryName("r_banddedup").start()
    try {
      val (b1, b2) = probe.splitAt(probe.length / 2)
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      // re-send batch 1's texts under shifted ids from a LATER batch:
      // the sig-dedup tier must suppress them via RocksDB-resident state
      mem.addData(b2.toSeq ++ b1.map { case (id, t) => (id + 1000000L, t) }: _*)
      q.processAllAvailable()
      assertRocksDbActive(q)
      val out = rocks.table("r_banddedup")
      assert(out.filter(col("doc_id") >= 1000000L).count() == 0,
        "re-sent signatures leaked past the RocksDB sig-dedup tier")
      // the band annotation matches the batch probe for the emitted docs
      val gotDup = out.filter(col("is_dup"))
        .select("doc_id").as[Long].collect().toSet
      val emitted = out.select("doc_id").as[Long].collect().toSet
      val wantDup = idx
        .join(graft.llm.Dedup.lshBands(graft.llm.Dedup
            .minhashSignaturesStateless(docs.filter(col("doc_id").isin(emitted.toSeq: _*)))),
          Seq("band_id", "key"))
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(gotDup == wantDup)
    } finally q.stop()
  }

  test("injected mid-batch failure + restart under RocksDB: session state rolls back and replays (round 8)") {
    // the stateful failure path: a task dies INSIDE a batch that has
    // already started mutating flatMapGroupsWithState state. The RocksDB
    // store must discard the uncommitted version on the engine-driven
    // replay — final sessions bit-equal to the batch operator's.
    val base = "/tmp/graft_test_stage/rocksdb_fail"
    graft.util.Fs.deleteRecursively(base)
    val srcDir = s"$base/src"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val evs = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .select($"user_id", $"ts", $"event_id").as[SessEvent]
      .collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val maxMs = evs.map(_.ts.getTime).max
    val (b1, b2) = evs.splitAt(evs.length / 2)
    def start() = Streams.streamingSessionize(
        rocks.readStream.schema(b1.toSeq.toDS().schema).parquet(srcDir)
          .as[SessEvent].map(e => InjectFault.tap(e)))
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", ckpt).option("path", outDir).start()
    b1.toSeq.toDS().write.mode("append").parquet(srcDir)
    val q1 = start(); try { q1.processAllAvailable(); assertRocksDbActive(q1) } finally q1.stop()
    val day = 24L * 3600 * 1000
    (b2.toSeq ++ Seq(SessEvent(-1L, new Timestamp(maxMs + 2 * day), 0L)))
      .toDS().write.mode("append").parquet(srcDir)
    InjectFault.armed.set(true)
    val q2 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination()
    }
    q2.stop()
    assert(!InjectFault.armed.get(), "fault never fired")
    // engine replay of the failed batch, then a second sentinel closes
    // everything still open
    val q3 = start(); try q3.processAllAvailable() finally q3.stop()
    Seq(SessEvent(-1L, new Timestamp(maxMs + 4 * day), 1L))
      .toDS().write.mode("append").parquet(srcDir)
    val q4 = start(); try q4.processAllAvailable() finally q4.stop()
    val got = rocks.read.parquet(outDir)
      .filter($"user_id" >= 0L)
      .select($"user_id", $"session_id", $"n_events",
        $"session_start", $"session_end", $"dur_us")
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    val want = graft.operators.EventAnalytics.queries("q_sessionize")
      .fn(rocks, TestSpark.sfDir)
      .as[(Long, Long, Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == want,
      s"mid-batch failure broke session state: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
  }

  test("s_anomaly: running-moment state round-trips through RocksDB (round 9)") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val ev = graft.Engine.table(rocks, TestSpark.sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .as[ValueEvent].collect()
    val cutoffUs = ev.map(e => MicroTs.toUs(e.ts)).sorted.apply(ev.length / 2)
    val (b1, b2) = ev.partition(e => MicroTs.toUs(e.ts) < cutoffUs)
    val mem = MemoryStream[ValueEvent]
    val q = Streams.streamingAnomaly(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_anomaly").start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      assertRocksDbActive(q)
      val got = rocks.table("r_anomaly").as[AnomalyAlert].collect().toSet
      val want = graft.Registry.all("q_anomaly_alerts")
        .fn(rocks, TestSpark.sfDir).as[AnomalyAlert].collect().toSet
      assert(got == want,
        s"extra: ${(got -- want).take(3)}; missing: ${(want -- got).take(3)}")
    } finally q.stop()
  }

  test("s_label_horizon: open-view buffer state under RocksDB resolves " +
    "labels across batches") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    val h = graft.operators.EventAnalytics.labelHorizonUs
    def ev(id: Long, usOff: Long, t: String) =
      ValueEvent(1L, t, MicroTs.toTs(1700000000000000L + usOff), id, 0L)
    val mem = MemoryStream[ValueEvent]
    val q = Streams.streamingLabelHorizon(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_label").start()
    try {
      // batch 1: two open views — nothing decidable yet
      mem.addData(ev(1, 0L, "view"), ev(2, h / 2, "view"))
      q.processAllAvailable()
      assert(rocks.table("r_label").count() == 0L)
      // batch 2: a purchase inside view-2's horizon but past view-1's —
      // resolution must read BOTH buffered views back from RocksDB
      mem.addData(ev(3, h + h / 4, "purchase"))
      q.processAllAvailable()
      assertRocksDbActive(q)
      val got = rocks.table("r_label").as[LabelRow].collect()
        .map(r => r.event_id -> (r.label, r.tt_us)).toMap
      assert(got == Map(1L -> (false, None),
        2L -> (true, Some(h + h / 4 - h / 2))), s"got $got")
    } finally q.stop()
  }

  test("s_feature_lags: last-3 buffer state under RocksDB feeds " +
    "cross-batch lags") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    def ev(id: Long, c: Long) =
      ValueEvent(7L, "view", MicroTs.toTs(1700000000000000L + id * 1000000L), id, c)
    val mem = MemoryStream[ValueEvent]
    val q = Streams.streamingFeatureLags(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("r_feat").start()
    try {
      mem.addData(ev(1, 10L), ev(2, 20L)); q.processAllAvailable()
      // batch-2 rows must see batch-1 cents through recovered state
      mem.addData(ev(3, 30L), ev(4, 40L)); q.processAllAvailable()
      assertRocksDbActive(q)
      val got = rocks.table("r_feat").as[FeatRow].collect()
        .map(r => r.event_id -> (r.lag1_cents, r.lag2_cents, r.prev3_sum,
          r.prev3_n)).toMap
      assert(got(1L) === ((None, None, None, 0L)))
      assert(got(3L) === ((Some(20L), Some(10L), Some(30L), 2L)))
      assert(got(4L) === ((Some(30L), Some(20L), Some(60L), 3L)))
    } finally q.stop()
  }

  test("s_charset: per-source counter aggregation state under RocksDB " +
    "accumulates across batches and equals the batch rollup") {
    implicit val sqlCtx = rocks.sqlContext
    import rocks.implicits._
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    val b1 = Seq(("a", "plain ascii doc"), ("b", "badctrl"))
    val b2 = Seq(("a", "日本語テキスト"), ("b", "more � damage"))
    val mem = MemoryStream[(String, String)]
    val q = Streams.streamingCharsetAudit(mem.toDF().toDF("source", "text"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("r_charset").start()
    try {
      Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      assertRocksDbActive(q)
      val got = snap(rocks.table("r_charset"))
      val want = snap(graft.llm.TextAnalysis.charsetAudit(
        (b1 ++ b2).toDF("source", "text")))
      assert(got == want, s"got $got want $want")
      // cross-batch accumulation is real: both sources span both batches
      assert(got.exists(r => r._1 == "a" && r._2 == 2L && r._4 > 0L))
      assert(got.exists(r => r._1 == "b" && r._2 == 2L && r._6 > 0L && r._7 > 0L))
    } finally q.stop()
  }
}
