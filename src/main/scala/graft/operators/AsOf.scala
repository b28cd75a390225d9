package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, Q}

/** As-of (nearest-preceding-event) join — an operator Spark has no builtin
  * for. Per the custom-operator preference order (SURVEY §2 / prompt (a)):
  * it IS expressible by composing existing ops, so no custom LogicalPlan is
  * needed — union-tag both sides, one partitioned sort, and a running
  * `last(payload, ignoreNulls)` carries the most recent right-side row to
  * every left-side row.
  *
  * Scale shape: ONE shuffle on the key + one per-partition sort — same cost
  * as a sort-merge join; no range-explosion, no per-row subqueries. This is
  * the standard large-scale formulation (a merge of two time-sorted
  * streams); DuckDB's native ASOF JOIN is the oracle.
  */
object AsOf {

  /** Left rows gain `asof_<payloadCol>`: the right row's payload with the
    * greatest rightTime <= leftTime within the same key (null if none).
    * Right rows sort before left rows at equal timestamps (inclusive
    * match, like ASOF's `>=`).
    *
    * Determinism: several right rows can share one (key, rightTime); a
    * native ASOF JOIN would pick an arbitrary one. The right side is
    * pre-reduced to max(payload) per (key, rightTime) so the operator is
    * deterministic — oracles must mirror the same reduction.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCol: String): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.groupBy(col(key), col(rightTime))
      .agg(max(col(payloadCol)).as(payloadCol))
      .select(
        col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(payloadCol).as("__p"))
    val unioned = l.select((Seq(col(key), col("__t"), col("__side"), col("__p")) ++
      left.columns.filterNot(c => c == key).map(c => l(c))): _*)
    val all = unioned.unionByName(
      r.select((Seq(col(key), col("__t"), col("__side"), col("__p")) ++
        left.columns.filterNot(c => c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.withColumn(s"asof_$payloadCol", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }

  /** Forward as-of: the NEAREST FOLLOWING right row (smallest
    * rightTime >= leftTime per key) — the "time to next conversion"
    * shape. Exact mirror of [[asOfJoin]] with time reversed: same
    * union-tag + one shuffle + one partitioned sort, running `last`
    * over DESCENDING time. Right side pre-reduced to min(payload) per
    * (key, rightTime) for determinism (mirror it in oracles).
    */
  def asOfJoinForward(
      left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCol: String): DataFrame = {
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right.groupBy(col(key), col(rightTime))
      .agg(min(col(payloadCol)).as(payloadCol))
      .select(
        col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(payloadCol).as("__p"))
    val unioned = l.select((Seq(col(key), col("__t"), col("__side"), col("__p")) ++
      left.columns.filterNot(c => c == key).map(c => l(c))): _*)
    val all = unioned.unionByName(
      r.select((Seq(col(key), col("__t"), col("__side"), col("__p")) ++
        left.columns.filterNot(c => c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.withColumn(s"asof_$payloadCol", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }

  val queries: Map[String, Q] = Map(

    // For every click: the id of the user's nearest FOLLOWING (or
    // simultaneous) purchase — time-to-conversion attribution. DuckDB's
    // ASOF LEFT JOIN with the <= direction is the oracle, over the same
    // min-per-(user, ts) reduced purchase stream.
    "q_asof_fwd" -> Q(
      """WITH purchases AS (SELECT user_id, ts, min(event_id) AS event_id
        |                  FROM events WHERE event_type = 'purchase'
        |                  GROUP BY user_id, ts),
        |clicks AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, p.event_id AS asof_purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val events = Engine.table(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      asOfJoinForward(clicks, purchases, "user_id", "ts", "ts", "purchase_id")
        .select(col("event_id"), col("user_id"),
          col("asof_purchase_id").as("asof_purchase_id"))
        .orderBy(col("event_id"))
    },

    // For every error event: the id of the user's nearest preceding (or
    // simultaneous) click. Oracle is DuckDB's native ASOF LEFT JOIN over
    // the same max-per-(user, ts) reduced click stream asOfJoin applies,
    // pinning both engines to one row when timestamps collide.
    "q_asof_join" -> Q(
      """WITH clicks AS (SELECT user_id, ts, max(event_id) AS event_id
        |               FROM events WHERE event_type = 'click'
        |               GROUP BY user_id, ts),
        |errors AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, c.event_id AS asof_click_id
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val events = Engine.table(s, dir, "events")
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      asOfJoin(errors, clicks, "user_id", "ts", "ts", "click_id")
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("asof_click_id"))
        .orderBy(col("event_id"))
    },

    // Nearest-direction as-of (round 8 continuation): for every error,
    // the click with the SMALLEST |Δt| either side — completing the
    // pandas merge_asof direction surface (backward = q_asof_join,
    // forward = q_asof_fwd, nearest = this) that a pandas_redshift user
    // would reach for. Composed from the two existing one-shuffle
    // primitives with struct payloads carrying (ts, id), then a
    // row-local CASE picks the nearer side; ties prefer the PRECEDING
    // click (a stated contract, since pandas leaves it unspecified).
    // Equal-timestamp determinism inherits each primitive's reduction
    // (backward max-id, forward min-id — mirrored in the oracle's
    // cmax/cmin CTEs). Scale shape: two union-tag window passes on the
    // user_id shuffle key, zero joins beyond them; Δt arithmetic is
    // integer µs.
    "q_asof_nearest" -> Q(
      """WITH cmax AS (SELECT user_id, ts, max(event_id) AS event_id
        |             FROM events WHERE event_type = 'click'
        |             GROUP BY user_id, ts),
        |cmin AS (SELECT user_id, ts, min(event_id) AS event_id
        |         FROM events WHERE event_type = 'click'
        |         GROUP BY user_id, ts),
        |errors AS (SELECT user_id, ts, event_id FROM events
        |           WHERE event_type = 'error'),
        |b AS (SELECT e.event_id, e.user_id, e.ts, c.ts AS bts,
        |             c.event_id AS bid
        |      FROM errors e ASOF LEFT JOIN cmax c
        |        ON e.user_id = c.user_id AND e.ts >= c.ts),
        |f AS (SELECT e.event_id, c.ts AS fts, c.event_id AS fid
        |      FROM errors e ASOF LEFT JOIN cmin c
        |        ON e.user_id = c.user_id AND e.ts <= c.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
        |       WHEN fts IS NULL THEN bid
        |       WHEN bts IS NULL THEN fid
        |       WHEN epoch_us(b.ts) - epoch_us(bts)
        |            <= epoch_us(fts) - epoch_us(b.ts) THEN bid
        |       ELSE fid END AS nearest_click_id,
        |  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
        |       WHEN fts IS NULL THEN epoch_us(b.ts) - epoch_us(bts)
        |       WHEN bts IS NULL THEN epoch_us(fts) - epoch_us(b.ts)
        |       WHEN epoch_us(b.ts) - epoch_us(bts)
        |            <= epoch_us(fts) - epoch_us(b.ts)
        |         THEN epoch_us(b.ts) - epoch_us(bts)
        |       ELSE epoch_us(fts) - epoch_us(b.ts) END AS delta_us
        |FROM b JOIN f USING (event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val events = Engine.table(s, dir, "events")
      val back = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          struct(col("ts").as("cts"), col("event_id").as("cid")).as("cp"))
      val fwd = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          struct(col("ts").as("cts"), col("event_id").as("cid")).as("cq"))
      val errors = events.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"))
      val b = asOfJoin(errors, back, "user_id", "ts", "ts", "cp")
      val both = asOfJoinForward(b, fwd, "user_id", "ts", "ts", "cq")
      val (bts, bid) = (col("asof_cp.cts"), col("asof_cp.cid"))
      val (fts, fid) = (col("asof_cq.cts"), col("asof_cq.cid"))
      val bd = unix_micros(col("ts")) - unix_micros(bts)
      val fd = unix_micros(fts) - unix_micros(col("ts"))
      both.select(col("event_id"), col("user_id"),
        when(bts.isNull && fts.isNull, lit(null))
          .when(fts.isNull, bid).when(bts.isNull, fid)
          .when(bd <= fd, bid).otherwise(fid).as("nearest_click_id"),
        when(bts.isNull && fts.isNull, lit(null))
          .when(fts.isNull, bd).when(bts.isNull, fd)
          .when(bd <= fd, bd).otherwise(fd).as("delta_us"))
        .orderBy(col("event_id"))
    }
  )
}
