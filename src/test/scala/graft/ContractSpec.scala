package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the flagship smoke, key
  * consistency between queries and oracles, and oracle determinism
  * hygiene (every oracle is totally ordered or a bare aggregate).
  */
class ContractSpec extends AnyFunSuite {

  test("SparkEntry.entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("registry has no duplicate ids across modules") {
    val maps = Seq(
      operators.Relational.queries, operators.Aggregates.queries,
      operators.SqlSurface.queries, operators.AsOf.queries,
      operators.EventAnalytics.queries,
      operators.Scale.queries, functions.Scalars.queries,
      connector.Connector.queries, streaming.Streams.queries,
      functions.UserFunctions.queries, llm.TextAnalysis.queries,
      llm.Dedup.queries, llm.Components.queries, llm.Search.queries,
      llm.Similarity.queries, llm.Multimodal.queries)
    val keys = maps.flatMap(_.keys)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query ids: $dups")
    assert(keys.size == Registry.all.size)
  }

  test("events reader restores the legacy nanos conf and still executes") {
    val spark = TestSpark.spark
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val ev = Engine.table(spark, TestSpark.sfDir, "events")
    // getOption surfaces the registered default ("false") when unset —
    // the leak would be a lingering "true"
    assert(!spark.conf.getOption(key).contains("true"),
      "shared-session conf must not leak from readEvents")
    assert(ev.count() > 0, "plan must stay executable after conf restore")
  }

  test("array_dot rejects non-double arrays with an analysis error") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT array_dot(array(1, 2), array(3, 4))").collect())
    assert(e.getMessage.contains("array_dot requires two array<double>"),
      e.getMessage)
  }

  test("saltedJoin rejects right/full outer join types") {
    val spark = TestSpark.spark
    val df = Engine.table(spark, TestSpark.sfDir, "nation")
    val e = intercept[IllegalArgumentException](
      operators.Scale.saltedJoin(df, df, "n_nationkey", joinType = "full"))
    assert(e.getMessage.contains("saltedJoin supports"))
  }

  test("every oracle is deterministic: ORDER BY present or single-row aggregate") {
    val bad = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      val up = sql.toUpperCase
      up.contains("ORDER BY") ||
        (up.contains("COUNT(*)") && !up.contains("GROUP BY")) || // global agg
        !up.contains("FROM") // constant select: single row by construction
    }.keySet
    assert(bad.isEmpty, s"oracles without total ordering: $bad")
  }
}
