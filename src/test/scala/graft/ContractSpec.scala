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
      functions.Scalars.queries,
      connector.Connector.queries, streaming.Streams.queries,
      functions.UserFunctions.queries, llm.TextAnalysis.queries,
      llm.Dedup.queries, llm.Similarity.queries, llm.Multimodal.queries)
    val keys = maps.flatMap(_.keys)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate query ids: $dups")
    assert(keys.size == Registry.all.size)
  }

  test("every oracle is deterministic: ORDER BY present or single-row aggregate") {
    val bad = SparkEntry.oracleSql.filterNot { case (_, sql) =>
      val up = sql.toUpperCase
      up.contains("ORDER BY") ||
        (up.contains("COUNT(*)") && !up.contains("GROUP BY")) // global agg
    }.keySet
    assert(bad.isEmpty, s"oracles without total ordering: $bad")
  }
}
