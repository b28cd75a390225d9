package graft

/** Single place that assembles every implemented operator's query + oracle.
  * Each module owns its `Map[String, Q]`; SparkEntry derives the driver
  * contract (`queries` / `oracleSql`) from here.
  */
object Registry {
  def all: Map[String, Q] =
    operators.Relational.queries ++
      operators.Aggregates.queries ++
      operators.SqlSurface.queries ++
      operators.AsOf.queries ++
      operators.EventAnalytics.queries ++
      operators.Scale.queries ++
      operators.Stats.queries ++
      llm.CorpusStats.queries ++
      functions.Scalars.queries ++
      connector.Connector.queries ++
      streaming.Streams.queries ++
      functions.UserFunctions.queries ++
      llm.TextAnalysis.queries ++
      llm.Dedup.queries ++
      llm.Components.queries ++
      llm.Search.queries ++
      llm.Similarity.queries ++
      llm.Multimodal.queries

  /** Keys the driver should treat as headline bench queries (currently all). */
  def names: Seq[String] = all.keys.toSeq.sorted
}
