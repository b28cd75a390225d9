package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scan-efficiency pins: Catalyst must keep pushing projections and
  * filters into the parquet scan for the graded queries. At 100 TB these
  * properties ARE the cost model — a scan that reads all 16 lineitem
  * columns for a 3-column projection, or filters after the scan, is a
  * regression even if results stay correct.
  */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    graft.Registry.all(name).fn(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("q_scan_project reads only the projected columns (ReadSchema pruning)") {
    val plan = planOf("q_scan_project")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(fail(s"no ReadSchema in plan:\n$plan"))
    // the projection selects 3 columns; none of the wide ones may load
    assert(!read.contains("l_comment") && !read.contains("l_shipinstruct"),
      s"unprojected columns reached the scan: $read")
    assert(read.split(",").length <= 4, s"over-wide scan schema: $read")
  }

  // NOTE: the plan string TRUNCATES long pushed-filter lists ("…"), so
  // these regexes must not require the closing bracket.
  test("q_filter_cmp pushes its comparison into the scan (PushedFilters)") {
    val plan = planOf("q_filter_cmp")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]\\n]*(GreaterThan|LessThan|EqualTo).*"),
      s"no pushed comparison filter in plan:\n$plan")
  }

  test("a null-ness WHERE clause reaches the scan as a pushed filter") {
    val plan = graft.Engine.table(spark, TestSpark.sfDir, "orders")
      .filter(col("o_orderpriority").isNotNull).select("o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]\\n]*IsNotNull\\(o_orderpriority\\).*"),
      s"no pushed null filter in plan:\n$plan")
  }

  test("q_tpch_q19's OR-of-ANDs derives pushed filters on BOTH scan sides (CNF)") {
    // the one post-join disjunction must yield (a) the quantity band
    // union on the lineitem scan and (b) the brand/size disjunction on
    // the part scan — if Catalyst's CNF extraction regresses, the scans
    // read the full fact table and the exercise is dead at 100 TB
    val plan = planOf("q_tpch_q19")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]\\n]*l_quantity.*"),
      s"no derived quantity filter reached the lineitem scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]\\n]*p_brand.*"),
      s"no derived brand filter reached the part scan:\n$plan")
  }

  test("q_join_anti_null plans the NULL-AWARE anti join, not a plain left_anti") {
    // ANSI NOT IN with a nullable key: a plain LeftAnti hash join would
    // KEEP null-key probe rows (null matches nothing), silently breaking
    // three-valued logic. Spark's planner must mark the join null-aware;
    // if a future version stops (e.g. the single-column rewrite rule
    // changes), correctness would drift from the DuckDB oracle only on
    // corpora with null keys — pin the plan property itself.
    // (string check: the AQE wrapper hides the join from plan.collect;
    // BroadcastHashJoinExec prints its isNullAwareAntiJoin flag as the
    // trailing argument — "LeftAnti, BuildRight, true")
    val plan = graft.Registry.all("q_join_anti_null").fn(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no LeftAnti join in plan:\n$plan")
    assert(plan.matches("(?s).*LeftAnti, Build(Right|Left), true.*"),
      s"LeftAnti join lost its null-aware marking:\n$plan")
  }

  test("q_scan_partitioned prunes partitions at planning (PartitionFilters)") {
    // the read over the hive-partitioned layout must carry the
    // event_type predicate as a PARTITION filter (directory pruning) —
    // not a post-scan row filter; losing this reads every partition of
    // a 100 TB dataset for a two-partition query
    val plan = planOf("q_scan_partitioned")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]\\n]*event_type.*"),
      s"event_type predicate did not become a partition filter:\n$plan")
  }

  test("flagship aggregation runs inside whole-stage codegen") {
    // the codegen star markers (*(n)) only exist in the FINAL adaptive
    // plan, so execute THIS dataset's plan (count() would execute a
    // derived aggregate plan instead)
    val df = graft.Registry.all("q_agg_group").fn(spark, TestSpark.sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("),
      s"flagship fell out of whole-stage codegen:\n$plan")
  }

  test("fused dedup signatures stay inside whole-stage codegen") {
    // the round-3 native expressions must not push their projection out
    // of codegen (CodegenFallback would silently reintroduce the round-2
    // interpreted inner loop)
    val docs = graft.Engine.table(spark, TestSpark.sfDir, "documents")
    val sig = graft.llm.Dedup.minhashSignaturesStateless(docs)
    sig.collect()
    val plan = sig.queryExecution.executedPlan
    assert(plan.toString.contains("*("), s"signature projection not codegen'd:\n$plan")
    // and the expressions themselves are not CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.graft.ColumnBridge
    val e0 = ColumnBridge.expression(lit("a b c d"))
    Seq(
      graft.functions.Shingles(e0, 3),
      graft.functions.MinhashSignature(e0, 3,
        graft.functions.MinhashSignature.defaultSeeds),
      graft.functions.SimhashSignature(e0, 3)
    ).foreach { e =>
      assert(!e.isInstanceOf[CodegenFallback],
        s"${e.getClass.getSimpleName} regressed to CodegenFallback")
    }
  }

  test("rank-predicate rewrites plan as WindowGroupLimit (top-k kept map-side)") {
    // the QUALIFY / DISTINCT ON rewrites must trigger Spark's
    // rank-limit pushdown: a partial WindowGroupLimit below the exchange
    // keeps only k rows per group per map task, so the window shuffle
    // moves k×groups rows instead of the whole table. Losing this (e.g.
    // a filter form the optimizer can't see through) silently degrades
    // to a full-table window sort at 100 TB.
    Seq("q_topk", "q_qualify", "q_distinct_on", "q_postings").foreach { n =>
      val plan = planOf(n)
      assert(plan.contains("WindowGroupLimit"),
        s"$n lost the rank-limit pushdown:\n$plan")
    }
  }

  test("round-4 text/embedding scans stay column-pruned") {
    // each (query, forbidden-column) pair: a wide column that must not
    // reach the parquet scan — q_tfidf needs only (doc_id, text),
    // q_merge_upsert only 3 customer + 2 event columns, q_embed_quant
    // only (vec_id, embedding)
    val cases = Seq(
      ("q_tfidf", Seq("lang", "source", "n_chars")),
      ("q_merge_upsert", Seq("o_", "event_type", "props")),
      ("q_embed_quant", Seq("label")),
      // round-7 text ops need only (doc_id, text) — or just text for the
      // corpus-level pmi aggregates
      ("q_chunk_slide", Seq("lang", "source", "n_chars")),
      ("q_oov_rate", Seq("lang", "source", "n_chars")),
      ("q_phrase_pmi", Seq("lang", "source", "n_chars")),
      ("q_postings", Seq("lang", "source", "n_chars")),
      ("q_rarity_score", Seq("lang", "source", "n_chars")),
      ("q_gopher_rules", Seq("lang", "source", "n_chars")),
      // q_pagerank's visible plan is the verts scan (the edge pipeline
      // runs inside the persisted RDD lineage) — doc_id only
      ("q_pagerank", Seq("lang", "source", "n_chars", "text")),
      // q_normalize reports the raw n_chars, so only lang/source are dead
      ("q_normalize", Seq("lang", "source")),
      // q_winsorize touches lineitem twice (bounds + clamp) — both scans
      // must prune to (l_returnflag, l_extendedprice)
      ("q_winsorize", Seq("l_quantity", "l_orderkey", "l_shipdate")),
      ("q_mad_outliers", Seq("l_quantity", "l_orderkey", "l_shipdate")),
      ("q_cooccur_window", Seq("lang", "source", "n_chars")),
      // round-8 continuation audits: the drift family reads (source,
      // n_chars) only — the wide text column must never reach its scans —
      // while the vocabulary/duplication audits read (lang|source, text)
      ("q_ks_drift", Seq("text", "lang", "doc_id")),
      ("q_quantile_norm", Seq("text", "lang", "doc_id")),
      ("q_gini_vocab", Seq("source", "n_chars", "doc_id")),
      ("q_dup_rate_by_source", Seq("lang", "n_chars", "doc_id")))
    cases.foreach { case (n, forbidden) =>
      val reads = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(planOf(n)).map(_.group(1)).toSeq
      forbidden.foreach { c =>
        assert(!reads.exists(_.contains(c)),
          s"$n scan loads unneeded column '$c': $reads")
      }
    }
  }
}
