package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Whole-suite physical-plan audit: an accidental cartesian or
  * nested-loop join added to ANY query fails this spec, not just the
  * round-1 dedup set. The allowed list is exactly the queries whose
  * semantics require a non-equi or broadcast-tiny cross shape.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Builders with eager side effects (staged writes, DDL) — planning
    * them would run real jobs; their plan shapes are covered by their own
    * specs. The dedup/IVF queries left this list in round 3: their eager
    * localCheckpoints became lazy DISK_ONLY persists, so they are audited
    * like everything else.
    */
  private val sideEffecting = Set(
    "q_csv_sink", "q_df_write", "q_exec_ddl", "q_ctas", "q_insert_append",
    "q_overwrite", "q_scan_csv", "q_scan_json", "q_scan_orc", "q_compact",
    // building these writes their staged dataset first; PushdownSpec
    // pins q_scan_partitioned's PartitionFilters plan shape
    "q_scan_partitioned", "q_scan_evolve",
    // building q_join_bucketed's DataFrame writes both bucketed tables;
    // ScaleSpec pins its Exchange-free physical shape
    "q_join_bucketed",
    // building q_dedup_cc's DataFrame runs the eager label-propagation
    // loop (real jobs), and its returned plan is just a window over a
    // LogicalRDD. The per-round join shapes this audit cannot see are
    // covered directly since round 8: ComponentsSpec's ccRoundObserver
    // audit asserts every round plans graph-sized hash joins with no
    // cartesian/nested-loop (LlmSpec pins the pair-generation plan)
    "q_dedup_cc",
    // same eager cc loop (shares q_dedup_cc's labeling + audits)
    "q_dedup_cluster_sizes")

  /** Queries whose plans legitimately contain a cross/nested-loop join:
    * a deliberate cartesian, a genuine non-equi predicate, or a
    * broadcast of a tiny (1-row query vector / centroid) table.
    * q_join_lateral is deliberately NOT here: its lateral decorrelates to
    * a hash join, and a Catalyst regression to a per-row nested loop over
    * orders must fail this audit (CLAUDE.md: the only legal BNLJ is
    * crossJoin(broadcast(tiny))).
    */
  private val allowed = Set(
    "q_join_cross",      // cartesian by definition
    "q_join_theta",      // non-equi join predicate
    "q_sim_topk",        // crossJoin(broadcast(1-row query vector))
    "q_sim_mips",        // crossJoin(broadcast(1-row query vector))
    "q_dsir_weights",    // crossJoin(broadcast(1-row n_ref/n_tgt totals))
    "q_sim_ann",         // crossJoin(broadcast(probe set)) variant
    "q_sim_ivf",         // crossJoin(broadcast(1-row query + centroid table))
    "q_cluster_assign",  // crossJoin(broadcast(8-row centroid table))
    "q_cluster_purity",  // crossJoin(broadcast(8-row centroid table))
    "q_embed_outliers",  // crossJoin(broadcast(8-row centroid table))
    "q_dedup_sem",       // crossJoin(broadcast(8-row centroid table))
    "q_scalar_subquery", // crossJoin(broadcast(1-row aggregate))
    "q_tpch_q22",        // crossJoin(broadcast(1-row average-balance threshold))
    "q_tpch_q11",        // crossJoin(broadcast(1-row national-total aggregate))
    "q_tpch_q15",        // crossJoin(broadcast(1-row max-revenue aggregate))
    "q_tfidf",           // crossJoin(broadcast(1-row N-docs aggregate))
    "q_embed_quant",     // crossJoin(broadcast(1-row min/max stats))
    "q_sim_quant",       // crossJoin(broadcast(1-row query vector)) + stats
    "q_bm25",            // crossJoin(broadcast(1-row corpus totals))
    "q_phrase_pmi",      // crossJoin(broadcast(1-row n_uni aggregate))
    "q_rarity_score",    // crossJoin(broadcast(1-row n_uni aggregate))
    "q_gap_fill",        // crossJoin(broadcast(25-row nation dim)) × month spine
    "q_dau_window",      // crossJoin(broadcast(1-row max-date aggregate))
    "q_zorder",          // crossJoin(broadcast(1-row min/max stats))
    "q_join_size_est",   // crossJoin(broadcast(1-row sketch/count aggregates))
    "q_source_divergence", // crossJoin(broadcast(50-row vocab + 1-row total))
    "q_rfm",             // crossJoin(broadcast(1-row max-date + 1-row quartile bounds))
    "q_bin_equidepth",   // crossJoin(broadcast(1-row decile-boundary aggregate))
    "q_rolling_median",  // crossJoin(broadcast(types + 1-row day bounds)) × day spine
    "q_ks_drift",        // crossJoin(broadcast(sources)) × value spine
    "q_chi2_indep",      // crossJoin(broadcast(sources col-totals + 1-row N))
    "q_pareto_share",    // crossJoin(broadcast(1-row p90 boundary))
    "q_quantile_norm",   // crossJoin(broadcast(pooled cells + source list))
    "q_mix_epochs",      // crossJoin(broadcast(1-row corpus-total aggregate))
    "q_mann_whitney",    // crossJoin(broadcast(distinct type list)) fan-out
    "q_benford",         // crossJoin(broadcast(1-row digit-total aggregate))
    "q_cramers_v",       // crossJoin(broadcast(dim totals + 1-row N)) grid
    "q_abtest_cuped",    // crossJoin(broadcast(1-row midpoint + 1-row theta))
    "q_churn",           // crossJoin(broadcast(1-row max-week aggregate))
    "q_sample_balanced", // crossJoin(broadcast(|lang|-row cutoffs + 1-row target))
    "q_kendall_tau",     // crossJoin(broadcast(calendar-day grid)) pair enumeration
    "q_runs_test",       // crossJoin(broadcast(1-row median))
    "q_kruskal_wallis",  // crossJoin(broadcast(1-row N + tie term))
    "q_survival_km",     // crossJoin(broadcast(1-row corpus frontier))
    "q_rank_fusion",     // crossJoin(broadcast(1-row query vector + bm25 totals))
    "q_mix_temperature", // crossJoin(broadcast(1-row Σtokens + Σweights))
    "q_graph_modularity", // crossJoin(broadcast(1-row edge count m))
    "q_vocab_coverage",  // crossJoin(broadcast(3-row k grid + 1-row totals))
    "q_corr_matrix",     // crossJoin(broadcast(tiny type list)) zero-fill
    "q_permutation_test", // crossJoin(broadcast(21-row seed grid + 1-row t_obs))
    "q_hits",            // crossJoin(broadcast(1-row normalization totals)) ×3
    "q_eval_leakage",    // crossJoin(broadcast(1-row eval-count + leak aggs))
    "q_mix_dedup_interaction", // crossJoin(broadcast(two 1-row totals))
    "q_lm_score",        // crossJoin(broadcast(1-row vocab-size aggregate))
    "q_sim_pq",          // crossJoin(broadcast(1-row query vector)) rerank
    "q_sim_ivfpq",       // crossJoin(broadcast(1-row query vector)) rerank
    "q_sim_mips_ann",    // gate's exact-MIPS truth side: mipsTopK's
                         // crossJoin(broadcast(1-row query vector))
    "q_nb_classify",     // crossJoin(broadcast(1-row train-total/class-
                         // count aggregate)) feeding the prior table
    "q_cross_source_overlap") // round 16: mask HISTOGRAM (≤ 2^sources
                         // rows) × crossJoin(broadcast(sources-sized
                         // bit table)) ×2 — the bitmask expansion that
                         // replaced the gram self-join
  // q_negative_sampling left this list in round 11: the users×catalog
  // crossJoin became a bucketed broadcast EQUI-join (per-bucket top-2
  // pre-limit, map-side seen-array prune) — see EventAnalytics.

  /** Queries allowed to plan a PARTITION-LESS window (WindowExec's "No
    * Partition Defined" warning): each one's window INPUT is provably
    * bounded — an aggregated cell/calendar/vocabulary table or an
    * already-limited top-k — never corpus rows, so the single reducer
    * holds a domain-sized partition at any SF (round-8 verdict
    * adjudication, now pinned: a NEW global window over unbounded rows
    * must either go through Scale.rankGlobal/minAboveStrict or justify
    * itself onto this list).
    */
  private val boundedGlobalWindow = Set(
    "q_bin_equidepth",  // input: distinct price cents cells (post-agg)
    "q_growth_rate",    // input: calendar months
    "q_user_growth",    // input: calendar days
    "q_funnel_paths",   // input: path vocabulary (≤ |event_type|³)
    "q_quantile_norm",  // input: value-domain cells (length domain)
    "q_bm25",           // input: the already-limited top-10
    "q_rolling_corr",   // input: calendar days (daily metric grid)
    "q_runs_test",      // input: calendar days (median rank + run lag)
    "q_kruskal_wallis", // input: value-domain cents cells (pooled rank)
    "q_rank_fusion",    // input: the two already-limited top-10 lists
    "q_vocab_coverage", // input: count-value cells (distinct count domain)
    "q_dedup_threshold_sweep") // input: the ≤10-row jac-decile bucket table

  test("no query outside the allowed set plans a partition-less window") {
    // logical-plan audit (the physical tree hides behind
    // AdaptiveSparkPlanExec, whose collect() doesn't descend): a Window
    // node with an empty partitionSpec IS the "No Partition Defined"
    // single-reducer shape
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val names = graft.Registry.all.keySet -- sideEffecting
    val offenders = names.filter { n =>
      graft.Registry.all(n).fn(spark, TestSpark.sfDir)
        .queryExecution.optimizedPlan.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.nonEmpty
    }
    assert(offenders.subsetOf(boundedGlobalWindow),
      s"unexpected GLOBAL (single-partition) windows in: " +
        s"${offenders.diff(boundedGlobalWindow).toSeq.sorted} — bound the " +
        "input and add to boundedGlobalWindow with a reason, or use " +
        "Scale.rankGlobal")
  }

  test("no query outside the allowed set plans a cartesian/nested-loop join") {
    val names = graft.Registry.all.keySet -- sideEffecting
    val offenders = names.filter { n =>
      val plan = graft.Registry.all(n).fn(spark, TestSpark.sfDir)
        .queryExecution.executedPlan.toString
      plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
    }
    assert(offenders.subsetOf(allowed),
      s"unexpected cross/nested-loop joins in: ${offenders.diff(allowed).toSeq.sorted}")
  }
}
