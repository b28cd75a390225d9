#!/bin/bash
# Per-round scale proof (round 7, VERDICT #8): regenerate the synthetic
# sf1.0 (10x sf0.1 — key-offset replicas with text/embedding/timestamp
# variants, see graft.ScaleUp) and re-run the iterative / candidate-capped
# query set against it with BenchOne. Run this whenever an iterative loop,
# candidate cap, or derived sizing constant changes; paste the numbers
# into DESIGN.md's sf1.0 table at round close.
#
# Usage: tools/scale_gate.sh [query ...]
#   (default set = the queries whose shape depends on a loop/cap/constant)
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(q_dedup_cc q_dedup_simhash q_dedup_embed q_dedup_minhash
           q_dedup_near q_dedup_containment q_dedup_fuzzy q_dedup_sem
           q_sim_ann q_join_range q_join_skew q_pipeline_curate
           q_pagerank q_rank_global q_cooccur_window q_rarity_score
           q_id_gaps q_heavy_hitters q_triangles q_dedup_prefix q_zorder
           q_knn_label_acc q_cross_source_overlap q_join_size_est
           q_graph_degree_hist q_skyline)
fi

echo "[scale_gate] regenerating /tmp/sf1.0 from /root/testdata/sf0.1 (10x)"
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sf1.0 10"

echo "[scale_gate] timing ${#QUERIES[@]} queries at sf1.0 (local[${SPARK_GRAFT_CPUS:-32}])"
SPARK_GRAFT_SF_DIR=/tmp/sf1.0 sbt -batch "runMain graft.BenchOne ${QUERIES[*]}" \
  | grep -E "\[benchone\]" || true
