#!/usr/bin/env bash
# One-command sf1 scale gate (r11 verdict #5 + #6): regenerate the 10x
# scale-up, bench the curated top-35 (+ adaptive twins) with the sf0.1
# ratio pass, print the exponent table, then oracle-verify the
# dedup/decontam family at sf1 (the rows whose exponents matter most —
# order-dependent float sums surface exactly there).
#
# Usage: tools/sf1_gate.sh [--skip-regen] [--skip-oracle]
# Writes: docs/bench_sf1_top25.json (committed artifact, attributed).
# MUST run exclusively (no concurrent sbt/bench/verify JVMs).
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_REGEN=0
SKIP_ORACLE=0
for a in "$@"; do
  case "$a" in
    --skip-regen) SKIP_REGEN=1 ;;
    --skip-oracle) SKIP_ORACLE=1 ;;
    *) echo "unknown arg: $a" >&2; exit 2 ;;
  esac
done

SRC=/root/testdata/sf0.1
OUT="$PWD/data/sf1"

if [ "$SKIP_REGEN" = 0 ]; then
  echo "== [1/4] ScaleUp: $SRC x10 -> $OUT"
  sbt -batch "runMain graft.ScaleUp $SRC $OUT 10"
else
  echo "== [1/4] ScaleUp skipped (--skip-regen)"
fi

# The r11 curated list (25 most expensive committed rows + quadratic-
# risk family representatives) + the r12 adaptive twin, so fixed-K and
# adaptive-K exponents sit side by side in one artifact.
QUERIES=dd_bbit_minhash,dd_exact_substr,dd_greedy_vs_cc,dd_incremental,dd_lsh_tuning,dd_minhash_lsh,dd_ngram_jaccard,dd_simhash_pairs,dd_source_overlap,dq_mmd_drift,dq_profile,er_blocking_sweep,er_edit1_pairs,er_edit2_lookup,ev_price_elasticity,gx_jaccard_linkpred,gx_katz,gx_knn_degree,gx_ktruss,gx_ktruss_adaptive,gx_louvain2,gx_pagerank,gx_random_walks,gx_triangles,gx_triangles_adaptive,pl_curation_v2,pl_curation_v3,pl_decontam_scrub,pl_decontam_semantic,pl_decontam_spans,q32_recursive_cte,q47_blame_supplier,sim_ann_recall,sim_ivf_recall,sim_margin_bitext,sim_margin_bitext_adaptive,sim_pq_recall,ts_linear_interp,ts_resample_ffill

echo "== [2/4] Bench at sf1 (ratio pass vs $SRC)"
SPARK_GRAFT_SF_DIR="$OUT" \
  SPARK_GRAFT_ONLY="$QUERIES" \
  SPARK_GRAFT_RATIO_DIR="$SRC" \
  SPARK_GRAFT_BENCH_OUT=docs/bench_sf1_top25.json \
  SPARK_GRAFT_COMMITTED_REF=docs/bench_sf1_top25.json \
  sbt -batch "runMain graft.Bench"

echo "== [3/4] Exponent table"
python3 tools/sf1_exponents.py docs/bench_sf1_top25.json || true

if [ "$SKIP_ORACLE" = 0 ]; then
  echo "== [4/4] sf1 oracle selfcheck: dedup/decontam family"
  # the dd_* / pl_decontam_* subset of the bench list above
  DD_QUERIES=$(echo "$QUERIES" | tr ',' '\n' \
    | grep -E '^(dd_|pl_decontam)' | paste -sd,)
  SPARK_GRAFT_ONLY="$DD_QUERIES" SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Verify $OUT /tmp/verify_sf1"
  python3 tools/selfcheck.py "$OUT" /tmp/verify_sf1
else
  echo "== [4/4] oracle selfcheck skipped (--skip-oracle)"
fi

echo "== sf1 gate complete"
