#!/bin/bash
# Candidate-mass audits (q230-q233) for scale-ladder rungs.
#
# Routine rungs run SAMPLED: the production candidate stage runs untouched
# at full scale, but only a deterministic 1/MOD hash-sample of candidate
# pairs is verified and counted (see graft.queries.AuditSampling — counts
# are scaled back and the bound gains a 1.1x noise slack). MOD=1 gives the
# exact audits used for certification rungs (r10 cost at 100x: q230 842 s,
# q233 1,250 s exact — the sampled form exists so the audits can run every
# round).
#
# Usage: tools/ladder_audits.sh <sfDir> [MOD]     (MOD defaults to 100)
# Heap via SPARK_DRIVER_MEM (use 96g at the 100x rung).
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:?usage: ladder_audits.sh <sfDir> [mod]}"
MOD="${2:-100}"
# q232's candidate set is tiny by design (rare-shingle blocks: ~2k pairs
# even at 100x) — sampling it leaves ~20 pairs of signal for no cost win
# (exact form measured 58 s at 100x), so it always runs exact.
SPARK_GRAFT_AUDIT_SAMPLE_MOD=1 tools/run_main.sh graft.cli.QueryShow "$DIR" \
  q232_shingleblock_cand_audit
export SPARK_GRAFT_AUDIT_SAMPLE_MOD="$MOD"
# q237/q238: the exact brute-force certifiers' sampled agreement audits
# (query-side thinning — per-query answers stay exact; see AuditSampling)
exec tools/run_main.sh graft.cli.QueryShow "$DIR" \
  q230_minhash_cand_audit q231_lshband_cand_audit \
  q233_prefixblock_cand_audit \
  q237_margin_cert_audit q238_mutual_nn_cert_audit
