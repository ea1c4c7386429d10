#!/bin/bash
# Round-12 settled-session artifact re-record: every non-exempt
# BENCH_*/RATIO_* artifact, strictly serialized (never two engines
# competing for the cores), run AFTER the last plan-touching commit so
# the staleness ratchet passes at HEAD. New this round: the
# member-timings bench record (verdict item 7) and the sf10 ratio
# subset (verdict item 2; the full-catalog sf10 oracle is hours —
# CORRECTNESS_sf10.json covers all 50 entries, the ratio discloses
# its subset). Steal is sampled before/after each step.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] steal=$(awk '/^cpu /{print $9}' /proc/stat) $*"; }

if [ "${SKIP_BENCH_SF01:-0}" != "1" ]; then
  log "1/8 BENCH_sf0.1 (bench.py, member timings on — verdict item 7)"
  SPARK_GRAFT_MEMBER_TIMINGS=all SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py > /tmp/r12_bench_sf01.out 2>/tmp/r12_bench_sf01.err
  log "rc=$?"
else
  log "1/8 BENCH_sf0.1 skipped (already recorded at HEAD this session)"
fi

log "2/8 RATIO_sf0.1 (interleaved, full catalog)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_ratio.py --out RATIO_sf0.1.json > /tmp/r12_ratio_sf01.out 2>/tmp/r12_ratio_sf01.err
log "rc=$?"

log "3/8 RATIO_sf0.1_s2 (second session, disclosed 16-entry heavy subset)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_ratio.py --out RATIO_sf0.1_s2.json q05 q19 q20 q29 q31 q33 q35 q39 q44 q51 q52 q53 q55 q68 q75 q77 > /tmp/r12_ratio_sf01_s2.out 2>/tmp/r12_ratio_sf01_s2.err
log "rc=$?"

log "4/8 BENCH_sf1 (bench.py)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1 python bench.py > /tmp/r12_bench_sf1.out 2>/tmp/r12_bench_sf1.err
log "rc=$?"

log "5/8 RATIO_sf1 (interleaved, full catalog)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1 python tools/bench_ratio.py --out RATIO_sf1.json > /tmp/r12_ratio_sf1.out 2>/tmp/r12_ratio_sf1.err
log "rc=$?"

log "6/8 BENCH_sf1skew (bench.py)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1skew python bench.py > /tmp/r12_bench_sf1skew.out 2>/tmp/r12_bench_sf1skew.err
log "rc=$?"

log "7/8 RATIO_sf1skew (interleaved, full catalog)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1skew python tools/bench_ratio.py --out RATIO_sf1skew.json > /tmp/r12_ratio_sf1skew.out 2>/tmp/r12_ratio_sf1skew.err
log "rc=$?"

if [ "${SKIP_SF10:-0}" != "1" ]; then
  log "8/8 RATIO_sf10 (interleaved, disclosed heavy subset — the entries whose inversion carries the scale story)"
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf10 python tools/bench_ratio.py --out RATIO_sf10.json q01 q05 q17 q20 q22 q23 q24 q44 q45 q48 q51 q52 q75 q77 > /tmp/r12_ratio_sf10.out 2>/tmp/r12_ratio_sf10.err
  log "rc=$?"
else
  log "8/8 RATIO_sf10 skipped"
fi

log "ALL DONE"
