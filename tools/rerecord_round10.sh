#!/bin/bash
# Round-10 settled-session artifact re-record: every non-exempt
# BENCH_*/RATIO_* artifact, strictly serialized (never two engines
# competing for the cores), run AFTER the last plan-touching commit so
# the staleness ratchet passes at HEAD.
set -u
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "1/6 BENCH_sf0.1 (bench.py)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py > /tmp/r10_bench_sf01.out 2>/tmp/r10_bench_sf01.err
log "rc=$?"

log "2/6 RATIO_sf0.1 (interleaved, full catalog)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/bench_ratio.py --out RATIO_sf0.1.json > /tmp/r10_ratio_sf01.out 2>/tmp/r10_ratio_sf01.err
log "rc=$?"

log "3/6 BENCH_sf1 (bench.py)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1 python bench.py > /tmp/r10_bench_sf1.out 2>/tmp/r10_bench_sf1.err
log "rc=$?"

log "4/6 RATIO_sf1 (interleaved, full catalog)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1 python tools/bench_ratio.py --out RATIO_sf1.json > /tmp/r10_ratio_sf1.out 2>/tmp/r10_ratio_sf1.err
log "rc=$?"

log "5/6 BENCH_sf1skew (bench.py)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1skew python bench.py > /tmp/r10_bench_sf1skew.out 2>/tmp/r10_bench_sf1skew.err
log "rc=$?"

log "6/6 RATIO_sf1skew (interleaved, DISCLOSED subset: the 7 skew-sensitive entries)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_scaled/sf1skew python tools/bench_ratio.py --out RATIO_sf1skew.json q20 q22 q33 q35 q44 q51 q75 > /tmp/r10_ratio_sf1skew.out 2>/tmp/r10_ratio_sf1skew.err
log "rc=$?"

log "ALL DONE"
