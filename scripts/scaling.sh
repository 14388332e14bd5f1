#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): interleaved small/large-core
# pairs so slow host drift (CPU steal on this VM) hits both legs of each
# pair equally; efficiency = median over pairs of
# (c/s@LARGE / c/s@SMALL) / (LARGE/SMALL).
#
# Two series, run both:
#
#  - PRIMARY  2 -> 8 cores (SMALL=2 LARGE=8): an honest 4x. The host is
#    an overcommitted Firecracker VM — the interleaved ideal-work control
#    (graft.apps.ScalingControl, pure register work) measures the 32-core
#    leg saturating at ~63M rows/s in EVERY window while a quiet 8-core
#    leg reaches ~33M rows/s: the host physically provides only ~2x the
#    quiet 8-vCPU capacity when all 32 vCPUs are busy (~20% steal shows
#    in /proc/stat under full load, 0 at idle). No job can measure 4x
#    scaling 8->32 on a host that does not HAVE 4x the CPU; at 2->8 both
#    legs sit well inside the host's real capacity and the control
#    ceiling is ~1.0, so the ratio measures the ENGINE, not the host.
#  - SECONDARY 8 -> 32 cores (the r1-r3 series, kept for continuity),
#    read against the same-window control ceiling.
#
# Each small leg runs twice — pinned (`taskset -c 0-(S-1)`, a faithful
# quarter-machine: a cluster of N executors has only N cores) and
# unpinned (the r1-r3 protocol; JVM helper threads spill to idle cores).
# Which one runs hot depends on the window (r4 measured both directions)
# so both are recorded and both medians reported.
#
# Usage: scripts/scaling.sh [nClips] [nPairs] [outFile] [smallCores] [largeCores]
set -euo pipefail
N=${1:-3840000}
PAIRS=${2:-3}
OUT=${3:-/tmp/scaling_pairs.jsonl}
S=${4:-8}
L=${5:-32}
SPIN="0-$((S-1))"
LPIN="0-$((L-1))"
: > $OUT
for i in $(seq 1 $PAIRS); do
  A=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$S SPARK_GRAFT_SUITE=0 \
      SPARK_GRAFT_CLIPS=$N taskset -c $SPIN scripts/run.sh graft.Bench 2>/dev/null | tail -1)
  AU=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$S SPARK_GRAFT_SUITE=0 \
      SPARK_GRAFT_CLIPS=$N scripts/run.sh graft.Bench 2>/dev/null | tail -1)
  B=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$L SPARK_GRAFT_SUITE=0 \
      SPARK_GRAFT_CLIPS=$N taskset -c $LPIN scripts/run.sh graft.Bench 2>/dev/null | tail -1)
  CA=$(SPARK_GRAFT_CPUS=$S SPARK_GRAFT_N=200000000 \
      taskset -c $SPIN scripts/run.sh graft.apps.ScalingControl 2>/dev/null | tail -1)
  CB=$(SPARK_GRAFT_CPUS=$L SPARK_GRAFT_N=200000000 \
      taskset -c $LPIN scripts/run.sh graft.apps.ScalingControl 2>/dev/null | tail -1)
  echo "{\"pair\": $i, \"small\": $S, \"large\": $L, \"b8\": $A, \"b8u\": $AU, \"b32\": $B, \"c8\": $CA, \"c32\": $CB}" >> $OUT
done
python3 - "$OUT" <<'EOF'
import json, statistics, sys
pairs = [json.loads(l) for l in open(sys.argv[1])]
effs, effsU = [], []
for p in pairs:
    S = p.get('small', 8); L = p.get('large', 32); R = L / S
    c8 = p['b8']['clips_per_sec']; c32 = p['b32']['clips_per_sec']
    e = c32 / c8 / R
    effs.append(e)
    extra = ''
    if 'b8u' in p:
        eu = c32 / p['b8u']['clips_per_sec'] / R
        effsU.append(eu)
        extra += f"  unpinned{S}={p['b8u']['clips_per_sec']:.0f} effU={eu:.3f}"
    if 'c8' in p:
        k8 = p['c8']['rows_per_sec']; k32 = p['c32']['rows_per_sec']
        extra += f"  control: {S}={k8/1e6:.1f}M/s {L}={k32/1e6:.1f}M/s ceff={k32/k8/R:.3f}"
    print(f"pair {p['pair']}: pinned{S}={c8:.0f} {L}={c32:.0f} eff={e:.3f}{extra}")
print(f"median efficiency (pinned small legs):   {statistics.median(effs):.3f}")
if effsU:
    print(f"median efficiency (unpinned small legs): {statistics.median(effsU):.3f}")
EOF
