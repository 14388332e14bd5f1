#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): interleaved 8/32-core pairs
# so slow host drift (CPU steal on this VM) hits both legs of each pair
# equally; efficiency = median over pairs of (c/s@32 / c/s@8) / 4.
# Usage: scripts/scaling.sh [nClips] [nPairs]
set -euo pipefail
N=${1:-960000}
PAIRS=${2:-3}
OUT=/tmp/scaling_pairs.jsonl
: > $OUT
for i in $(seq 1 $PAIRS); do
  A=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=8 \
      SPARK_GRAFT_CLIPS=$N scripts/run.sh graft.Bench 2>/dev/null | tail -1)
  B=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_CLIPS=$N scripts/run.sh graft.Bench 2>/dev/null | tail -1)
  echo "{\"pair\": $i, \"b8\": $A, \"b32\": $B}" >> $OUT
done
python3 - <<'EOF'
import json, statistics
pairs = [json.loads(l) for l in open('/tmp/scaling_pairs.jsonl')]
effs = []
for p in pairs:
    c8 = p['b8']['clips_per_sec']; c32 = p['b32']['clips_per_sec']
    e = c32 / c8 / 4
    effs.append(e)
    print(f"pair {p['pair']}: 8={c8:.0f} 32={c32:.0f} eff={e:.3f}")
print(f"median efficiency: {statistics.median(effs):.3f}")
EOF
