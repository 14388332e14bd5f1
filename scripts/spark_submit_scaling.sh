#!/bin/bash
# North-rule evidence: "runs via spark-submit ... at N and 4N executors".
# No real cluster exists in this sandbox, so the two cluster sizes are
# two parallelism levels of the IDENTICAL spark-submit invocation on the
# identical input — same binary, same jar, same job, only --master and
# shuffle partitions change (see BASELINE.md "Scaling-efficiency
# protocol" for why 2->8 is the honest 4x on this overcommitted host;
# scripts/scaling.sh is the interleaved-control version of this run).
#
# Usage: scripts/spark_submit_scaling.sh [nClips] [smallCores] [largeCores]
set -euo pipefail
N=${1:-960000}
S=${2:-2}
L=${3:-8}
JAR=target/scala-2.13/impressolanguageidentificationspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package
run() { # cores
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CLIPS=$N \
  SPARK_GRAFT_SUITE=0 SPARK_GRAFT_CPUS=$1 \
  taskset -c 0-$(($1 - 1)) \
  spark-submit --master "local[$1]" --driver-memory 16g \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions=$1 \
    --class graft.Bench "$JAR" 2>/dev/null | tail -1
}
A=$(run $S)
B=$(run $L)
python3 - "$A" "$B" "$S" "$L" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
S, L = int(sys.argv[3]), int(sys.argv[4])
eff = b["clips_per_sec"] / a["clips_per_sec"] / (L / S)
print(json.dumps({"small_cores": S, "large_cores": L,
  "clips_per_sec_small": a["clips_per_sec"],
  "clips_per_sec_large": b["clips_per_sec"],
  "scaling_efficiency": round(eff, 3)}))
EOF
