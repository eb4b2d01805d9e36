#!/usr/bin/env bash
# Round-close bench hygiene, scripted (CLAUDE.md: "compare bench numbers
# only from a quiet machine"). Refuses to run under load, runs graft.Bench
# at sf0.1, writes bench_out.json at the repo root, and re-checks that the
# recorded load_avg_start honored the rule. Commit the result separately:
#   tools/quietbench.sh && git add bench_out.json && git commit -m "quiet bench"
set -euo pipefail
cd "$(dirname "$0")/.."

MAX_LOAD="${MAX_LOAD:-1.0}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

load1=$(awk '{print $1}' /proc/loadavg)
if awk -v l="$load1" -v m="$MAX_LOAD" 'BEGIN{exit !(l > m)}'; then
  echo "quietbench: REFUSING to run — 1-min load $load1 > $MAX_LOAD" >&2
  echo "quietbench: wait for the machine to quiesce (uptime) and retry" >&2
  exit 1
fi
echo "quietbench: load $load1 <= $MAX_LOAD, running bench on $SF_DIR" >&2

# graft.Bench writes the raw JSON line to bench_out.json itself
# (SPARK_GRAFT_BENCH_OUT); stdout is only for progress.
# Launch via java DIRECTLY, not sbt: sbt's own startup pushes the 1-min
# load past 1 by the time Bench samples it, even on an idle machine (an
# r10 run pre-checked 0.09 and recorded 1.12 — self-load, discarded).
# Requires a prior `sbt -batch compile`; fail loudly if classes are stale.
[ -f target/scala-2.13/classes/graft/Bench.class ] || {
  echo "quietbench: no compiled classes — run 'sbt -batch compile' first" >&2
  exit 1
}
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  >/dev/null 2>&1

# bench_out.json is JSONL since r12: line 1 = full per-query record,
# line 2 = short summary (for the driver's bounded tail capture).
start=$(python3 -c "import json;print(json.loads(open('bench_out.json').readline())['load_avg_start'])")
if awk -v l="$start" -v m="$MAX_LOAD" 'BEGIN{exit !(l > m)}'; then
  echo "quietbench: recorded load_avg_start=$start > $MAX_LOAD — discard this run" >&2
  exit 1
fi
python3 - <<'EOF'
import json
d = json.loads(open('bench_out.json').readline())
print(f"quietbench: total {d['value']:.1f}s / {len(d['queries'])} queries, "
      f"load {d['load_avg_start']:.2f} -> {d['load_avg_end']:.2f}")
EOF
