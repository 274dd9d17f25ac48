#!/bin/bash
# Load-gated A/B campaign over headline-pipeline VARIANTS: cycles
# through "<dedup_mode>:<ncpus>" legs (VARIANTS env, space-separated)
# whenever the machine is quiet, appending JSON lines to
# /tmp/variant_ab.jsonl. Same protocol as run_scaling_patient.sh
# (CPU-pinned legs, fresh process, min-of-N runs, page-cache warm).
DEADLINE=${DEADLINE_TS:-$(( $(date +%s) + 3600 ))}
ROWS=${SCALING_ROWS:-6400000}
VARIANTS=${VARIANTS:-"staged:32 broadcast:32 staged:8 broadcast:8"}
OUT=${OUT:-/tmp/variant_ab.jsonl}

busy_cpus() {
  python3 - <<'EOF'
import time
def snap():
    f = open('/proc/stat').readline().split()
    v = list(map(int, f[1:]))
    return v[3] + v[4], sum(v)
i0, t0 = snap(); time.sleep(2); i1, t1 = snap()
dt = t1 - t0
print(round(32 * (1 - (i1 - i0) / dt), 1) if dt else 99)
EOF
}

quiet() {
  [ -e /tmp/graft_busy ] && return 1
  B=$(busy_cpus)
  python3 -c "import sys; sys.exit(0 if float('$B') < ${QUIET_CPUS:-3} else 1)"
}

cd /root/repo
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  for spec in $VARIANTS; do
    mode=${spec%%:*}; leg=${spec##*:}
    # gate BEFORE ray stop: stopping first would kill an interactive
    # session the operator is running behind /tmp/graft_busy
    while ! quiet; do sleep 10; done
    ray stop --force >/dev/null 2>&1; sleep 2
    for i in $(seq 60); do quiet && break; sleep 10; done
    cat /tmp/dqray_fixtures/images_n${ROWS}_s42/*.parquet > /dev/null 2>&1
    B0=$(busy_cpus)
    L0=$(cut -d' ' -f1 /proc/loadavg)
    J=$(RAY_GRAFT_CPUS=$leg BENCH_HEADLINE_ONLY=1 IMAGES_DEDUP_MODE=$mode \
        BENCH_HEADLINE_REPEAT=${LEG_REPEAT:-2} IMAGES_BENCH_ROWS=$ROWS \
        timeout 1800 taskset -c 0-$((leg - 1)) python bench.py 2>/dev/null | tail -1)
    L1=$(cut -d' ' -f1 /proc/loadavg)
    [ -n "$J" ] || J=null
    echo "{\"mode\": \"$mode\", \"leg\": $leg, \"rows\": $ROWS, \"busy_before\": $B0, \"load_before\": $L0, \"load_after\": $L1, \"result\": $J}" >> $OUT
  done
done
