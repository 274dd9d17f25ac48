#!/bin/bash
# Patient scaling campaign: until DEADLINE_TS (epoch secs), whenever
# the machine is actually quiet, run one (32, 8) pair at $SCALING_ROWS
# and append to /tmp/scaling_results.jsonl. Designed for a host with a
# bursty co-tenant: attempts simply wait out bursts; minima across
# attempts estimate uncontended times.
#
# Each leg is CPU-pinned (taskset -c 0-(N-1)) to emulate an N-core
# NODE: ray num_cpus only caps task concurrency, not where the process
# tree's threads (raylet, object store, driver, BLAS) physically run.
#
# Quiet gate: busy-CPU fraction from /proc/stat over a 2 s window
# (loadavg lags by minutes and counts our own just-finished legs).
# Coordination: if /tmp/graft_busy exists, we hold off (the interactive
# session is running its own tests/benches).
DEADLINE=${DEADLINE_TS:-$(( $(date +%s) + 3600 ))}
ROWS=${SCALING_ROWS:-3200000}
OUT=/tmp/scaling_results.jsonl

busy_cpus() {  # number of non-idle CPUs averaged over 2 s
  python3 - <<'EOF'
import time
def snap():
    f = open('/proc/stat').readline().split()
    v = list(map(int, f[1:]))
    idle = v[3] + v[4]
    return idle, sum(v)
i0, t0 = snap(); time.sleep(2); i1, t1 = snap()
dt = t1 - t0
print(round(32 * (1 - (i1 - i0) / dt), 1) if dt else 99)
EOF
}

quiet() {  # true when co-tenant + residue use < QUIET_CPUS cores
  [ -e /tmp/graft_busy ] && return 1
  B=$(busy_cpus)
  python3 -c "import sys; sys.exit(0 if float('$B') < ${QUIET_CPUS:-3} else 1)"
}

cd /root/repo
FLIP=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! quiet; then sleep 10; continue; fi
  # alternate leg order between pair attempts: the co-tenant's burst
  # cycle correlated with a fixed order (every 32-leg dirty, 8-leg
  # clean in one campaign), which biases the pair's ratio
  if [ "$FLIP" = 0 ]; then LEGS="32 8"; FLIP=1; else LEGS="8 32"; FLIP=0; fi
  for leg in $LEGS; do
    ray stop --force >/dev/null 2>&1; sleep 2
    # re-gate each leg: the pair is only useful if both legs are clean
    for i in $(seq 60); do quiet && break; sleep 10; done
    # warm the fixture's page cache so run 1 of a leg measures the
    # pipeline, not cold /dev/vda reads
    cat /tmp/dqray_fixtures/images_n${ROWS}_s42/*.parquet > /dev/null 2>&1
    L0=$(cut -d' ' -f1 /proc/loadavg)
    B0=$(busy_cpus)
    J=$(RAY_GRAFT_CPUS=$leg BENCH_HEADLINE_ONLY=1 \
        BENCH_HEADLINE_REPEAT=${LEG_REPEAT:-3} IMAGES_BENCH_ROWS=$ROWS \
        timeout 1800 taskset -c 0-$((leg - 1)) python bench.py 2>/dev/null | tail -1)
    L1=$(cut -d' ' -f1 /proc/loadavg)
    [ -n "$J" ] || J=null
    echo "{\"leg\": $leg, \"rows\": $ROWS, \"pinned\": true, \"busy_before\": $B0, \"load_before\": $L0, \"load_after\": $L1, \"result\": $J}" >> $OUT
  done
done
