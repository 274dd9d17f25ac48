#!/bin/bash
# Patient scaling campaign: until DEADLINE_TS (epoch secs), whenever
# the machine is quiet (load < 2), run one (32, 8) pair at $SCALING_ROWS
# and append to /tmp/scaling_results.jsonl. Designed for a host with a
# bursty co-tenant: attempts simply wait out bursts; minima across
# attempts estimate uncontended times.
DEADLINE=${DEADLINE_TS:-$(( $(date +%s) + 3600 ))}
ROWS=${SCALING_ROWS:-3200000}
OUT=/tmp/scaling_results.jsonl
load() { cut -d' ' -f1 /proc/loadavg; }
cd /root/repo
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  L=$(load)
  if ! python3 -c "import sys; sys.exit(0 if float('$L') < 2 else 1)"; then
    sleep 15; continue
  fi
  for leg in 32 8; do
    ray stop --force >/dev/null 2>&1; sleep 2
    L0=$(load)
    J=$(RAY_GRAFT_CPUS=$leg BENCH_HEADLINE_ONLY=1 \
        BENCH_HEADLINE_REPEAT=${LEG_REPEAT:-4} IMAGES_BENCH_ROWS=$ROWS \
        timeout 1200 python bench.py 2>/dev/null | tail -1)
    L1=$(load)
    [ -n "$J" ] || J=null
    echo "{\"leg\": $leg, \"rows\": $ROWS, \"load_before\": $L0, \"load_after\": $L1, \"result\": $J}" >> $OUT
  done
done
