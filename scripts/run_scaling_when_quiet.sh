#!/bin/bash
# Run one 8-vs-32 scaling pair when the machine load is low enough for
# a fair measurement (shared sandbox host). Appends JSON lines to
# /tmp/scaling_results.jsonl with the load observed around each leg.
ROWS=${SCALING_ROWS:-1600000}
OUT=/tmp/scaling_results.jsonl
load() { cut -d' ' -f1 /proc/loadavg; }
wait_quiet() {
  for i in $(seq 1 60); do
    L=$(load)
    if python3 -c "import sys; sys.exit(0 if float('$L') < ${1:-3} else 1)"; then return 0; fi
    sleep 10
  done
  return 1
}
cd /root/repo
for leg in 32 8; do
  wait_quiet 3 || echo "WARN: starting leg $leg under load $(load)"
  ray stop --force >/dev/null 2>&1; sleep 2
  L0=$(load)
  J=$(RAY_GRAFT_CPUS=$leg BENCH_HEADLINE_ONLY=1 IMAGES_BENCH_ROWS=$ROWS \
      timeout 500 python bench.py 2>/dev/null | tail -1)
  L1=$(load)
  echo "{\"leg\": $leg, \"load_before\": $L0, \"load_after\": $L1, \"result\": $J}" >> $OUT
done
tail -2 $OUT
