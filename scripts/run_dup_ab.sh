#!/bin/bash
# Alternating A/B of the dup pre-pass mode inside the full headline at
# $AB_ROWS rows / $AB_CPUS cpus: legs alternate partitioned (threshold
# 5M) vs driver (threshold 100M), each leg gated on load < $AB_MAXLOAD,
# results appended to /tmp/dup_ab.jsonl. Minima across legs per mode
# estimate the uncontended times (shared host, bursty co-tenant).
DEADLINE=${DEADLINE_TS:-$(( $(date +%s) + 3600 ))}
ROWS=${AB_ROWS:-6400000}
CPUS=${AB_CPUS:-32}
MAXLOAD=${AB_MAXLOAD:-2}
OUT=/tmp/dup_ab.jsonl
load() { cut -d' ' -f1 /proc/loadavg; }
cd /root/repo
i=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  L=$(load)
  if ! python3 -c "import sys; sys.exit(0 if float('$L') < $MAXLOAD else 1)"; then
    sleep 15; continue
  fi
  if [ $((i % 2)) -eq 0 ]; then name=part; thr=5000000; else name=drv; thr=100000000; fi
  i=$((i + 1))
  ray stop --force >/dev/null 2>&1; sleep 1
  L0=$(load)
  J=$(DQRAY_DUP_SHUFFLE_THRESHOLD=$thr RAY_GRAFT_CPUS=$CPUS \
      BENCH_HEADLINE_ONLY=1 BENCH_HEADLINE_REPEAT=1 IMAGES_BENCH_ROWS=$ROWS \
      timeout 900 python bench.py 2>/dev/null | tail -1)
  L1=$(load)
  [ -n "$J" ] || J=null
  echo "{\"mode\": \"$name\", \"rows\": $ROWS, \"cpus\": $CPUS, \"load_before\": $L0, \"load_after\": $L1, \"result\": $J}" >> $OUT
done
