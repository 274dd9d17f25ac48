#!/usr/bin/env python
"""Steal-gated A/B harness over headline-pipeline variants.

This box is a VM on a shared hypervisor: the benchmark's noise source
is OUTER-host co-tenancy, visible only as /proc/stat steal while we
demand CPU. Each leg is gated on a full-width spin probe (steal < 3%),
runs in a fresh process (taskset-pinned to its width), and records the
in-run steal share so contaminated legs can be discarded.

Usage:
  VARIANTS="staged:32 single:32" ROWS=12800000 REPS=3 \
      python scripts/ab_steal_gated.py
Appends JSON lines to $OUT (default /tmp/ab_steal.jsonl).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_stat() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def _spin(stop: float) -> None:
    while time.time() < stop:
        pass


def steal_probe(dt: float = 1.5) -> float:
    s0 = cpu_stat()
    stop = time.time() + dt
    ps = [mp.Process(target=_spin, args=(stop,))
          for _ in range(os.cpu_count() or 32)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    d = [b - a for a, b in zip(s0, cpu_stat())]
    return d[7] / max(1, sum(d)) * 100.0


def wait_quiet(max_wait: float = 300.0) -> float:
    deadline = time.time() + max_wait
    st = steal_probe()
    while time.time() < deadline and st >= 3.0:
        time.sleep(8)
        st = steal_probe()
    return st


def warm_cache(rows: str) -> None:
    import glob
    d = f"/tmp/dqray_fixtures/images_n{rows}_s42"
    for f in glob.glob(f"{d}/*.parquet"):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass


def main() -> None:
    rows = os.environ.get("ROWS", "12800000")
    variants = os.environ.get("VARIANTS", "staged:32 single:32").split()
    reps = int(os.environ.get("REPS", "3"))
    out_path = os.environ.get("OUT", "/tmp/ab_steal.jsonl")
    repeat = os.environ.get("LEG_REPEAT", "2")

    for r in range(reps):
        for spec in variants:
            mode, leg = spec.split(":")
            warm_cache(rows)
            gate = wait_quiet()
            env = dict(os.environ, RAY_GRAFT_CPUS=leg,
                       BENCH_HEADLINE_ONLY="1", IMAGES_DEDUP_MODE=mode,
                       BENCH_HEADLINE_REPEAT=repeat,
                       IMAGES_BENCH_ROWS=rows)
            cmd = ["/usr/bin/taskset", "-c", f"0-{int(leg) - 1}",
                   sys.executable, os.path.join(REPO, "bench.py")]
            s0 = cpu_stat()
            t0 = time.time()
            try:
                res = subprocess.run(cmd, env=env, capture_output=True,
                                     text=True, check=True, cwd=REPO,
                                     timeout=1800)
                j = json.loads(res.stdout.strip().splitlines()[-1])
            except Exception as e:  # noqa: BLE001
                j = {"error": str(e)[:400]}
            d = [b - a for a, b in zip(s0, cpu_stat())]
            rec = {
                "mode": mode, "leg": int(leg), "rows": int(rows), "rep": r,
                "gate_steal_pct": round(gate, 2),
                "run_steal_pct": round(d[7] / max(1, sum(d)) * 100.0, 2),
                "wall_s": round(time.time() - t0, 1),
                "result": j,
            }
            line = json.dumps(rec)
            with open(out_path, "a") as fh:
                fh.write(line + "\n")
            print(line, flush=True)


if __name__ == "__main__":
    main()
