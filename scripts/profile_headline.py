#!/usr/bin/env python
"""One instrumented headline run: per-operator ds.stats() decomposition.

Usage:  taskset -c 0-31 python scripts/profile_headline.py [ncpus] [rows]

Prints the full Ray Data stats block plus a compact per-operator
summary (wall, cpu, rows, tasks) so the scaling gap can be attributed
to a specific operator (read/fused kernels/mark/prepass) instead of
guessed at. Owns its Ray session (script, not library).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCPU = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 6_400_000


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from dataquality_cli_ray.fixtures.images import generate_images_parquet
    from dataquality_cli_ray.pipelines.quality import (
        build_models, images_quality_pipeline)
    from dataquality_cli_ray.stages.rules import QualityConfig

    path = generate_images_parquet(ROWS)
    cfg = QualityConfig()
    langid, ppl = build_models()

    # warmup (same protocol as bench.py)
    warm = generate_images_parquet(8 * 1024)
    images_quality_pipeline(warm, cfg, langid_model=langid,
                            ppl_model=ppl).count()

    t0 = time.time()
    out = images_quality_pipeline(path, cfg, langid_model=langid,
                                  ppl_model=ppl)
    # materialize (not count) so the executed plan's stats are readable
    mat = out.materialize()
    n = mat.count()
    wall = time.time() - t0
    print(f"== wall {wall:.2f} s  rows {n}  ncpu {NCPU} "
          f"({n / wall:.0f} img/s, {wall * NCPU / n * 1e6:.1f} us*cpu/row)")
    print(mat.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
