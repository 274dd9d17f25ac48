#!/usr/bin/env python
"""Phase-level profile of the flagship quality pipeline.

Breaks the staged run into its serial components to locate the
width-independent overhead F that caps scaling efficiency
(VERDICT round 2 item 1):

  footer_walk   _parquet_rows() driver footer scan
  prepass_read  pruned (phash, image_id) scan, materialized
  dup_decision  phash_dup_losers over the materialized projection
  main_scan     fused read->kernels->mark plan with dup_map resolved
  staged_total  images_quality_pipeline(dedup_mode="staged")
  single_total  images_quality_pipeline(dedup_mode="single")

Usage: PROFILE_ROWS=3200000 RAY_GRAFT_CPUS=32 python scripts/profile_phases.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data as rd

N = int(os.environ.get("PROFILE_ROWS", "3200000"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("PROFILE_REPEAT", "2"))


def main():
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from dataquality_cli_ray.fixtures.images import generate_images_parquet
    from dataquality_cli_ray.pipelines import quality as Q
    from dataquality_cli_ray.sources.readers import read_parquet_fast
    from dataquality_cli_ray.stages.rules import QualityConfig

    cfg = QualityConfig()
    t0 = time.time()
    path = generate_images_parquet(N)
    gen_s = time.time() - t0

    langid_model, ppl_model = Q.build_models()
    # warm worker fleet + page cache
    warm = generate_images_parquet(8 * 1024)
    Q.images_quality_pipeline(warm, cfg, langid_model=langid_model,
                              ppl_model=ppl_model).count()
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            with open(os.path.join(path, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    out = {"rows": N, "num_cpus": NCPU, "gen_s": round(gen_s, 2)}

    def timed(name, fn, repeat=REPEAT):
        runs = []
        for _ in range(repeat):
            t = time.time()
            r = fn()
            runs.append(round(time.time() - t, 3))
        out[name] = min(runs)
        out[name + "_runs"] = runs
        print(f"  {name}: {runs}", file=sys.stderr)
        return r

    timed("footer_walk", lambda: Q._parquet_rows(path))
    nrows, nfiles = Q._parquet_rows(path)
    nb = min(max(2 * NCPU, 1), nfiles)

    proj_holder = {}

    def _prepass_read():
        p = read_parquet_fast(path, columns=[cfg.dedup_key, cfg.id_col],
                              override_num_blocks=nb).materialize()
        proj_holder["proj"] = p
        return p

    timed("prepass_read", _prepass_read)
    dup_holder = {}

    def _decision():
        dup_holder["map"] = Q.phash_dup_losers(
            proj_holder["proj"], mode="auto", approx_rows=nrows)

    timed("dup_decision", _decision)
    print(f"  dup keys: {len(dup_holder['map'][0])}", file=sys.stderr)

    def _main_scan():
        ds = read_parquet_fast(path)
        n = Q.quality_pipeline(ds, dup_holder["map"], cfg,
                               langid_model=langid_model,
                               ppl_model=ppl_model).count()
        assert n == N, n

    timed("main_scan", _main_scan)

    def _staged():
        n = Q.images_quality_pipeline(path, cfg, dedup_mode="staged",
                                      langid_model=langid_model,
                                      ppl_model=ppl_model).count()
        assert n == N, n

    timed("staged_total", _staged)

    def _single():
        n = Q.images_quality_pipeline(path, cfg, dedup_mode="single",
                                      langid_model=langid_model,
                                      ppl_model=ppl_model).count()
        assert n == N, n

    if os.environ.get("PROFILE_SINGLE", "1") == "1":
        timed("single_total", _single)

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
