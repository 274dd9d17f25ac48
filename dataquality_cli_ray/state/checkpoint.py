"""Checkpoint / resume + per-partition lineage (north rule: "resumable
from per-partition checkpoints", "every partition writes lineage
records").

Model: the input file list is split into SHARDS (deterministic order —
the unit of resume). Each shard runs the pipeline independently and
writes to ``out_root/shard=<i>/`` ATOMICALLY: outputs land in a temp
dir, a ``manifest.json`` (input fragments, rows in/out, per-rule hit
counters, schema fingerprint) is written last, then the dir is renamed
into place. A rerun skips every shard whose manifest exists — "resume
= anti-filter of done fragments" (SURVEY.md §4).

The reference has NO checkpointing (full rerun, SURVEY §4); this is the
explicit-design extension the north rule requires.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import pyarrow as pa

import ray.data as rd


def shard_files(files: list[str], shard_size: int) -> list[list[str]]:
    files = sorted(files)
    return [files[i : i + shard_size] for i in range(0, len(files), shard_size)]


def _manifest_path(out_root: str, idx: int) -> str:
    return os.path.join(out_root, f"shard={idx}", "manifest.json")


_SHARD_DIR_RE = re.compile(r"^shard=(\d+)$")


def completed_shards(out_root: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_root):
        return done
    for name in os.listdir(out_root):
        # only plain 'shard=<int>' counts — leftover 'shard=N.tmp' dirs
        # from an abrupt crash mid-write must not break resume startup
        m = _SHARD_DIR_RE.match(name)
        if m:
            idx = int(m.group(1))
            if os.path.exists(_manifest_path(out_root, idx)):
                done.add(idx)
    return done


def _manifest_matches(out_root: str, idx: int, shard_files_: list[str]) -> bool:
    """A completed shard is reusable only if its manifest's input
    fragment list equals the current shard's — otherwise shifted shard
    boundaries (input files added/removed between runs) would silently
    reuse stale outputs."""
    try:
        with open(_manifest_path(out_root, idx)) as f:
            manifest = json.load(f)
        return list(manifest.get("input_fragments", [])) == list(shard_files_)
    except (OSError, ValueError):
        return False


def run_resumable(
    files: list[str],
    out_root: str,
    pipeline_fn,
    shard_size: int = 16,
    lineage_fn=None,
) -> dict:
    """Run ``pipeline_fn(list_of_files) -> Dataset`` per shard with
    atomic writes + manifests; skips completed shards.

    Returns {"shards_total", "shards_skipped", "shards_run", "manifests"}.
    ``lineage_fn(out_ds) -> dict`` may add counters to each manifest
    (e.g. drop_reason counts from ``quality.lineage_summary``).
    """
    os.makedirs(out_root, exist_ok=True)
    shards = shard_files(files, shard_size)
    done = completed_shards(out_root)
    ran, manifests = 0, []
    for idx, shard in enumerate(shards):
        final_dir = os.path.join(out_root, f"shard={idx}")
        if idx in done and _manifest_matches(out_root, idx, shard):
            manifests.append(_manifest_path(out_root, idx))
            continue
        tmp_dir = final_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)           # half-written: restart shard
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)         # dir without manifest: redo
        os.makedirs(tmp_dir)
        out_ds = pipeline_fn(shard)
        out_ds.write_parquet(tmp_dir)
        rows_out = _count_rows_parquet(tmp_dir)
        manifest = {
            "shard": idx,
            "input_fragments": shard,
            "rows_out": rows_out,
        }
        if lineage_fn is not None:
            manifest["lineage"] = lineage_fn(tmp_dir)
        with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp_dir, final_dir)       # atomic publish
        manifests.append(_manifest_path(out_root, idx))
        ran += 1
    return {
        "shards_total": len(shards),
        "shards_skipped": len(shards) - ran,
        "shards_run": ran,
        "manifests": manifests,
    }


def _count_rows_parquet(d: str) -> int:
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def lineage_report(out_root: str) -> dict:
    """Read back a finished (or partial) resumable run's manifests.

    Driver-side JSON only — no Ray session. Returns
    ``{"shards": [per-shard manifest dicts in shard order],
       "incomplete": [shard dirs still in .tmp / missing manifests],
       "rows_out": total, "lineage": aggregated rule-hit counters}`` —
    the read-back half of the north rule's "per-partition lineage +
    metrics" (the write half is ``run_resumable``)."""
    if not os.path.isdir(out_root):
        raise FileNotFoundError(f"run directory not found: {out_root}")
    shards, incomplete = [], []
    for name in sorted(os.listdir(out_root)):
        p = os.path.join(out_root, name)
        # classify with the SAME shard-name pattern resume uses
        # (completed_shards): 'shard=<int>' dirs are shards,
        # 'shard=<int>.tmp' dirs are crashed mid-writes; anything else
        # (stray files, editor backups) is not the run's business
        if (name.endswith(".tmp")
                and _SHARD_DIR_RE.match(name[: -len(".tmp")])
                and os.path.isdir(p)):
            incomplete.append(name)
            continue
        if not (_SHARD_DIR_RE.match(name) and os.path.isdir(p)):
            continue
        try:
            with open(os.path.join(p, "manifest.json")) as f:
                shards.append(json.load(f))
        except (OSError, ValueError):
            incomplete.append(name)
    shards.sort(key=lambda m: m.get("shard", -1))
    agg: dict[str, int] = {}
    for m in shards:
        for k, v in (m.get("lineage") or {}).items():
            agg[k] = agg.get(k, 0) + int(v)
    return {
        "shards": shards,
        "incomplete": incomplete,
        "rows_out": sum(int(m.get("rows_out", 0)) for m in shards),
        "lineage": agg,
    }


def drop_reason_lineage(out_dir: str) -> dict:
    """Default lineage_fn: per-rule counters from the shard's own output
    (column-pruned read of drop_reason only)."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for root, _, files in os.walk(out_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f), columns=["drop_reason"])
            vc = t["drop_reason"].combine_chunks().value_counts()
            for s in vc:
                key = s["values"].as_py() or "KEEP"
                counts[key] = counts.get(key, 0) + s["counts"].as_py()
    return counts
