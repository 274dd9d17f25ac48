"""Sources: file discovery, CSV (with sniffing), parquet, lance-gated.

Reference parity (SURVEY.md §2.1):
- S1 DiscoverFiles (``internal/connectors/filescanner.go:28-132``):
  recursive/non-recursive walk, extension filter (case-insensitive),
  min/max size, modified before/after, error when zero matches →
  ``discover_files`` below, feeding the file list to ``read_*`` so
  size/mtime predicates prune BEFORE any data is read.
- S2-S4 CSV readers: Ray's Arrow CSV reader is strictly more correct
  than the reference's naive scanner (no quote handling,
  ``adaptive_streaming_engine.go:125-153``); the custom parser FSM's
  config surface (``csv_parser.go:23-46``) maps to pyarrow options.
- S5 delimiter sniffing (``csv_parser.go:352-391``): head-sample count
  of , ; tab | — most frequent wins. Reimplemented.
- S6 UTF-8 validation (``csv_parser.go:393-396``).
- Lance: the north rule names Lance tables; the lib is absent in this
  sandbox, so the reader is gated behind import-try with a parquet
  fallback (same Dataset downstream).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import ray
import ray.data as rd


@dataclass
class DiscoveryOptions:
    recursive: bool = True
    min_size: int = 0
    max_size: int | None = None
    modified_after: float | None = None   # unix ts
    modified_before: float | None = None


def discover_files(root: str, ext: str, options: DiscoveryOptions | None = None
                   ) -> list[dict]:
    """Returns [{path, size, mtime}] matching the filters; raises if no
    files match (reference errors on zero matches,
    filescanner.go:48-55)."""
    opt = options or DiscoveryOptions()
    ext = ext.lower().lstrip(".")
    out = []
    if opt.recursive:
        walker = os.walk(root)
    else:
        try:
            entries = [(root, [], os.listdir(root))]
        except NotADirectoryError:
            entries = [(os.path.dirname(root), [], [os.path.basename(root)])]
        walker = entries
    for dirpath, _, files in walker:
        for f in files:
            if not f.lower().endswith("." + ext):
                continue
            p = os.path.join(dirpath, f)
            try:
                st = os.stat(p)
            except OSError:
                continue
            if st.st_size < opt.min_size:
                continue
            if opt.max_size is not None and st.st_size > opt.max_size:
                continue
            if opt.modified_after is not None and st.st_mtime <= opt.modified_after:
                continue
            if opt.modified_before is not None and st.st_mtime >= opt.modified_before:
                continue
            out.append({"path": p, "size": st.st_size, "mtime": st.st_mtime})
    if not out:
        raise FileNotFoundError(f"no .{ext} files found under {root}")
    return sorted(out, key=lambda d: d["path"])


def detect_delimiter(sample: bytes, max_lines: int = 5) -> str:
    """Reference S5 sniffer: count , ; tab | over ≤5 sample lines; most
    frequent wins, ',' on ties (csv_parser.go:352-391)."""
    lines = sample.split(b"\n")[:max_lines]
    head = b"\n".join(lines)
    counts = {",": head.count(b","), ";": head.count(b";"),
              "\t": head.count(b"\t"), "|": head.count(b"|")}
    best = max(counts.items(), key=lambda kv: (kv[1], kv[0] == ","))
    return best[0] if best[1] > 0 else ","


def validate_utf8(data: bytes) -> bool:
    """Reference S6 (csv_parser.go:393-396)."""
    try:
        data.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def read_csv_auto(paths: str | list[str], tolerate_ragged: bool = True,
                  ragged: str = "skip", **kw) -> "rd.Dataset":
    """CSV → Dataset with sniffed delimiter and permissive parsing.

    Ragged-row handling:

    - ``ragged="skip"`` (default): Arrow's chunked CSV reader; invalid
      rows are DROPPED (Arrow cannot repair them in-stream).
    - ``ragged="truncate"``: the reference's tolerate semantics
      (``adaptive_streaming_engine.go:199-202`` ``FieldsPerRecord=-1``
      keeps short/long rows) — rows with extra fields are truncated to
      the header width, short rows padded with nulls; every data line
      survives. One Ray task per file (the dirty-CSV profile path; the
      strict path keeps Arrow's chunked reads)."""
    from pyarrow import csv as pacsv

    first = paths[0] if isinstance(paths, list) else paths
    with open(first, "rb") as f:
        delim = detect_delimiter(f.read(64 * 1024))
    if ragged == "truncate":
        plist = list(paths) if isinstance(paths, (list, tuple)) else [paths]
        refs = [_read_csv_truncate_task.remote(p, delim) for p in plist]
        return rd.from_arrow_refs(refs)
    popts = {"delimiter": delim}
    if tolerate_ragged:
        popts["invalid_row_handler"] = lambda row: "skip"
    parse_options = pacsv.ParseOptions(**popts)
    return rd.read_csv(paths, parse_options=parse_options, **kw)


def _read_csv_truncate_table(path: str, delim: str) -> "pa.Table":
    """One file → Arrow table with reference tolerate semantics: extra
    fields ignored, short rows null-padded (pandas ``on_bad_lines``
    callable is invoked only for too-MANY-field rows; too-few rows are
    NaN-padded natively)."""
    import pandas as pd
    import pyarrow as pa

    with open(path, encoding="utf-8", errors="replace") as f:
        header = f.readline().rstrip("\r\n").split(delim)
    ncols = len(header)
    import warnings

    with warnings.catch_warnings():
        # pandas warns that extra fields are dropped — that IS the
        # requested truncate semantics
        warnings.simplefilter("ignore")
        df = pd.read_csv(
            path, sep=delim, engine="python", index_col=False,
            on_bad_lines=lambda row: row[:ncols],
        )
    return pa.Table.from_pandas(df, preserve_index=False)


@ray.remote
def _read_csv_truncate_task(path: str, delim: str):
    return _read_csv_truncate_table(path, delim)


def read_jsonl(paths: str | list[str], columns: list[str] | None = None,
               **kw) -> "rd.Dataset":
    """JSONL (newline-delimited JSON) → Dataset.

    The dominant text-corpus interchange format (C4 / Pile / RedPajama
    dumps ship as ``.jsonl[.gz]``); the reference never grew past CSV.
    Ray's ``read_json`` wraps the Arrow JSON reader — one read task per
    file, gzip auto-detected by extension, rows with missing keys
    null-padded. Arrow's JSON parser has no column pushdown, so the
    projection runs immediately after the parse (fused into the read
    task) and only requested columns reach the object store."""
    ds = rd.read_json(paths, **kw)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def is_lance_dataset(path) -> bool:
    """True when the path is a Lance dataset (by layout; cheap stat)."""
    p = str(path)
    return p.endswith(".lance") or os.path.isdir(os.path.join(p, "_versions"))


def read_table(path: str, columns: list[str] | None = None, **kw) -> "rd.Dataset":
    """Format-dispatching table reader: Lance if available and the path
    is a Lance dataset; JSONL / CSV by extension; else parquet. One
    call site for the north rule's 'read via lance → Dataset'."""
    if is_lance_dataset(path):
        try:
            import lance  # noqa: F401

            return rd.read_lance(path, columns=columns, **kw)
        except ImportError:
            pass
    low = str(path).lower()
    if low.endswith((".jsonl", ".jsonl.gz", ".ndjson")):
        return read_jsonl(path, columns=columns, **kw)
    if low.endswith(".csv"):
        ds = read_csv_auto(path, **kw)
        return ds.select_columns(columns) if columns else ds
    return read_parquet_fast(path, columns=columns, **kw)


def table_rows(path: str) -> tuple[int, int | None]:
    """(total rows, file count or None) for a parquet dir/file or a
    Lance dataset — metadata only (Lance counts from its manifest)."""
    if is_lance_dataset(path):
        try:
            import lance

            return lance.dataset(str(path)).count_rows(), None
        except ImportError:
            pass
    return parquet_footer_rows(path)


class _LocalFooterMetadataProvider:
    """Parquet metadata provider that reads footers serially IN-PROCESS.

    Ray's default provider fan-outs footer fetches as ~6-fragment Ray
    tasks — right for object storage, but on a LOCAL filesystem the
    dispatch latency dominates: measured 10–16 s of read_parquet()
    planning for an 832-file input whose footers pyarrow reads serially
    in 0.4 s. Every pipeline over a many-file local table paid that
    twice (main read + the dedup pre-pass's pruned read).

    Defined lazily (class body at call time) because the base class
    lives in a DeveloperAPI module.
    """

    _cls = None
    # footer cache keyed by (path, mtime_ns, size): a quality pipeline
    # reads the same table 2-3x per run (row-count probe, dedup
    # pre-pass projection, main scan) — only the first pays the footer
    # reads; invalidated automatically when the file changes
    _cache: dict = {}

    @classmethod
    def get(cls):
        if cls._cls is None:
            import os as _os

            from ray.data.datasource.parquet_meta_provider import (
                ParquetMetadataProvider,
                _fetch_metadata,
            )
            cache = cls._cache

            class LocalFooterMetadataProvider(ParquetMetadataProvider):
                def prefetch_file_metadata(self, fragments, **ray_remote_args):
                    out, missing, mkeys = [], [], []
                    for f in fragments:
                        try:
                            st = _os.stat(f.path)
                            key = (f.path, st.st_mtime_ns, st.st_size)
                        except OSError:
                            key = None
                        md = cache.get(key) if key is not None else None
                        out.append(md)
                        if md is None:
                            missing.append(f)
                            mkeys.append(key)
                    if missing:
                        if len(cache) > 65536:
                            cache.clear()
                        fetched = _fetch_metadata(missing)
                        j = 0
                        for i in range(len(out)):
                            if out[i] is None:
                                out[i] = fetched[j]
                                if mkeys[j] is not None:
                                    cache[mkeys[j]] = fetched[j]
                                j += 1
                    return out

            cls._cls = LocalFooterMetadataProvider
        return cls._cls


def _is_local_path(path) -> bool:
    p = str(path)
    return "://" not in p or p.startswith("file://") or p.startswith("local://")


def parquet_footer_rows(path: str) -> tuple[int, int]:
    """(total rows, file count) for a local parquet file/dir from footers
    ONLY — and seed the ``read_parquet_fast`` footer cache with every
    footer read, so the subsequent Dataset read's metadata prefetch is a
    pure cache hit (the footer is otherwise read twice per pipeline:
    once for the row probe, once at plan time).

    Footers are fetched with a small thread pool: pyarrow releases the
    GIL during file I/O, and a many-file table (the bounded-file-size
    layout the fused read wants) pays one open+parse per file.
    """
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    files: list[str] = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files.extend(os.path.join(root, f) for f in names
                         if f.endswith(".parquet"))
    else:
        files.append(path)
    if not files:
        return 0, 0

    cache = _LocalFooterMetadataProvider._cache
    meta_cls_holder = {}

    def one(f: str):
        try:
            st = os.stat(f)
            key = (f, st.st_mtime_ns, st.st_size)
        except OSError:
            key = None
        if key is not None and key in cache:
            return cache[key].num_rows
        md = pq.read_metadata(f)
        if key is not None:
            cls = meta_cls_holder.get("cls")
            if cls is None:
                from ray.data.datasource.parquet_meta_provider import (
                    _ParquetFileFragmentMetaData,
                )
                cls = meta_cls_holder["cls"] = _ParquetFileFragmentMetaData
            if len(cache) > 65536:
                cache.clear()
            cache[key] = cls(md)
        return md.num_rows

    if len(files) <= 4:
        rows = [one(f) for f in files]
    else:
        with ThreadPoolExecutor(max_workers=8) as ex:
            rows = list(ex.map(one, files))
    return sum(rows), len(files)


def read_parquet_fast(path, columns: list[str] | None = None,
                      **kw) -> "rd.Dataset":
    """``rd.read_parquet`` with in-process footer prefetch on local
    paths (see ``_LocalFooterMetadataProvider``); identical to the
    stock reader for object-store URIs, where the remote-task fan-out
    is the right call."""
    paths = path if isinstance(path, (list, tuple)) else [path]
    if "meta_provider" not in kw and all(_is_local_path(p) for p in paths):
        kw["meta_provider"] = _LocalFooterMetadataProvider.get()()
    return rd.read_parquet(path, columns=columns, **kw)


def read_parquet_small(path, columns: list[str] | None = None,
                       rows_per_block: int = 512, max_blocks: int = 64,
                       **kw) -> "rd.Dataset":
    """Read a SMALL local parquet table with the block count derived
    from the footer row count instead of Ray's decoded-size estimate.

    The stock reader shattered a 580 KB / 5000-row documents file into
    ``SplitBlocks(64)`` (~80-row blocks): 0.35–2.5 s of per-block
    overhead per scan vs 0.07 s at footer-derived splits, and every
    downstream ``batch_size=512`` map task pays ~7 block fetches.
    ~``rows_per_block`` rows per block keeps a batched map stage fully
    parallel (one task per batch) without near-empty blocks. Footer
    reads hit the same (path, mtime, size) cache as
    ``read_parquet_fast``. For large multi-file inputs use
    ``read_parquet_fast`` — this helper is for small lookup /
    driver-gate tables."""
    paths = path if isinstance(path, (list, tuple)) else [path]
    if "override_num_blocks" not in kw and all(_is_local_path(p) for p in paths):
        try:
            import pyarrow.parquet as pq
            # expand directory inputs (fixture generators return dirs)
            # so the footer row probe applies to them too
            files = []
            for p in paths:
                sp = str(p)
                if os.path.isdir(sp):
                    files.extend(sorted(
                        os.path.join(sp, f) for f in os.listdir(sp)
                        if f.endswith(".parquet")))
                else:
                    files.append(sp)
            rows = sum(pq.ParquetFile(f).metadata.num_rows
                       for f in files)
            kw["override_num_blocks"] = max(
                1, min(max_blocks,
                       (rows + rows_per_block - 1) // rows_per_block))
        except Exception:
            pass                      # fall back to the stock estimate
    return read_parquet_fast(path, columns=columns, **kw)
