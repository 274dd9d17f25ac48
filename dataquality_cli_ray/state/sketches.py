"""Mergeable per-column statistics partials — the profiler's core.

The reference computes every statistic as a per-value streaming update
plus a finalization (``internal/engine/simple_engine.go:143-364``).
Here the same decomposition becomes: one ``ColumnPartial`` per column
per Arrow block (vectorized pyarrow.compute kernels, no row loop), an
associative ``merge``, and a ``finalize`` producing the stats row.
Only tiny partial structs ever move — raw rows are never shuffled.

Semantics notes vs the reference (deliberate divergences documented per
SURVEY.md §7.4):

- null rule: Arrow-null OR blank-after-trim for string columns
  (replicates ``adaptive_streaming_engine.go:206-209``).
- mean: exact Σx/n (the live path's ×100 fixed-point sampling,
  ``adaptive_streaming_engine.go:273-287``, is NOT replicated — the
  exact engines are the semantics source, ``simple_engine.go:277-280``).
- std: population variance, but via numerically stable Chan/Welford
  merge instead of the reference's catastrophic-cancellation
  ``sqrt(E[x²]−E[x]²)`` (``simple_engine.go:287-293``) — same value,
  stable at scale.
- min/max: typed (numeric) min/max; the live path's lexicographic
  numeric compare (``adaptive_streaming_engine.go:236-243``) is a bug
  we do not replicate. String min/max stay lexicographic
  (``simple_engine.go:325-342``).
- unique: exact distinct via per-block distincts (capped) with an
  automatic HyperLogLog fallback at scale; the live path's
  divide-by-constant heuristic (``adaptive_streaming_engine.go:324-352``)
  is not replicated.
- quantiles: linear interpolation identical to SQL
  ``percentile_cont`` (``simple_engine.go:344-364`` uses the same
  formula over a sample); exact when values fit the cap, else a
  deterministic stride-subsampled mergeable sketch with documented
  ~1/cap rank tolerance.
- top/freq (mode): per-block ``pc.value_counts`` merged, capped
  space-saving style; tie-break = highest count then smallest value
  (deterministic, matches the oracle's ``ORDER BY c DESC, v ASC``).
- type inference (CSV-style string columns): the exact engines'
  promotion lattice hasInt/hasFloat/hasString
  (``simple_engine.go:262-270``), evaluated vectorized by regex.
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

INT_REGEX = r"^[+-]?[0-9]+$"
FLOAT_REGEX = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"

# full-string ISO-8601-ish formats probed on STRING columns for the
# datetime member of the promotion lattice. The reference DOC-CLAIMS a
# datetime column type (/root/reference/cmd/describe.go:82) but never
# detects one; detection is real here and strictly additive — a column
# infers datetime only when EVERY non-blank value strptime-parses
# (validated, not regex-matched: "2024-13-45" does not count).
DT_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d")
# one cheap RE2 shape gate before strptime so ordinary text columns pay
# a single regex scan (same cost class as INT/FLOAT_REGEX), not three
# strptime passes over every distinct value
DT_SHAPE_REGEX = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}([ T][0-9]{2}:[0-9]{2}:[0-9]{2})?$"

DEFAULT_UNIQUE_CAP = 1 << 20       # exact distinct set cap per column
DEFAULT_TOPK_CAP = 1 << 16         # value-counts map cap
DEFAULT_VALUES_CAP = 1 << 21       # exact-quantile value buffer cap

_NUMERIC_TYPES = (
    pa.types.is_integer,
    pa.types.is_floating,
)


def column_kind(t: pa.DataType) -> str:
    if any(p(t) for p in _NUMERIC_TYPES):
        return "numeric"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return "other"


class HyperLogLog:
    """Classic HLL (p registers = 2^p), mergeable; used only when the
    exact distinct set overflows its cap."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.full(len(h), 64 - self.p + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # position of highest set bit
            bl = np.zeros(len(h), dtype=np.int64)
            r = rest[nz]
            bits = np.zeros(r.shape, dtype=np.int64)
            v = r.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                big = v >= (np.uint64(1) << np.uint64(shift))
                bits[big] += shift
                v[big] >>= np.uint64(shift)
            bl[nz] = bits
            lz[nz] = (64 - 1 - bl[nz]) + 1
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> int:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / float(np.sum(2.0 ** (-self.registers.astype(np.float64))))
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        return int(round(est))


@dataclass
class ColumnPartial:
    name: str
    kind: str
    n: int = 0
    nulls: int = 0
    # numeric moments (Chan/Welford mergeable)
    num_n: int = 0
    mean: float = 0.0
    m2: float = 0.0
    min_num: float | None = None
    max_num: float | None = None
    # string/lexicographic extremes (also used for timestamps rendered ISO)
    min_str: str | None = None
    max_str: str | None = None
    # distinct + mode state: pending per-batch (values, counts) arrays,
    # merged vectorized (pandas groupby-sum) on compaction. While
    # ``hll`` is None the compacted state is EXACT; once the distinct
    # count passes unique_cap it spills to a HyperLogLog and the counts
    # become a capped heavy-hitters table (space-saving style).
    vc_values: list = field(default_factory=list)   # list[np.ndarray]
    vc_counts: list = field(default_factory=list)   # list[np.ndarray]
    vc_pending: int = 0
    hll: HyperLogLog | None = None
    counts_overflow: bool = False
    # quantile values (numeric only). values_w is parallel to values:
    # None = all points weight 1 (exact buffer), else an ndarray of
    # per-point weights (stride-subsampled buffer — each kept point
    # carries the summed weight of the points it replaced)
    values: list = field(default_factory=list)   # list[np.ndarray]
    values_w: list = field(default_factory=list)  # list[None | np.ndarray]
    values_exact: bool = True
    values_n: int = 0
    # CSV-style type-promotion flags (string columns)
    has_int: bool = False
    has_float: bool = False
    has_str: bool = False
    has_datetime: bool = False
    unique_cap: int = DEFAULT_UNIQUE_CAP
    topk_cap: int = DEFAULT_TOPK_CAP
    values_cap: int = DEFAULT_VALUES_CAP

    # ---------- update from one Arrow array ----------
    def update(self, arr: pa.ChunkedArray | pa.Array) -> None:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.n += len(arr)
        if self.kind == "numeric":
            self._update_numeric(arr)
        elif self.kind == "string":
            self._update_string(arr)
        elif self.kind == "timestamp":
            self._update_timestamp(arr)
        else:
            self.nulls += arr.null_count

    def _update_numeric(self, arr: pa.Array) -> None:
        self.nulls += arr.null_count
        # safe=False: int64 values beyond float64's exact-integer range
        # (e.g. 64-bit hashes) degrade to nearest-double, as SQL avg() does
        vals = pc.cast(arr.drop_null(), pa.float64(), safe=False).to_numpy(
            zero_copy_only=False)
        if len(vals) == 0:
            return
        n2 = len(vals)
        mean2 = float(vals.mean())
        m22 = float(((vals - mean2) ** 2).sum())
        self._merge_moments(n2, mean2, m22)
        mn, mx = float(vals.min()), float(vals.max())
        self.min_num = mn if self.min_num is None else min(self.min_num, mn)
        self.max_num = mx if self.max_num is None else max(self.max_num, mx)
        self._update_distinct_and_mode(arr.drop_null())
        self._append_values(vals)

    def _update_string(self, arr: pa.Array) -> None:
        trimmed = pc.utf8_trim_whitespace(arr)
        blank = pc.or_kleene(pc.is_null(arr), pc.equal(trimmed, "")).fill_null(True)
        self.nulls += pc.sum(blank.cast(pa.int64())).as_py() or 0
        nonnull = arr.drop_null()
        if len(nonnull):
            mm = pc.min_max(nonnull)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            self.min_str = mn if self.min_str is None else min(self.min_str, mn)
            self.max_str = mx if self.max_str is None else max(self.max_str, mx)
            self._update_distinct_and_mode(nonnull)
            self._update_type_flags(trimmed.drop_null())

    def _update_timestamp(self, arr: pa.Array) -> None:
        self.nulls += arr.null_count
        nonnull = arr.drop_null()
        if len(nonnull):
            # min/max on the raw timestamps; ONLY the two extremes get
            # formatted (strftime over the whole column was 85 % of the
            # per-batch cost)
            mm = pc.min_max(nonnull)
            mn, mx = _ts_iso(mm["min"].as_py()), _ts_iso(mm["max"].as_py())
            self.min_str = mn if self.min_str is None else min(self.min_str, mn)
            self.max_str = mx if self.max_str is None else max(self.max_str, mx)
            self._update_distinct_and_mode(nonnull)

    def _update_type_flags(self, trimmed: pa.Array) -> None:
        nonblank = trimmed.filter(pc.not_equal(trimmed, ""))
        if not len(nonblank):
            return
        # evaluate regexes on distinct values only (cheap on repeated data)
        distinct = pc.unique(nonblank)
        is_int = pc.match_substring_regex(distinct, INT_REGEX)
        is_float = pc.match_substring_regex(distinct, FLOAT_REGEX)
        n_int = pc.sum(is_int.cast(pa.int64())).as_py() or 0
        n_float = pc.sum(is_float.cast(pa.int64())).as_py() or 0
        total = len(distinct)
        # datetime probe: one RE2 shape gate over the distincts, then
        # strptime VALIDATION (month/day ranges — "2024-13-45" fails)
        # on the usually-tiny surviving subset
        n_dt = 0
        cand = distinct.filter(
            pc.match_substring_regex(distinct, DT_SHAPE_REGEX))
        if len(cand):
            ok = None
            for fmt in DT_FORMATS:
                parsed = pc.strptime(cand, format=fmt, unit="us",
                                     error_is_null=True)
                valid = pc.is_valid(parsed)
                ok = valid if ok is None else pc.or_(ok, valid)
            n_dt = pc.sum(ok.cast(pa.int64())).as_py() or 0
        if n_int:
            self.has_int = True
        if n_float > n_int:
            self.has_float = True
        if n_dt:
            self.has_datetime = True
        if n_float + n_dt < total:
            self.has_str = True

    def _update_distinct_and_mode(self, nonnull: pa.Array) -> None:
        vc = pc.value_counts(nonnull)
        vals = vc.field("values").to_numpy(zero_copy_only=False)
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        if self.hll is not None:
            self.hll.add_hashes(_hash_values(vals))
        self.vc_values.append(vals)
        self.vc_counts.append(cnts)
        self.vc_pending += len(vals)
        if self.vc_pending > max(self.unique_cap // 2, 4 * self.topk_cap):
            self._compact()

    def _compact(self) -> None:
        """Vectorized merge of pending (values, counts) arrays; spills
        to HLL + capped heavy-hitters when distincts exceed unique_cap."""
        import pandas as pd

        if not self.vc_values:
            return
        vals = np.concatenate(self.vc_values)
        cnts = np.concatenate(self.vc_counts).astype(np.int64)
        s = pd.Series(cnts).groupby(pd.Series(vals), sort=False).sum()
        vals, cnts = s.index.to_numpy(), s.to_numpy()
        if self.hll is None and len(vals) > self.unique_cap:
            self.hll = HyperLogLog()
            self.hll.add_hashes(_hash_values(vals))
        if self.hll is not None and len(vals) > self.topk_cap // 2:
            # keep heaviest entries; tie-break (count desc, str value asc)
            order = np.lexsort((np.asarray(vals).astype(str), -cnts))
            keep = order[: self.topk_cap // 2]
            vals, cnts = vals[keep], cnts[keep]
            self.counts_overflow = True
        self.vc_values = [vals]
        self.vc_counts = [cnts]
        self.vc_pending = len(vals)

    def _append_values(self, vals: np.ndarray) -> None:
        self.values.append(vals)
        self.values_w.append(None)
        self.values_n += len(vals)
        if self.values_n > self.values_cap:
            self._subsample_values()

    def _subsample_values(self) -> None:
        # deterministic stride subsample of the sorted buffer → mergeable
        # approximate quantiles with rank error ~ represented-rows/cap.
        # Each kept point carries the SUMMED weight of the points it
        # replaces, so buffers subsampled at different strides merge at
        # their true rank weight — an unweighted concat would overweight
        # exact buffers (sorted/clustered layouts, ADVICE r1).
        allv = np.concatenate(self.values)
        wts = np.concatenate([
            np.ones(len(v)) if w is None else w
            for v, w in zip(self.values, self.values_w)])
        order = np.argsort(allv, kind="stable")
        allv, wts = allv[order], wts[order]
        csum = np.concatenate(([0.0], np.cumsum(wts)))
        total = csum[-1]
        k = max(2, self.values_cap // 2)
        # equal-WEIGHT groups (not equal point count): group boundaries
        # at every total/k of cumulative weight, kept point = the
        # group's weight-median. This keeps max group weight ~ total/k
        # no matter how many merge/resubsample rounds ran — equal-POINT
        # groups let early (already-coarse) regions coarsen geometrically
        # under sorted layouts, growing rank error far past 1/cap.
        bounds = np.arange(k, dtype=np.float64) * (total / k)
        starts = np.unique(np.searchsorted(csum[1:], bounds, side="right"))
        starts = starts[starts < len(allv)]
        ends = np.concatenate((starts[1:], [len(allv)]))
        group_w = csum[ends] - csum[starts]
        mid = np.searchsorted(csum[1:], csum[starts] + group_w / 2.0)
        mid = np.clip(mid, starts, ends - 1)
        self.values = [allv[mid]]
        self.values_w = [group_w]
        self.values_n = len(starts)
        self.values_exact = False

    def _merge_moments(self, n2: int, mean2: float, m22: float) -> None:
        if n2 == 0:
            return
        n1, mean1, m21 = self.num_n, self.mean, self.m2
        n = n1 + n2
        delta = mean2 - mean1
        self.mean = mean1 + delta * n2 / n
        self.m2 = m21 + m22 + delta * delta * n1 * n2 / n
        self.num_n = n

    # ---------- merge ----------
    def merge(self, o: "ColumnPartial") -> "ColumnPartial":
        self.n += o.n
        self.nulls += o.nulls
        self._merge_moments(o.num_n, o.mean, o.m2)
        for attr, fn in (("min_num", min), ("max_num", max), ("min_str", min), ("max_str", max)):
            a, b = getattr(self, attr), getattr(o, attr)
            setattr(self, attr, b if a is None else (a if b is None else fn(a, b)))
        # distinct + mode: concatenate pending arrays; reconcile HLLs.
        # If either side already spilled, the union must be in ONE hll:
        # fold the exact side's distincts (its pending values) in.
        if self.hll is None and o.hll is not None:
            self._compact()
            self.hll = HyperLogLog()
            if self.vc_values and len(self.vc_values[0]):
                self.hll.add_hashes(_hash_values(self.vc_values[0]))
        if self.hll is not None:
            if o.hll is not None:
                self.hll.merge(o.hll)
            else:
                for v in o.vc_values:
                    if len(v):
                        self.hll.add_hashes(_hash_values(v))
        self.vc_values.extend(o.vc_values)
        self.vc_counts.extend(o.vc_counts)
        self.vc_pending += o.vc_pending
        self.counts_overflow |= o.counts_overflow
        if self.vc_pending > max(self.unique_cap // 2, 4 * self.topk_cap):
            self._compact()
        # quantile values
        self.values.extend(o.values)
        self.values_w.extend(o.values_w)
        self.values_n += o.values_n
        self.values_exact &= o.values_exact
        if self.values_n > self.values_cap:
            self._subsample_values()
        self.has_int |= o.has_int
        self.has_float |= o.has_float
        self.has_str |= o.has_str
        self.has_datetime |= o.has_datetime
        return self

    # ---------- finalize ----------
    def finalize(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "column": self.name,
            "kind": self.kind,
            "n": self.n,
            "nulls": self.nulls,
            "mean": None, "std": None, "min": None, "max": None,
            "q25": None, "q50": None, "q75": None,
            "unique": None, "top": None, "freq": None,
            "min_str": self.min_str, "max_str": self.max_str,
            "inferred_type": self.inferred_type(),
        }
        if self.kind == "numeric" and self.num_n:
            out["mean"] = self.mean
            out["std"] = math.sqrt(max(0.0, self.m2 / self.num_n))
            out["min"] = self.min_num
            out["max"] = self.max_num
            if self.values:
                if all(w is None for w in self.values_w):
                    # exact path — bit-identical to percentile_cont
                    allv = np.sort(np.concatenate(self.values))
                    out["q25"] = _quantile_cont(allv, 0.25)
                    out["q50"] = _quantile_cont(allv, 0.50)
                    out["q75"] = _quantile_cont(allv, 0.75)
                else:
                    allv = np.concatenate(self.values)
                    wts = np.concatenate([
                        np.ones(len(v)) if w is None else w
                        for v, w in zip(self.values, self.values_w)])
                    order = np.argsort(allv, kind="stable")
                    allv, wts = allv[order], wts[order]
                    out["q25"] = _quantile_cont_weighted(allv, wts, 0.25)
                    out["q50"] = _quantile_cont_weighted(allv, wts, 0.50)
                    out["q75"] = _quantile_cont_weighted(allv, wts, 0.75)
        self._compact()
        if self.hll is not None:
            out["unique"] = self.hll.estimate()
        elif self.vc_values:
            out["unique"] = len(self.vc_values[0])
        if self.vc_values and len(self.vc_values[0]):
            vals, cnts = self.vc_values[0], self.vc_counts[0]
            top_c = cnts.max()
            ties = vals[cnts == top_c]
            # tie-break: smallest value — natively for numerics (matches
            # SQL ORDER BY cnt DESC, v ASC), lexicographic for strings
            if len(ties) > 1:
                top_v = min(ties) if self.kind in ("numeric", "timestamp") \
                    else min(ties, key=str)
            else:
                top_v = ties[0]
            out["top"] = _ts_iso(top_v) if self.kind == "timestamp" else str(top_v)
            out["freq"] = int(top_c)
        return out

    def inferred_type(self) -> str:
        """Promotion lattice of the exact engines (simple_engine.go:262-270):
        int iff only ints; float if only ints/floats; else string —
        extended (additively; see DT_FORMATS) with datetime iff EVERY
        non-blank value is a validated datetime (a numeric/datetime mix
        stays string: no meaningful promotion joins them)."""
        if self.kind == "numeric":
            return "float" if self.has_float else "int"
        if self.has_str:
            return "string"
        if self.has_datetime:
            return "string" if (self.has_int or self.has_float) \
                else "datetime"
        if self.has_float:
            return "float"
        if self.has_int:
            return "int"
        return self.kind

    def dumps(self) -> bytes:
        return pickle.dumps(self)


def _ts_iso(v) -> str:
    """'%Y-%m-%d %H:%M:%S' of one timestamp (matches DuckDB strftime)."""
    import pandas as pd

    return pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S")


def _hash_values(vals: np.ndarray) -> np.ndarray:
    """Deterministic vectorized 64-bit hashes (pandas siphash with the
    fixed default key — process-independent, unlike Python hash())."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(vals), categorize=False)


def _quantile_cont_weighted(vals: np.ndarray, wts: np.ndarray,
                            q: float) -> float | None:
    """percentile_cont generalized to weighted points: point i (sorted
    by value) occupies ranks [cum_{i-1}, cum_i) and sits at the center
    of its span; interpolate at rank q*(n-1). With all weights 1 this
    reduces exactly to ``_quantile_cont``."""
    n = float(wts.sum())
    if n <= 0 or len(vals) == 0:
        return None
    r = q * (n - 1)
    cw = np.cumsum(wts)
    centers = cw - (wts + 1) / 2.0          # 0-indexed rank of each point
    j = int(np.searchsorted(centers, r))
    if j <= 0:
        return float(vals[0])
    if j >= len(vals):
        return float(vals[-1])
    c0, c1 = centers[j - 1], centers[j]
    f = (r - c0) / (c1 - c0) if c1 > c0 else 0.0
    return float(vals[j - 1] * (1 - f) + vals[j] * f)


def _quantile_cont(sorted_vals: np.ndarray, q: float) -> float:
    """SQL percentile_cont linear interpolation (same formula as the
    reference's interpolator, simple_engine.go:344-364)."""
    n = len(sorted_vals)
    if n == 0:
        return float("nan")
    pos = (n - 1) * q
    k = int(math.floor(pos))
    f = pos - k
    if k + 1 < n:
        return float(sorted_vals[k] * (1 - f) + sorted_vals[k + 1] * f)
    return float(sorted_vals[k])


def partials_for_table(
    batch: pa.Table, columns: list[str] | None = None,
    caps: dict | None = None,
) -> dict[str, ColumnPartial]:
    """Build per-column partials for one Arrow batch. `caps` overrides
    the exactness caps (profiler sketch mode)."""
    cols = columns or batch.column_names
    out = {}
    for name in cols:
        arr = batch[name]
        p = ColumnPartial(name=name, kind=column_kind(arr.type), **(caps or {}))
        if p.kind == "numeric":
            p.has_int = pa.types.is_integer(arr.type)
            p.has_float = pa.types.is_floating(arr.type)
        p.update(arr)
        out[name] = p
    return out


def merge_partial_maps(maps: list[dict[str, ColumnPartial]]) -> dict[str, ColumnPartial]:
    if not maps:
        return {}
    acc = maps[0]
    for m in maps[1:]:
        for name, p in m.items():
            if name in acc:
                acc[name].merge(p)
            else:
                acc[name] = p
    return acc
