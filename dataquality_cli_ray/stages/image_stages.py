"""Multimodal (image / audio / video) stages — actor-pool
``map_batches`` over opaque ``binary`` columns with typed metadata.

The sandbox has no image/audio libraries, so the CODEC is the
deterministic fake in ``functions/imagefake.py`` (clearly marked); the
Ray-side plumbing — schema, batch sizing for wide binary rows, actor
signature, error quarantine, output layout — is real and tested.

Error quarantine mirrors the reference's per-file ``Error`` capture
(``internal/engine/simple_engine.go:49``, collected not fatal at
``cmd/describe.go:336-338``): a corrupt payload sets
``rule_decode_error`` + ``decode_err`` instead of failing the job.

Batch-size note (100 TB): rows carry the encoded payload, so
``batch_size`` for these stages must be small (64-256) to keep
batch × concurrency within worker heaps; callers pass it via
``map_batches(..., batch_size=...)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import imagecodec as IC
from ..functions import imagefake as IF

# per-worker scratch for DecodeImageStage's same-shape payload blocks,
# keyed by row width (bytes) — avoids a fresh multi-MB allocation (page
# faults + zeroing) per batch per shape group. SCRATCH_TARGET_BYTES
# bounds the rows processed per inner iteration so the slab stays
# cache-resident (see the kernel comment in DecodeImageStage).
import os as _os

SCRATCH_TARGET_BYTES = int(_os.environ.get("DQ_SCRATCH_TARGET_BYTES",
                                           1 << 20))
_SCRATCH: dict = {}


class DecodeImageStage:
    """Decode + validate payloads. Adds: rule_decode_error (bool),
    decode_err (string), dec_w/dec_h (int32), brightness, contrast
    (float64), ahash (int64 average-hash of the decoded pixels).

    Per-row header parsing is a (cheap) Python loop; the per-pixel work
    — brightness/contrast/ahash — is batched by grouping same-shape
    images into one (k, h, w, 3) stack per shape, so the numpy
    reductions amortize their per-call overhead across the group (a
    real JPEG decode would stay a per-row C call, but the feature
    kernels batch the same way). Values are identical to the per-image
    formulation.
    """

    def __init__(self, bytes_col: str = "bytes", validate_meta: bool = True):
        self.bytes_col = bytes_col
        self.validate_meta = validate_meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bytes_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        err = np.full(n, None, dtype=object)
        dec_w = np.zeros(n, dtype=np.int32)
        dec_h = np.zeros(n, dtype=np.int32)
        bright = np.zeros(n, dtype=np.float64)
        contrast = np.zeros(n, dtype=np.float64)
        ahash = np.zeros(n, dtype=np.int64)
        # header parse + validation fully vectorized over the Arrow
        # binary buffer — the previous to_pylist() materialized every
        # payload as a Python bytes object (an extra 2.5 KB/row copy +
        # allocator churn; this stage is the pipeline's largest
        # bandwidth consumer at full worker width, BASELINE.md).
        off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        bufs = col.buffers()
        offs = np.frombuffer(bufs[1], dtype=off_dt)[
            col.offset: col.offset + n + 1].astype(np.int64) if n else \
            np.zeros(1, dtype=np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
            else np.empty(0, dtype=np.uint8)
        start, lens = offs[:-1], offs[1:] - offs[:-1]
        notnull = np.ones(n, dtype=bool) if col.null_count == 0 else \
            np.asarray(col.is_valid())
        okhdr = notnull & (lens >= 9)
        err[np.flatnonzero(~okhdr)] = "bad magic"
        io = np.flatnonzero(okhdr)
        good = np.empty(0, dtype=np.int64)
        w_of = h_of = None
        if len(io):
            hdr = data[start[io][:, None] + np.arange(9)]
            magic = np.frombuffer(IF.MAGIC, dtype=np.uint8)
            m_ok = (hdr[:, :4] == magic).all(axis=1)
            err[io[~m_ok]] = "bad magic"
            code = hdr[:, 4].astype(np.int64)
            w = hdr[:, 5].astype(np.int64) | (hdr[:, 6].astype(np.int64) << 8)
            h = hdr[:, 7].astype(np.int64) | (hdr[:, 8].astype(np.int64) << 8)
            code_valid = np.zeros(256, dtype=bool)
            code_valid[list(IF.CODE_FMTS)] = True
            c_ok = code_valid[code]
            for j in np.flatnonzero(m_ok & ~c_ok):
                err[io[j]] = f"unknown fmt code {code[j]}"
            expected = 9 + w * h * 3
            s_ok = lens[io] == expected
            for j in np.flatnonzero(m_ok & c_ok & ~s_ok):
                err[io[j]] = f"payload size {lens[io[j]]} != {expected[j]}"
            parsed = m_ok & c_ok & s_ok
            dec_w[io[parsed]] = w[parsed]
            dec_h[io[parsed]] = h[parsed]
            meta_ok = np.ones(len(io), dtype=bool)
            if self.validate_meta and "w" in batch.column_names:
                wc, hc = batch["w"], batch["h"]
                # or-of-validity: a row with ANY non-null meta field is
                # checkable; its null field (filled with -1 below) can
                # never equal a decoded dimension, so it flags a
                # mismatch rather than silently passing
                have = np.asarray(
                    pa.compute.or_(wc.is_valid(), hc.is_valid()),
                    dtype=bool)
                wm = np.asarray(wc.cast(pa.int64()).fill_null(-1))
                hm = np.asarray(hc.cast(pa.int64()).fill_null(-1))
                mism = have[io] & ((w != wm[io]) | (h != hm[io]))
                for j in np.flatnonzero(parsed & mism):
                    err[io[j]] = (f"meta {wm[io[j]]}x{hm[io[j]]} "
                                  f"!= decoded {w[j]}x{h[j]}")
                meta_ok = ~mism
            gsel = parsed & meta_ok
            good = io[gsel]
            w_of, h_of = w[gsel], h[gsel]
        # group same-shape images; per-group pixel kernels amortize the
        # numpy call overhead (values identical to per-image form)
        shape_keys = (h_of * 65536 + w_of) if len(good) else \
            np.empty(0, dtype=np.int64)
        for key in np.unique(shape_keys):
            sel = shape_keys == key
            idxs = good[sel]
            h, w = int(key >> 16), int(key & 0xFFFF)
            k = len(idxs)
            hw3 = h * w * 3
            # per-row slice-copy into a reused CACHE-RESIDENT scratch
            # slab, processed ≤ ~256 KB of rows at a time: a 2-D
            # fancy-index gather materializes an int64 index array 8x
            # the payload (measured 10.6 vs 0.9 us/row), and a
            # whole-group scratch (MBs) spills to DRAM, turning its
            # write + two kernel reads into 3 extra shared-bus passes
            # over the payload — the bus, not CPU, sets the 8-vs-32
            # scaling ratio on one host (BASELINE.md round-4). Chunked,
            # the scratch stays in L2 and the only DRAM traffic is the
            # single payload read. The sum/einsum reductions use
            # numpy's buffered iteration (no int64 temp), and per-chunk
            # results are exact integer sums — bit-identical output.
            sub = max(1, SCRATCH_TARGET_BYTES // hw3)
            buf = _SCRATCH.get(hw3)
            rows_cap = min(k, sub)
            if buf is None or buf.shape[0] < rows_cap:
                if len(_SCRATCH) >= 16:   # bound worker memory across
                    _SCRATCH.clear()      # many distinct image shapes
                buf = np.empty((rows_cap, hw3), dtype=np.uint8)
                _SCRATCH[hw3] = buf
            npix = hw3
            ys = (np.arange(8) * h // 8).clip(0, h - 1)
            xs = (np.arange(8) * w // 8).clip(0, w - 1)
            # the same 8x8 pixel grid sample as the per-image form
            samp = ((ys[:, None] * w + xs[None, :]) * 3).reshape(-1)
            samp = (samp[:, None] + np.arange(3)).reshape(-1)
            starts9 = start[idxs] + 9
            for j0 in range(0, k, sub):
                j1 = min(j0 + sub, k)
                flat = buf[: j1 - j0]
                for j, s in enumerate(starts9[j0:j1]):
                    flat[j] = data[s: s + hw3]
                ids = idxs[j0:j1]
                # exact integer sums on the uint8 pixels (no float32
                # expansion); mean/std from the exact sums in float64:
                # population std = sqrt(E[x^2] - E[x]^2)
                s1 = flat.sum(axis=1, dtype=np.int64).astype(np.float64)
                s2 = np.einsum("ij,ij->i", flat, flat,
                               dtype=np.int64).astype(np.float64)
                mu = s1 / npix
                bright[ids] = mu
                contrast[ids] = np.sqrt(np.maximum(s2 / npix - mu * mu,
                                                   0.0))
                small = np.ascontiguousarray(
                    flat[:, samp].reshape(-1, 64, 3).astype(
                        np.float32).mean(axis=2).reshape(-1, 64))
                # threshold mean per row: on a CONTIGUOUS (k, 64)
                # float32 array the axis reduction uses the same
                # pairwise summation order as the per-image 1-D
                # .mean(), so this is bit-identical to the per-row
                # loop it replaced (~10 us/row of numpy call
                # overhead); pinned by
                # test_axis_mean_bit_identical_to_per_row
                thr = small.mean(axis=1, dtype=np.float32)[:, None]
                bits = small > thr
                # integer multiply+sum, NOT matmul: 2-D matmul on
                # uint64 silently goes through float64, losing low bits
                ahash[ids] = (bits.astype(np.uint64)
                              * IF._AHASH_POW2[None, :]
                              ).sum(axis=1).view(np.int64)
        # real-codec fallback (import-gated like the Lance reader): rows
        # the FIMG header parse rejected get one try through Pillow when
        # it's importable — absent in this sandbox, so the branch is a
        # no-op here; feature math mirrors the batched kernels exactly
        if IC.HAVE_PIL:
            for i in np.flatnonzero(
                    notnull & np.array([e is not None for e in err])):
                blob = data[start[i]: start[i] + lens[i]].tobytes()
                try:
                    arr, _fmt = IC.decode_rgb(blob)
                except Exception:
                    continue
                hh, ww = arr.shape[:2]
                if self.validate_meta and "w" in batch.column_names:
                    wv, hv = batch["w"][i].as_py(), batch["h"][i].as_py()
                    if (wv is not None or hv is not None) and (
                            wv != ww or hv != hh):
                        err[i] = (f"meta {-1 if wv is None else wv}x"
                                  f"{-1 if hv is None else hv}"
                                  f" != decoded {ww}x{hh}")
                        continue
                flat_i = arr.reshape(-1).astype(np.int64)
                npix_i = flat_i.size
                mu_i = flat_i.sum() / npix_i
                var_i = (flat_i * flat_i).sum() / npix_i - mu_i * mu_i
                dec_w[i], dec_h[i] = ww, hh
                bright[i] = mu_i
                contrast[i] = np.sqrt(max(var_i, 0.0))
                ahash[i] = IF.average_hash64(arr)
                err[i] = None
        bad = np.array([e is not None for e in err])
        out = batch.append_column("rule_decode_error", pa.array(bad))
        out = out.append_column("decode_err", pa.array(err, type=pa.string()))
        out = out.append_column("dec_w", pa.array(dec_w))
        out = out.append_column("dec_h", pa.array(dec_h))
        out = out.append_column("brightness", pa.array(bright))
        out = out.append_column("contrast", pa.array(contrast))
        out = out.append_column("ahash", pa.array(ahash))
        return out


class ResizeImageStage:
    """Re-encode every decodable image at (out_w, out_h) via
    nearest-neighbour resize; adds ``bytes_resized`` (null when the
    source is corrupt)."""

    def __init__(self, out_w: int, out_h: int, bytes_col: str = "bytes",
                 fmt_col: str = "fmt"):
        self.out_w, self.out_h = out_w, out_h
        self.bytes_col, self.fmt_col = bytes_col, fmt_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.bytes_col].to_pylist()
        out = []
        for blob in data:
            try:
                # codec dispatch: FIMG always; real formats when Pillow
                # is importable (imagecodec.HAVE_PIL)
                arr, fmt = IC.decode_rgb(blob)
                out.append(IC.encode_rgb(
                    IF.resize_nearest(arr, self.out_w, self.out_h), fmt))
            except Exception:
                out.append(None)
        return batch.append_column("bytes_resized", pa.array(out, type=pa.binary()))


class FrameSampleStage:
    """Video frame sampling over the deterministic fake container
    (``functions/imagefake.encode_video`` — swap ``IF.decode_video``
    for a real codec call when one is available; the explode shape,
    schema, quarantine and batch sizing stay the same).

    EXPLODES rows: one output row per sampled frame (frames 0, every_n,
    2*every_n, ...) with the frame re-encoded standalone plus its
    ahash; a corrupt container yields ONE quarantine row
    (frame_idx = -1, null bytes, decode_err set) so lineage keeps the
    video."""

    def __init__(self, every_n: int = 30, bytes_col: str = "bytes",
                 id_col: str = "video_id"):
        self.every_n = every_n
        self.bytes_col, self.id_col = bytes_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.bytes_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_idx, out_bytes, out_ahash = [], [], [], []
        out_n, out_fps, out_err = [], [], []
        for vid, blob in zip(ids, data):
            try:
                frames, fmt, fps = IF.decode_video(blob)
            except (IF.CorruptVideoError, IF.CorruptImageError) as e:
                out_id.append(vid); out_idx.append(-1)
                out_bytes.append(None); out_ahash.append(0)
                out_n.append(0); out_fps.append(0); out_err.append(str(e))
                continue
            for fi in range(0, len(frames), self.every_n):
                out_id.append(vid); out_idx.append(fi)
                out_bytes.append(IF.encode_image(frames[fi], fmt))
                out_ahash.append(IF.average_hash64(frames[fi]))
                out_n.append(len(frames)); out_fps.append(fps)
                out_err.append(None)
        return pa.table({
            self.id_col: pa.array(out_id),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame_bytes": pa.array(out_bytes, type=pa.binary()),
            "frame_ahash": pa.array(out_ahash, type=pa.int64()),
            "n_frames": pa.array(out_n, type=pa.int32()),
            "fps": pa.array(out_fps, type=pa.int32()),
            "decode_err": pa.array(out_err, type=pa.string()),
        })


class AudioFeatureStage:
    """Audio feature extraction — STUB with a deterministic fake: treats
    the payload as PCM s16le and emits rms/duration columns so the
    plumbing is testable without an audio library."""

    def __init__(self, bytes_col: str = "audio_bytes", sample_rate: int = 16000):
        self.bytes_col = bytes_col
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch[self.bytes_col].to_pylist()
        rms = np.zeros(len(data), dtype=np.float64)
        dur = np.zeros(len(data), dtype=np.float64)
        for i, blob in enumerate(data):
            if blob:
                x = np.frombuffer(blob[: len(blob) // 2 * 2], dtype=np.int16).astype(np.float64)
                if len(x):
                    rms[i] = float(np.sqrt(np.mean(x * x)))
                    dur[i] = len(x) / self.sample_rate
        out = batch.append_column("audio_rms", pa.array(rms))
        return out.append_column("audio_sec", pa.array(dur))
