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

from ..functions import imagefake as IF


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
        import struct

        data = batch[self.bytes_col].to_pylist()
        w_meta = batch["w"].to_pylist() if "w" in batch.column_names else [None] * len(data)
        h_meta = batch["h"].to_pylist() if "h" in batch.column_names else [None] * len(data)
        n = len(data)
        err = np.full(n, None, dtype=object)
        dec_w = np.zeros(n, dtype=np.int32)
        dec_h = np.zeros(n, dtype=np.int32)
        bright = np.zeros(n, dtype=np.float64)
        contrast = np.zeros(n, dtype=np.float64)
        ahash = np.zeros(n, dtype=np.int64)
        groups: dict[tuple[int, int], list[int]] = {}
        for i, blob in enumerate(data):
            if blob is None or len(blob) < 9 or blob[:4] != IF.MAGIC:
                err[i] = "bad magic"
                continue
            code, w, h = struct.unpack("<BHH", blob[4:9])
            if code not in IF.CODE_FMTS:
                err[i] = f"unknown fmt code {code}"
                continue
            expected = 9 + w * h * 3
            if len(blob) != expected:
                err[i] = f"payload size {len(blob)} != {expected}"
                continue
            dec_w[i], dec_h[i] = w, h
            if self.validate_meta and w_meta[i] is not None and (
                w != w_meta[i] or h != h_meta[i]
            ):
                err[i] = f"meta {w_meta[i]}x{h_meta[i]} != decoded {w}x{h}"
                continue
            groups.setdefault((h, w), []).append(i)
        for (h, w), idxs in groups.items():
            k = len(idxs)
            stacked = np.empty((k, h, w, 3), dtype=np.uint8)
            for j, i in enumerate(idxs):
                stacked[j] = np.frombuffer(
                    data[i], dtype=np.uint8, count=h * w * 3, offset=9
                ).reshape(h, w, 3)
            # exact integer sums on the uint8 pixels (no float32
            # expansion — that full-pixel float copy was ~4x the
            # payload in memory traffic, the kernel's bandwidth cost
            # at full parallelism); mean/std from the exact sums in
            # float64: population std = sqrt(E[x^2] - E[x]^2)
            flat = stacked.reshape(k, -1)
            npix = flat.shape[1]
            s1 = flat.sum(axis=1, dtype=np.int64).astype(np.float64)
            s2 = np.einsum("ij,ij->i", flat, flat,
                           dtype=np.int64).astype(np.float64)
            mu = s1 / npix
            bright[idxs] = mu
            contrast[idxs] = np.sqrt(np.maximum(s2 / npix - mu * mu, 0.0))
            ys = (np.arange(8) * h // 8).clip(0, h - 1)
            xs = (np.arange(8) * w // 8).clip(0, w - 1)
            small = np.ascontiguousarray(
                stacked[:, ys[:, None], xs[None, :], :].astype(
                    np.float32).mean(axis=3).reshape(k, 64))
            # threshold means via per-row 1-D .mean(): the 2-D axis
            # reduction uses a different float32 summation order for
            # short rows, and an exact tie at the threshold then flips
            # a bit vs the per-image formulation (observed)
            thr = np.empty((k, 1), dtype=np.float32)
            for j in range(k):
                thr[j, 0] = small[j].mean()
            bits = small > thr
            # integer multiply+sum, NOT matmul: 2-D matmul on uint64
            # silently goes through float64 and loses low bits
            ahash[idxs] = (bits.astype(np.uint64) * IF._AHASH_POW2[None, :]
                           ).sum(axis=1).view(np.int64)
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
                arr, fmt = IF.decode_image(blob)
                out.append(IF.encode_image(
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
