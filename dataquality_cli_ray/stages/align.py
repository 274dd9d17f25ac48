"""Image-caption alignment scoring (CLIP-archetype quality filter).

LAION-style curation keeps an (image, caption) pair only when a
vision-language model scores them as matching (CLIP cosine >= ~0.28,
Schuhmann et al. 2021) — for web-scale image corpora this filter is as
load-bearing as langid or perplexity. No pretrained vision-language
model exists in this sandbox, so the two ENCODERS are deterministic
stand-ins (clearly labeled, same policy as the fake codec,
``functions/imagefake.py``):

- image tower: 4x4 RGB grid-mean signature (48-d, exact integer cell
  sums) -> fixed seeded projection -> L2 normalize;
- text tower: hashed-unigram bag (same word-split semantics as the
  corpus ops, ``functions/wordgrams.py``) -> per-bucket embedding-table
  gather + per-doc sum -> L2 normalize;
- align_score = cosine(image_emb, caption_emb).

The Ray-side plumbing is the real component and mirrors what a real
CLIP scorer needs: one fused ``map_batches`` stage (decode + both
towers + score; image bytes never re-enter the object store),
zero-copy Arrow binary-buffer access, the projection tables built once
per worker process (module-level cache — the tasks-over-actor-pools
convention, CLAUDE.md), undecodable rows quarantined with a null
score, and a threshold keep flag. Swap :func:`_towers` for real model
weights when an image library / checkpoint is available.

Batch invariance (required by the golden oracle): every per-row value
is computed from that row's own data only — ``einsum`` projections
(no BLAS blocking that varies with batch height), per-segment
``np.add.reduceat`` for caption sums, per-row dot for the cosine — so
scores are bit-identical under any batch split (tests/test_align.py).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import imagefake as IF
from ..functions.wordgrams import word_ngram_hashes_batch

GRID = 4
_FEAT = GRID * GRID * 3          # 48-d raw image signature
_TOWERS: dict = {}               # (d, buckets, seed) -> (p_img, p_txt)


def _towers(d: int, buckets: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed projection tables, built once per worker process.
    Stand-in for real model weights (see module docstring)."""
    key = (d, buckets, seed)
    p = _TOWERS.get(key)
    if p is None:
        if len(_TOWERS) >= 4:    # bound worker memory across configs
            _TOWERS.clear()
        rng = np.random.default_rng([seed, d, buckets])
        p_img = (rng.standard_normal((_FEAT, d)) / np.sqrt(_FEAT)
                 ).astype(np.float32)
        p_txt = (rng.standard_normal((buckets, d)) / np.sqrt(d)
                 ).astype(np.float32)
        _TOWERS[key] = p = (p_img, p_txt)
    return p


def caption_embed_batch(texts, d: int = 64, buckets: int = 4096,
                        seed: int = 4242) -> np.ndarray:
    """(n, d) L2-normalized caption embeddings (fake text tower).

    Hashed-unigram bag: each word hashes to one of ``buckets`` rows of
    the embedding table; the doc vector is the per-segment
    ``reduceat`` sum (independent of neighboring docs, so batch-split
    invariant). Word split = the corpus-ops convention
    (``word_ngram_hashes_batch``: lower, single-space split; the empty
    string is one empty word, so every doc has >= 1 unigram)."""
    _, p_txt = _towers(d, buckets, seed)
    hashes, offs = word_ngram_hashes_batch(texts, 1)
    n = len(offs) - 1
    counts = np.diff(offs)
    if len(hashes):
        b = (hashes & np.uint64(buckets - 1)).astype(np.int64)
        tok = p_txt[b]                              # (T, d) gather
        starts = offs[:-1].clip(max=len(hashes) - 1).astype(np.int64)
        sums = np.add.reduceat(tok, starts, axis=0)
        sums[counts == 0] = 0.0                     # guard (unigrams: none)
    else:
        sums = np.zeros((n, d), dtype=np.float32)
    norm = np.sqrt(np.einsum("ij,ij->i", sums, sums))
    return sums / np.maximum(norm, 1e-12)[:, None]


def _image_embed_batch(col, d: int, buckets: int, seed: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """((n, d) L2-normalized image embeddings, ok mask) — fake image
    tower over the FIMG payloads. Rows that fail the header parse get
    ok=False and a zero embedding. Binary-buffer access + same-shape
    grouping follow ``DecodeImageStage`` (image_stages.py:52-120);
    cell sums are exact int64, so the 48-d signature is bit-stable."""
    p_img, _ = _towers(d, buckets, seed)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    emb = np.zeros((n, d), dtype=np.float32)
    ok = np.zeros(n, dtype=bool)
    if n == 0:
        return emb, ok
    off_dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        col.offset: col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, dtype=np.uint8)
    start, lens = offs[:-1], offs[1:] - offs[:-1]
    notnull = np.ones(n, dtype=bool) if col.null_count == 0 else \
        np.asarray(col.is_valid())
    io = np.flatnonzero(notnull & (lens >= 9))
    if len(io) == 0:
        return emb, ok
    hdr = data[start[io][:, None] + np.arange(9)]
    magic = np.frombuffer(IF.MAGIC, dtype=np.uint8)
    code_valid = np.zeros(256, dtype=bool)
    code_valid[list(IF.CODE_FMTS)] = True
    w = hdr[:, 5].astype(np.int64) | (hdr[:, 6].astype(np.int64) << 8)
    h = hdr[:, 7].astype(np.int64) | (hdr[:, 8].astype(np.int64) << 8)
    parsed = ((hdr[:, :4] == magic).all(axis=1)
              & code_valid[hdr[:, 4]]
              & (lens[io] == 9 + w * h * 3) & (w > 0) & (h > 0))
    good, w_of, h_of = io[parsed], w[parsed], h[parsed]
    ok[good] = True
    shape_keys = h_of * 65536 + w_of
    for key in np.unique(shape_keys):
        sel = shape_keys == key
        idxs = good[sel]
        hh, ww = int(key >> 16), int(key & 0xFFFF)
        k, hw3 = len(idxs), hh * ww * 3
        flat = np.empty((k, hw3), dtype=np.uint8)
        for j, s in enumerate(start[idxs] + 9):
            flat[j] = data[s: s + hw3]
        px = flat.reshape(k, hh, ww, 3)
        if hh < GRID:      # tiny images: nearest-upsample to grid size
            px = np.repeat(px, -(-GRID // hh), axis=1)
            hh = px.shape[1]
        if ww < GRID:
            px = np.repeat(px, -(-GRID // ww), axis=2)
            ww = px.shape[2]
        yb = (np.arange(GRID) * hh) // GRID
        xb = (np.arange(GRID) * ww) // GRID
        # exact integer cell sums: reduceat over rows then cols
        rs = np.add.reduceat(px, yb, axis=1, dtype=np.int64)
        cs = np.add.reduceat(rs, xb, axis=2)        # (k, G, G, 3)
        ycnt = np.diff(np.append(yb, hh))
        xcnt = np.diff(np.append(xb, ww))
        area = (ycnt[:, None] * xcnt[None, :]).astype(np.float32)
        feat = (cs.astype(np.float32) / area[None, :, :, None]
                ).reshape(k, _FEAT)
        feat = (feat - np.float32(127.5)) / np.float32(127.5)
        e = np.einsum("ik,kj->ij", feat, p_img)     # no-BLAS projection
        norm = np.sqrt(np.einsum("ij,ij->i", e, e))
        emb[idxs] = e / np.maximum(norm, 1e-12)[:, None]
    return emb, ok


class CaptionAlignStage:
    """Fused decode + dual-tower + cosine stage for ``map_batches``
    (``batch_format="pyarrow"``). Adds ``align_score`` (float64, null
    when the image is undecodable) and ``keep_align`` (bool, false for
    undecodable rows). Stateless across batches; the projection tables
    live in the per-worker module cache."""

    def __init__(self, threshold: float = 0.0, d: int = 64,
                 buckets: int = 4096, seed: int = 4242,
                 bytes_col: str = "bytes", caption_col: str = "caption"):
        self.threshold = threshold
        self.d, self.buckets, self.seed = d, buckets, seed
        self.bytes_col, self.caption_col = bytes_col, caption_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        img, ok = _image_embed_batch(batch[self.bytes_col],
                                     self.d, self.buckets, self.seed)
        cap = caption_embed_batch(batch[self.caption_col],
                                  self.d, self.buckets, self.seed)
        score = np.einsum("ij,ij->i", img, cap).astype(np.float64)
        out = batch.append_column(
            "align_score", pa.array(score, type=pa.float64(), mask=~ok))
        return out.append_column(
            "keep_align", pa.array(ok & (score >= self.threshold)))
