"""Deterministic hashing primitives: stable 64-bit hashes, shingles,
MinHash, SimHash, rolling fingerprints.

All hashes are process-independent (no Python ``hash()``) so that
partials computed on different Ray workers agree. Vectorized with numpy
where the input is already array-shaped.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = np.uint64((1 << 61) - 1)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def stable_hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string (blake2b truncation)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "ignore")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "little")


def stable_hash64_array(texts) -> np.ndarray:
    """Vector of stable 64-bit hashes as int64 (two's complement)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if t is None:
            out[i] = 0
        else:
            out[i] = stable_hash64(str(t))
    return out.view(np.int64)


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct rolling FNV-1a hashes of all k-char shingles (uint64)."""
    b = text.lower().encode("utf-8", "ignore")
    if len(b) < k:
        b = b + b" " * (k - len(b))
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ arr[j : n + j].astype(np.uint64)) * _FNV_PRIME
    return np.unique(h)


def word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct hashes of word k-grams (uint64)."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.array([stable_hash64(g) for g in grams], dtype=np.uint64)
    )


class MinHasher:
    """num_perm-wise MinHash over uint64 shingle hash sets.

    Universal hashing h_i(x) = (a_i * x + b_i) mod p (p = 2^61 - 1),
    seeded deterministically; mergeable across batches/workers.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(MERSENNE61), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(MERSENNE61), num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 minhash signature of a shingle-hash set."""
        if len(shingles) == 0:
            return np.full(self.num_perm, int(MERSENNE61), dtype=np.uint64)
        x = (shingles & MERSENNE61)[:, None].astype(np.uint64)
        with np.errstate(over="ignore"):
            vals = (x * self.a[None, :] + self.b[None, :]) % MERSENNE61
        return vals.min(axis=0)

    def band_keys(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """Hash each of `bands` row-groups of the signature to one uint64
        LSH bucket key (band index folded in)."""
        rows = self.num_perm // bands
        keys = np.empty(bands, dtype=np.uint64)
        for bi in range(bands):
            chunk = sig[bi * rows : (bi + 1) * rows]
            h = _FNV_OFFSET ^ np.uint64(bi)
            with np.errstate(over="ignore"):
                for v in chunk:
                    h = (h ^ v) * _FNV_PRIME
            keys[bi] = h
        return keys


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash of a set of shingle hashes (unit weights)."""
    if len(shingles) == 0:
        return 0
    bits = ((shingles[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = bits.astype(np.int64).sum(axis=0) * 2 - len(shingles)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    # two's-complement int64 so the value fits Arrow int64 columns
    return int(np.array([out], dtype=np.uint64).view(np.int64)[0])


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.uint64(b) if np.isscalar(b) else np.asarray(b, dtype=np.uint64))
    # vectorized popcount via byte-table
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for shift in range(0, 64, 8):
        cnt += table[(x >> np.uint64(shift)) & np.uint64(0xFF)]
    return cnt


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two distinct-hash sets."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def rolling_fingerprints(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing document fingerprints: min rolling-hash per window of
    k-char shingle hashes (robust local fingerprints; public algorithm
    from Schleimer et al., SIGMOD 2003)."""
    h = char_shingle_hashes(text, k)
    # char_shingle_hashes returns the *sorted distinct* set; winnowing needs
    # positional order, so recompute positionally here.
    b = text.lower().encode("utf-8", "ignore")
    if len(b) < k:
        return np.array([stable_hash64(text)], dtype=np.uint64)
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ arr[j : n + j].astype(np.uint64)) * _FNV_PRIME
    if n <= window:
        return np.unique(h.min(keepdims=True))
    strides = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(strides.min(axis=1))
