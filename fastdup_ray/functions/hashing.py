"""Stable, vectorized hashing primitives shared by every stage.

All hashes here are pure functions of their input bytes (no process salt,
no wall clock), so stage outputs are reproducible across runs, workers and
parallelism levels — the property the reference lacks (its ids follow file
listing order, SURVEY.md §2.11) and that our resume-from-checkpoint and
parallelism-invariance tests rely on.
"""

from __future__ import annotations

import numpy as np

# 64-bit avalanche finalizer (splitmix64 / murmur3 fmix64 family).
_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit avalanche mix (fmix64). Input/output uint64."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _M1
    x ^= x >> np.uint64(33)
    x *= _M2
    x ^= x >> np.uint64(33)
    return x


def hash64_str(s: str) -> int:
    """Stable 64-bit hash of one string (scalar convenience wrapper)."""
    return int(hash64_strings([s])[0])


def id63(strings) -> np.ndarray:
    """Stable NON-NEGATIVE int64 id per string (doc_id = id63(url)).

    63-bit because Ray Data's shuffle/groupby machinery converts key
    columns through Python ints and chokes on uint64 values above 2^63
    (falls back to pickled object blocks). All grouping/join keys in this
    engine are therefore int64 with the sign bit clear.
    """
    return (hash64_strings(strings) >> np.uint64(1)).astype(np.int64)


def to_i63(h: np.ndarray) -> np.ndarray:
    """uint64 hash array -> non-negative int64 key array (drop one bit)."""
    return (np.asarray(h, dtype=np.uint64) >> np.uint64(1)).astype(np.int64)


def hash64_strings(strings) -> np.ndarray:
    """Stable uint64 hash of an array of strings, vectorized.

    Uses pandas' SipHash-1-3 C kernel (``pd.util.hash_array`` with its
    fixed default key) — deterministic across runs, processes and
    parallelism levels, and avalanche-mixed on top so truncations of the
    result are well distributed. Used for doc_id = hash64(url)
    (SURVEY.md §2.11) and for exact content-hash dedup keys.
    """
    import pandas as pd

    arr = np.asarray(strings, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return mix64(pd.util.hash_array(arr, categorize=False))


def _pow_u64(base: np.uint64, exp: np.ndarray) -> np.ndarray:
    """base**exp mod 2^64, vectorized over exp (uint64), by repeated squaring."""
    result = np.ones(exp.shape, dtype=np.uint64)
    b = np.uint64(base)
    e = exp.astype(np.uint64, copy=True)
    # wrapping mod-2^64 arithmetic is intentional here
    with np.errstate(over="ignore"):
        # max string length bounded by 2^40 for sanity
        for _ in range(40):
            if not e.any():
                break
            odd = (e & np.uint64(1)).astype(bool)
            result[odd] *= b
            e >>= np.uint64(1)
            b = b * np.uint64(b)
    return result


def rolling_shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """uint32 hashes of every k-byte window of ``data`` (len(data)-k+1 windows).

    Polynomial hash over a k-wide sliding window computed as a strided
    matrix-vector product in uint64 (wraps mod 2^64), then avalanche-mixed
    and truncated to 32 bits. Fully vectorized.
    """
    arr = np.frombuffer(data, dtype=np.uint8)
    n = arr.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint32)
    coef = _pow_u64(np.uint64(0x100000001B3), np.arange(k - 1, -1, -1, dtype=np.uint64))
    # accumulate the k-term polynomial without materializing an (n, k)
    # window matrix (k passes over an n-sized uint64 temp, O(n) memory)
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            h += arr[i : i + n].astype(np.uint64) * coef[i]
    return (mix64(h) >> np.uint64(32)).astype(np.uint32)


def segmented_shingle_hashes(texts, k: int):
    """Shingle-hash a batch of texts in one numpy pass.

    Returns (hashes: uint32[N_total], offsets: int64[n_docs+1]) where
    hashes[offsets[i]:offsets[i+1]] are doc i's k-gram hashes. Docs shorter
    than k get zero shingles. This is the hot kernel feeding MinHash; it
    avoids per-document numpy-call overhead by hashing the concatenated
    byte blob once and invalidating windows that straddle doc boundaries.
    """
    enc = [t.encode("utf-8") if isinstance(t, str) else bytes(t) for t in texts]
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), count=n, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.maximum(lens - (k - 1), 0), out=offsets[1:])
    total = int(lens.sum())
    if total < k:
        return np.empty(0, dtype=np.uint32), offsets
    blob = b"".join(enc)
    all_h = rolling_shingle_hashes(blob, k)  # windows at every byte position
    # keep only windows fully inside one doc: start position p belongs to doc i
    # if starts[i] <= p <= starts[i] + len_i - k
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    keep = np.zeros(all_h.shape[0], dtype=bool)
    for i in range(n):  # n = batch rows (~1k); cheap slicing loop, not per-byte
        m = lens[i] - k + 1
        if m > 0:
            keep[starts[i] : starts[i] + m] = True
    return all_h[keep], offsets
