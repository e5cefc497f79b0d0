"""64-bit SimHash fingerprints — the second Signer (SURVEY.md §7.1 M6).

Token-level SimHash: whitespace tokens are hashed to uint64, each hash
votes +-1 per bit position, the fingerprint's bit b is 1 iff the weighted
sum is positive. Near-duplicates have small Hamming distance between
fingerprints; candidate pairing buckets fingerprints on 16-bit quarters
(pigeonhole: hamming <= 3 implies at least one identical quarter).

Segment-vectorized like the MinHash kernel: one token-hash pass over the
batch, then `np.add.reduceat` per document over the 64 bit-columns.
"""

from __future__ import annotations

import numpy as np

from fastdup_ray.functions.hashing import hash64_segmented, string_bytes_view


def simhash64(texts) -> np.ndarray:
    """uint64 fingerprint per text. Empty/whitespace-only texts -> 0.

    Accepts a pyarrow string array (fast path) or a list of str. The whole
    batch is tokenized by Arrow's C utf8_split_whitespace kernel (Unicode
    whitespace, same class as str.split) and every token hashed in one
    segmented numpy pass over the shared bytes buffer — no per-token
    Python string is ever created.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(list(texts), type=pa.large_string())
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # list offsets -> raw (possibly empty-string) token counts per doc
    loff = np.asarray(toks.offsets, dtype=np.int64)
    raw_counts = np.diff(loff)
    flat = toks.values  # flat token string array (offset 0, freshly built)
    data, toff = string_bytes_view(flat)
    tok_lens = np.diff(toff)
    # Arrow's split emits empty tokens at edges / between whitespace runs;
    # str.split() does not — drop them (zero-length, so hashing them first
    # costs nothing).
    keep = tok_lens > 0
    h_all = hash64_segmented(data, toff)
    h = h_all[keep]
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), raw_counts)[keep]
    counts = np.bincount(doc_of_tok, minlength=n).astype(np.int64)
    if h.shape[0] == 0:
        return out
    # (N, 64) bit matrix via one C unpackbits pass (the 64 strided uint64
    # shifts this replaces cost ~1 s per 100k tokens); int32 so the
    # per-doc reduceat can't overflow at large token counts. Bit order is
    # unpackbits' byte-wise big-endian — any fixed order is fine, hamming
    # distances and quarter structure are order-invariant.
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int32)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    nonempty = counts > 0
    ones = np.add.reduceat(bits, offsets[nonempty], axis=0)
    # majority vote: bit set iff strictly more ones than zeros
    fp_bits = (2 * ones > counts[nonempty, None]).astype(np.uint64)
    fps = (fp_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = fps
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (vectorized popcount)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(np.uint8)
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_quarters(fp: np.ndarray) -> np.ndarray:
    """(n, 4) uint64 bucket keys: the four 16-bit quarters, tagged by index.

    Pigeonhole guarantee: two fingerprints within Hamming distance 3 share
    at least one untouched quarter, so they collide in >= 1 bucket.
    """
    fp = np.asarray(fp, dtype=np.uint64)
    qs = np.stack(
        [(fp >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)], axis=1
    )
    return qs + (np.arange(4, dtype=np.uint64)[None, :] << np.uint64(16))
