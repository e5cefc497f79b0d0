"""Text embedding encoder stage (SURVEY.md M9).

The reference wraps a timm CNN that is loaded once and applied
per-image batch (/root/reference/fastdup/embeddings_timm.py:31-154:
load model once, loop batches, forward, stack). The text analog here is
an actor-pool `map_batches` stage whose per-actor state is the encoder
itself; the encoder is a deterministic hashed n-gram random projection:

    text -> hashed char-3-gram counts (2^16 buckets, own-code hash)
         -> L2-normalized counts @ seeded Gaussian projection (dim d)

No model libraries are needed, outputs are deterministic for a given
(seed, dim), and near-identical texts land near each other in cosine
space — which is what every downstream consumer (ANN, IVF, cosine
dedup, search index) actually needs from the column. A real model
encoder drops in by replacing `_encode` only; the Ray plumbing
(actor-pool stage, Arrow in/out, fixed-size-list output) is the part
this module exercises.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BUCKETS = 1 << 16
_FNV_PRIME = np.uint64(0x100000001B3)
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)

# T4 analog (reference captions.py:8 `device_to_captioner`,
# fastdup_controller.py:1388-1426): model weights cached per worker
# process, keyed by config — every stage in the same process (embed,
# zero-shot, search ingest) shares ONE copy of the 32 MB projection
# instead of re-deriving it per actor instance.
_PROJECTION_CACHE: dict[tuple, np.ndarray] = {}


def get_projection(dim: int, seed: int, weights: str = "gaussian") -> np.ndarray:
    """(buckets, dim) projection for (dim, seed), memoized per process.

    weights="gaussian": PCG64 standard normal (default).
    weights="hash_sign": Rademacher +-1 entries from the low bit of
    mix64((bucket*dim + j) ^ seed) — an equally valid JL/random
    projection (Achlioptas 2003) whose every entry is bit-exactly
    reproducible in SQL via the same fmix64 CTE chain that pins
    shuffle_positions / hll_distinct_grams, making the whole encoder
    DuckDB-oracle-able (sql_hash.sql_doc_embeddings)."""
    key = (weights, dim, seed)
    proj = _PROJECTION_CACHE.get(key)
    if proj is None:
        if weights == "gaussian":
            rng = np.random.default_rng(seed)
            proj = rng.standard_normal((_BUCKETS, dim)).astype(np.float64)
        elif weights == "hash_sign":
            from fastdup_ray.functions.hashing import mix64

            idx = np.arange(_BUCKETS * dim, dtype=np.uint64)
            h = mix64(idx ^ np.uint64(seed))
            proj = np.where(
                (h & np.uint64(1)).astype(bool), 1.0, -1.0
            ).reshape(_BUCKETS, dim)
        else:
            raise ValueError(f"unknown weights mode {weights!r}")
        _PROJECTION_CACHE[key] = proj
    return proj


class TextEmbedStage:
    """Callable class for `map_batches(TextEmbedStage, concurrency=N,
    batch_format="pyarrow")`: setup (projection matrix) once per actor in
    __init__, vectorized encode per batch in __call__.

    Output: input columns minus `text_col`, plus `embedding:
    fixed_size_list<double>[dim]`.
    """

    def __init__(self, dim: int = 64, seed: int = 42, *,
                 text_col: str = "text", keep_text: bool = False,
                 weights: str = "gaussian"):
        self.dim = dim
        self.text_col = text_col
        self.keep_text = keep_text
        # (buckets, dim) projection — the "model weights",
        # shared per process via the T4 cache
        self.proj = get_projection(dim, seed, weights)

    def _encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float64)
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode("utf-8", "ignore"), np.uint8)
            if b.shape[0] < 3:
                continue
            # vectorized FNV-1a over all char-3-gram windows
            h = np.full(b.shape[0] - 2, _FNV_OFFSET)
            with np.errstate(over="ignore"):
                for k in range(3):
                    h ^= b[k : b.shape[0] - 2 + k].astype(np.uint64)
                    h *= _FNV_PRIME
            buckets, counts = np.unique(
                (h % np.uint64(_BUCKETS)).astype(np.int64), return_counts=True
            )
            v = counts.astype(np.float64)
            v /= np.linalg.norm(v)
            out[i] = v @ self.proj[buckets]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        m = self._encode([t or "" for t in texts])
        flat = pa.array(m.reshape(-1), pa.float64())
        emb = pa.FixedSizeListArray.from_arrays(flat, self.dim)
        keep = [
            c for c in batch.column_names
            if self.keep_text or c != self.text_col
        ]
        out = batch.select(keep)
        return out.append_column("embedding", emb)


def embed_documents(docs, *, dim: int = 64, seed: int = 42,
                    concurrency: int = 8, batch_size: int = 1024,
                    weights: str = "gaussian"):
    """docs (doc_id, text, ...) -> (doc_id, ..., embedding) via an
    actor pool (the M9 analog: encoder state lives once per actor).

    concurrency is the pool CEILING — passed as (1, N): a fixed pool of
    N reserves N CPUs up front and deadlock-starves the upstream read
    when N >= the cluster's CPU count (observed: 4 actors on a 4-CPU
    test session hangs the pipeline)."""
    return docs.map_batches(
        TextEmbedStage,
        fn_constructor_kwargs={"dim": dim, "seed": seed, "weights": weights},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        batch_size=batch_size,
    )
