"""Online near-duplicate search — the analog of the reference's
init_search()/search() flow (reference __init__.py:2056-2303: module-global
state + a persisted NNF index, queried per image; SURVEY.md T3/G8).

Here the "index" is the LSH band table of an indexed corpus held by
long-lived NAMED Ray actors: band-bucket -> doc_id lists plus the minhash
signature matrix for verification. Queries shingle + sign the query text,
probe its 16 band buckets, and rank candidates by estimated Jaccard —
O(candidates), no corpus scan.

Scale design:
- Ingestion is VECTORIZED: `add_batch` only appends numpy arrays; the
  bucket table is built lazily as a CSR structure (sorted bucket keys +
  offsets + doc ids) on first query — no per-row Python dict work.
- Sharding: `build_search_index(num_shards=K)` routes band entries by
  `bucket % K` to an actor pool (`ShardedSearchIndex` facade). A doc's
  signature row is replicated only to shards holding at least one of its
  band entries. Queries fan out to all shards and merge top-k; per-doc
  estimates are identical across shards (same signature), so the merge
  is an exact dedup + re-rank and results equal the single-shard index.
"""

from __future__ import annotations

import numpy as np

import ray

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.minhash import MinHasher, band_buckets


class _IndexCore:
    """Shared vectorized index logic (used inside each actor)."""

    def __init__(self, cfg: DedupConfig, shard_id: int = 0, num_shards: int = 1):
        self.cfg = cfg
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.mh = MinHasher(cfg.shingle_size, cfg.num_perms, cfg.seed)
        self._bk_parts: list[np.ndarray] = []   # band-entry bucket keys
        self._bid_parts: list[np.ndarray] = []  # band-entry doc ids
        self._sid_parts: list[np.ndarray] = []  # signature-store doc ids
        self._sig_parts: list[np.ndarray] = []  # signature-store rows
        self._csr = None
        self.n_docs = 0

    def add(self, ids: np.ndarray, sig: np.ndarray) -> int:
        bk = band_buckets(sig, self.cfg.num_bands, self.cfg.rows_per_band)
        flat_b = bk.ravel().astype(np.int64)
        flat_d = np.repeat(ids, self.cfg.num_bands)
        if self.num_shards > 1:
            # this shard owns band entries with bucket % num_shards == shard_id
            mine = (flat_b % self.num_shards) == self.shard_id
            flat_b, flat_d = flat_b[mine], flat_d[mine]
            local = np.isin(ids, np.unique(flat_d))
            ids, sig = ids[local], sig[local]
        if flat_b.shape[0]:
            self._bk_parts.append(flat_b)
            self._bid_parts.append(flat_d)
        if ids.shape[0]:
            self._sid_parts.append(ids)
            self._sig_parts.append(sig)
        self._csr = None
        self.n_docs += int(ids.shape[0])
        return self.n_docs

    def _build(self):
        if self._csr is not None:
            return self._csr
        if not self._bk_parts:
            self._csr = (np.empty(0, np.int64), np.zeros(1, np.int64),
                         np.empty(0, np.int64), np.empty(0, np.int64),
                         np.empty((0, self.cfg.num_perms), np.uint32))
            return self._csr
        b = np.concatenate(self._bk_parts)
        d = np.concatenate(self._bid_parts)
        order = np.argsort(b, kind="stable")
        b, d = b[order], d[order]
        new = np.ones(b.shape[0], dtype=bool)
        new[1:] = b[1:] != b[:-1]
        keys = b[new]
        offs = np.append(np.nonzero(new)[0], b.shape[0]).astype(np.int64)
        sid = np.concatenate(self._sid_parts)
        sig = np.concatenate(self._sig_parts)
        so = np.argsort(sid, kind="stable")
        # dedup repeated doc ids (re-adds): keep first occurrence
        sid, sig = sid[so], sig[so]
        first = np.ones(sid.shape[0], dtype=bool)
        first[1:] = sid[1:] != sid[:-1]
        self._csr = (keys, offs, d, sid[first], sig[first])
        return self._csr

    def query_sig(self, sig: np.ndarray, k: int) -> list[tuple[int, float]]:
        keys, offs, docs, sid, smat = self._build()
        if keys.shape[0] == 0:
            return []
        bk = band_buckets(
            sig[None, :], self.cfg.num_bands, self.cfg.rows_per_band
        )[0].astype(np.int64)
        if self.num_shards > 1:
            bk = bk[(bk % self.num_shards) == self.shard_id]
        pos = np.searchsorted(keys, bk)
        pos_c = np.clip(pos, 0, keys.shape[0] - 1)
        hit = keys[pos_c] == bk
        cand_parts = [
            docs[offs[p] : offs[p + 1]] for p in pos_c[hit]
        ]
        if not cand_parts:
            return []
        cand = np.unique(np.concatenate(cand_parts))
        rows = np.searchsorted(sid, cand)
        rows = np.clip(rows, 0, sid.shape[0] - 1)
        ok = sid[rows] == cand
        cand, rows = cand[ok], rows[ok]
        if cand.shape[0] == 0:
            return []
        est = (smat[rows] == sig[None, :]).mean(axis=1)
        order = np.lexsort((cand, -est))[:k]
        return [(int(cand[i]), float(est[i])) for i in order]

    def stats(self) -> dict:
        keys, offs, docs, sid, _ = self._build()
        return {
            "n_docs": self.n_docs,
            "n_buckets": int(keys.shape[0]),
            "max_bucket": int(np.diff(offs).max()) if keys.shape[0] else 0,
        }


@ray.remote
class SearchIndex:
    """Holds (a shard of) band tables + signatures of an indexed corpus."""

    def __init__(self, config_dict: dict | None = None, shard_id: int = 0,
                 num_shards: int = 1):
        cfg = DedupConfig.from_dict(config_dict or {})
        self.core = _IndexCore(cfg, shard_id, num_shards)

    def add_batch(self, doc_ids, sig_matrix) -> int:
        return self.core.add(
            np.asarray(doc_ids, dtype=np.int64),
            np.asarray(sig_matrix, dtype=np.uint32),
        )

    def query_text(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        sig, n_sh = self.core.mh.signatures([text])
        if n_sh[0] == 0:
            return []
        return self.core.query_sig(sig[0], k)

    def query_signature(self, sig_row, k: int = 10) -> list[tuple[int, float]]:
        return self.core.query_sig(np.asarray(sig_row, dtype=np.uint32), k)

    def stats(self) -> dict:
        return self.core.stats()


class ShardedSearchIndex:
    """Driver-side facade over `num_shards` SearchIndex actors, routed by
    `bucket % num_shards`. Query results are identical to a single-shard
    index (same signatures, exact top-k merge)."""

    def __init__(self, config: DedupConfig, num_shards: int,
                 name: str | None = None):
        self.cfg = config
        self.num_shards = num_shards
        self.mh = MinHasher(config.shingle_size, config.num_perms, config.seed)
        self.actors = []
        for s in range(num_shards):
            kwargs = (
                {"name": f"{name}-shard{s}", "lifetime": "detached"} if name else {}
            )
            self.actors.append(
                SearchIndex.options(**kwargs).remote(config.to_dict(), s, num_shards)
            )

    def add_batch(self, doc_ids, sig_matrix):
        return [
            a.add_batch.remote(doc_ids, sig_matrix) for a in self.actors
        ]

    def query_text(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        sig, n_sh = self.mh.signatures([text])
        if n_sh[0] == 0:
            return []
        return self.query_signature(sig[0], k)

    def query_signature(self, sig_row, k: int = 10) -> list[tuple[int, float]]:
        sig = np.asarray(sig_row, dtype=np.uint32)
        parts = ray.get([a.query_signature.remote(sig, k) for a in self.actors])
        merged: dict[int, float] = {}
        for part in parts:
            for did, est in part:
                merged[did] = est  # identical across shards by construction
        ranked = sorted(merged.items(), key=lambda t: (-t[1], t[0]))[:k]
        return [(int(d), float(e)) for d, e in ranked]

    def stats(self) -> dict:
        parts = ray.get([a.stats.remote() for a in self.actors])
        return {
            "n_docs": max(p["n_docs"] for p in parts),
            "n_buckets": sum(p["n_buckets"] for p in parts),
            "max_bucket": max(p["max_bucket"] for p in parts),
            "shards": parts,
        }


def build_search_index(signatures, config: DedupConfig | None = None, *,
                       name: str | None = None, num_shards: int = 1):
    """Feed a signatures Dataset (doc_id, minhash, ...) into a (named)
    SearchIndex actor (num_shards=1) or a ShardedSearchIndex pool."""
    from fastdup_ray.stages.signatures import signatures_to_matrix

    cfg = config or DedupConfig()
    if num_shards > 1:
        idx = ShardedSearchIndex(cfg, num_shards, name=name)
        pending = []
        for batch in signatures.iter_batches(batch_size=8192, batch_format="pyarrow"):
            ids, sig = signatures_to_matrix(batch)
            pending.extend(idx.add_batch(ids, sig))
        if pending:
            ray.get(pending)
        return idx
    kwargs = {"name": name, "lifetime": "detached"} if name else {}
    actor = SearchIndex.options(**kwargs).remote(cfg.to_dict())
    pending = []
    for batch in signatures.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids, sig = signatures_to_matrix(batch)
        pending.append(actor.add_batch.remote(ids, sig))
    if pending:
        ray.get(pending)
    return actor
