"""Online near-duplicate search — the analog of the reference's
init_search()/search() flow (reference __init__.py:2056-2303: module-global
state + a persisted NNF index, queried per image; SURVEY.md T3/G8).

Here the "index" is the LSH band table of an indexed corpus, held by a
long-lived NAMED Ray actor (`SearchIndex`): band-bucket -> doc_id lists
plus the minhash signature matrix for verification. Queries shingle +
sign the query text, probe its 16 band buckets, and rank candidates by
estimated Jaccard — O(candidates), no corpus scan.

Scale note: a single actor holds the whole index in RAM (fine to ~10^8
docs at 512 B/doc of signature + dict overhead). Beyond that, shard by
`bucket % n_shards` across an actor pool — the query fans out to all
shards and merges top-k (documented extension point; the sandbox runs
one shard).
"""

from __future__ import annotations

import numpy as np

import ray

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.minhash import MinHasher, band_buckets


@ray.remote
class SearchIndex:
    """Holds band tables + signatures of an indexed corpus."""

    def __init__(self, config_dict: dict | None = None):
        self.cfg = DedupConfig.from_dict(config_dict or {})
        self.mh = MinHasher(self.cfg.shingle_size, self.cfg.num_perms, self.cfg.seed)
        self.buckets: dict[int, list[int]] = {}
        self.sig_rows: dict[int, np.ndarray] = {}
        self.n_docs = 0

    def add_batch(self, doc_ids, sig_matrix) -> int:
        """Index a batch: doc_ids int64[n], sig_matrix uint32[n, P]."""
        ids = np.asarray(doc_ids, dtype=np.int64)
        sig = np.asarray(sig_matrix, dtype=np.uint32)
        bk = band_buckets(sig, self.cfg.num_bands, self.cfg.rows_per_band)
        for i in range(ids.shape[0]):
            did = int(ids[i])
            self.sig_rows[did] = sig[i]
            for b in bk[i]:
                self.buckets.setdefault(int(b), []).append(did)
        self.n_docs += ids.shape[0]
        return self.n_docs

    def query_text(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, est_jaccard) for a query document."""
        sig, n_sh = self.mh.signatures([text])
        if n_sh[0] == 0:
            return []
        return self._query_sig(sig[0], k)

    def query_signature(self, sig_row, k: int = 10) -> list[tuple[int, float]]:
        return self._query_sig(np.asarray(sig_row, dtype=np.uint32), k)

    def _query_sig(self, sig: np.ndarray, k: int) -> list[tuple[int, float]]:
        bk = band_buckets(sig[None, :], self.cfg.num_bands, self.cfg.rows_per_band)[0]
        cand: set[int] = set()
        for b in bk:
            cand.update(self.buckets.get(int(b), ()))
        if not cand:
            return []
        ids = np.fromiter(cand, dtype=np.int64, count=len(cand))
        mat = np.stack([self.sig_rows[int(d)] for d in ids])
        est = (mat == sig[None, :]).mean(axis=1)
        order = np.lexsort((ids, -est))[:k]
        return [(int(ids[i]), float(est[i])) for i in order]

    def stats(self) -> dict:
        return {
            "n_docs": self.n_docs,
            "n_buckets": len(self.buckets),
            "max_bucket": max((len(v) for v in self.buckets.values()), default=0),
        }


def build_search_index(signatures, config: DedupConfig | None = None, *,
                       name: str | None = None):
    """Feed a signatures Dataset (doc_id, minhash, ...) into a (named)
    SearchIndex actor and return the handle."""
    from fastdup_ray.stages.signatures import signatures_to_matrix

    cfg = config or DedupConfig()
    kwargs = {"name": name, "lifetime": "detached"} if name else {}
    actor = SearchIndex.options(**kwargs).remote(cfg.to_dict())
    pending = []
    for batch in signatures.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids, sig = signatures_to_matrix(batch)
        pending.append(actor.add_batch.remote(ids, sig))
    if pending:
        ray.get(pending)
    return actor
