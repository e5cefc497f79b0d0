"""Pair verification: candidate (src,dst) pairs -> (src, dst, distance).

The reference's engine computes true cosine distance for every candidate
pair and writes `similarity.csv` (from,to,distance, RUN.md:43-55). Here
`distance` is Jaccard similarity over char-k-gram shingles, via one of:

- "signature": estimated from the 128-perm MinHash signatures (matching
  fraction of rows). No access to text; two hash joins pairs<->signatures.
- "exact": true shingle-set Jaccard, re-shingling both texts. Two hash
  joins pairs<->docs(text). Costlier (ships text once per pair side) but
  exact — the mode the >=0.99-recall oracle tests run, since a 128-perm
  estimate has ~+-0.02 noise right at the 0.96 component threshold.

Both modes are Ray `Dataset.join` hash joins partitioned on doc_id —
the pair side is LSH-candidate-sized (<< corpus^2), so the joins are
linear in candidates + corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.minhash import exact_jaccard_pairs
from fastdup_ray.relational.ops import hash_join
from fastdup_ray.stages.signatures import signatures_to_matrix


def _est_jaccard_batch(cfg: DedupConfig):
    def fn(batch: pa.Table) -> pa.Table:
        _, sig_a = signatures_to_matrix(
            pa.table({"doc_id": batch["src"], "minhash": batch["minhash"]})
        )
        _, sig_b = signatures_to_matrix(
            pa.table({"doc_id": batch["dst"], "minhash": batch["minhash_r"]})
        )
        dist = (sig_a == sig_b).mean(axis=1)
        return pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "distance": pa.array(dist, pa.float64()),
            }
        )

    return fn


def _exact_jaccard_batch(cfg: DedupConfig):
    k = cfg.shingle_size

    def fn(batch: pa.Table) -> pa.Table:
        dist = exact_jaccard_pairs(
            batch["text"].to_pylist(), batch["text_r"].to_pylist(), k
        )
        return pa.table(
            {
                "src": batch["src"],
                "dst": batch["dst"],
                "distance": pa.array(dist, pa.float64()),
            }
        )

    return fn


def verify_pairs(pairs, signatures, docs, config: DedupConfig | None = None):
    """Attach `distance` to each candidate pair.

    pairs: Dataset (src, dst); signatures: Dataset (doc_id, minhash, ...);
    docs: Dataset with (doc_id, text) — only consulted in exact mode.
    """
    cfg = config or DedupConfig()
    np_parts = cfg.num_partitions
    from fastdup_ray.relational.ops import with_schema

    pairs = pairs.materialize()
    if pairs.count() == 0:
        from fastdup_ray.relational.ops import empty_typed

        return empty_typed(
            {"src": pa.int64(), "dst": pa.int64(), "distance": pa.float64()}
        )
    pairs = with_schema(pairs, {"src": pa.int64(), "dst": pa.int64()})
    if cfg.verify_mode == "signature":
        side = signatures.select_columns(["doc_id", "minhash"])
        joined = hash_join(
            pairs, side, on="src", right_on="doc_id", num_partitions=np_parts
        ).materialize()  # chained lazy joins trip acero field resolution in ray 2.49
        joined = with_schema(
            joined,
            {"src": pa.int64(), "dst": pa.int64(),
             "minhash": pa.list_(pa.uint32(), 128)},
        ).materialize()
        joined = hash_join(
            joined, side.rename_columns({"minhash": "minhash_r"}),
            on="dst", right_on="doc_id", num_partitions=np_parts,
        )
        return joined.map_batches(_est_jaccard_batch(cfg), batch_format="pyarrow")
    else:
        side = docs.select_columns(["doc_id", "text"])
        joined = hash_join(
            pairs, side, on="src", right_on="doc_id", num_partitions=np_parts
        ).materialize()  # see note above
        joined = with_schema(
            joined,
            {"src": pa.int64(), "dst": pa.int64(), "text": pa.string()},
        ).materialize()
        joined = hash_join(
            joined, side.rename_columns({"text": "text_r"}),
            on="dst", right_on="doc_id", num_partitions=np_parts,
        )
        return joined.map_batches(_exact_jaccard_batch(cfg), batch_format="pyarrow")
