"""SimHash near-duplicate candidate pairs (the second Signer path,
SURVEY.md §7.1 M6, mirroring G1 with Hamming distance instead of
Jaccard).

Candidates: two fingerprints within Hamming distance <= `max_hamming`
(default 3) share at least one untouched 16-bit quarter (pigeonhole), so
bucketing on the four tagged quarters and emitting intra-bucket pairs
has perfect recall for hamming <= 3. Verification computes the exact
Hamming distance from the signatures table (one hash join; the simhash
column rides along, no text needed).

Output: (src, dst, hamming, distance) where distance = 1 - hamming/64 —
a similarity in [0,1] comparable to the reference's cosine `distance`
column (RUN.md:43-55).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fastdup_ray.config import DedupConfig
from fastdup_ray.functions.simhash import hamming64, simhash_quarters
from fastdup_ray.relational.ops import distinct, hash_join, partitioned_groupby
from fastdup_ray.stages.lsh import make_emit_partition


class SimhashBandStage:
    """signatures batch -> (bucket, doc_id) rows, one per 16-bit quarter."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        q = simhash_quarters(fp)  # (n, 4) tagged quarter keys < 2^18
        n = ids.shape[0]
        return pa.table(
            {
                "bucket": pa.array(q.ravel().astype(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            }
        )


def simhash_candidate_pairs(signatures, config: DedupConfig | None = None):
    """signatures (doc_id, simhash, ...) -> verified pairs
    (src, dst, hamming, distance) with hamming <= cfg.simhash_hamming."""
    cfg = config or DedupConfig()
    band_rows = signatures.select_columns(["doc_id", "simhash"]).map_batches(
        SimhashBandStage(), batch_format="pyarrow"
    )
    pairs = partitioned_groupby(
        band_rows, "bucket", make_emit_partition(cfg.max_bucket_pairs),
        num_parts=cfg.num_partitions,
    )
    pairs = distinct(pairs, ["src", "dst"], num_parts=cfg.num_partitions).materialize()
    if pairs.count() == 0:
        from fastdup_ray.relational.ops import empty_typed

        return empty_typed(
            {"src": pa.int64(), "dst": pa.int64(),
             "hamming": pa.int64(), "distance": pa.float64()}
        )

    from fastdup_ray.relational.ops import with_schema

    pairs = with_schema(pairs, {"src": pa.int64(), "dst": pa.int64()})
    side = signatures.select_columns(["doc_id", "simhash"])
    j1 = hash_join(
        pairs, side, on="src", right_on="doc_id", num_partitions=cfg.num_partitions
    ).materialize()  # chained-join materialize (see relational.ops.hash_join)
    j1 = with_schema(
        j1, {"src": pa.int64(), "dst": pa.int64(), "simhash": pa.int64()}
    ).materialize()
    j2 = hash_join(
        j1, side.rename_columns({"simhash": "simhash_r"}),
        on="dst", right_on="doc_id", num_partitions=cfg.num_partitions,
    )

    max_h = cfg.simhash_hamming

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        b = batch["simhash_r"].to_numpy(zero_copy_only=False).view(np.uint64)
        h = hamming64(a, b)
        keep = h <= max_h
        mask = pa.array(keep)
        return pa.table(
            {
                "src": batch["src"].filter(mask),
                "dst": batch["dst"].filter(mask),
                "hamming": pa.array(h[keep], pa.int64()),
                "distance": pa.array(1.0 - h[keep] / 64.0, pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")
