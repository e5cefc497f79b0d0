"""LSH candidate-pair emission with explicit skew handling.

Replaces the reference's all-pairs kNN-graph build (closed-source HNSW,
reference __init__.py:292-297, RUN.md:43-55) with a
`groupby(bucket).map_groups(emit_pairs)` shuffle over the band rows
produced by `BandStage` (SURVEY.md G1, §7.3).

Skew (SURVEY.md §4, §7.4): boilerplate/template pages collapse into
mega-buckets; an uncapped bucket of m docs emits C(m,2) = O(m^2) pairs.
Buckets larger than `max_bucket_pairs` emit a STAR to the bucket's
minimum doc_id instead — m-1 edges that keep the bucket connected with
diameter 2, so connected-components results are preserved while pair
emission stays linear. The pair list under-reports intra-mega-bucket
pairs by design; similarity() documents this cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fastdup_ray.config import DedupConfig


def make_emit_pairs(max_bucket_pairs: int):
    """Returns a map_groups fn: one bucket's rows -> candidate (src,dst) pairs,
    src < dst canonically (D1 pair canonicalization, SURVEY.md §2.8)."""

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy().astype(np.int64))
        m = ids.shape[0]
        if m < 2:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        if m <= max_bucket_pairs:
            iu = np.triu_indices(m, k=1)
            src, dst = ids[iu[0]], ids[iu[1]]
        else:
            # hot bucket: star to the min id — connectivity-preserving cap
            src = np.full(m - 1, ids[0], dtype=np.int64)
            dst = ids[1:]
        return pd.DataFrame({"src": src, "dst": dst})

    return emit_pairs


def candidate_pairs(band_rows, config: DedupConfig | None = None):
    """band rows Dataset (bucket, doc_id) -> distinct candidate pairs (src, dst).

    Two shuffles: the bucket groupby (pair emission) and a (src,dst)
    groupby for cross-band dedup (the same near-dup pair fires in many
    bands; D1 `drop_duplicates(['from','to'])` analog,
    reference galleries.py:356).
    """
    cfg = config or DedupConfig()
    pairs = band_rows.groupby("bucket").map_groups(
        make_emit_pairs(cfg.max_bucket_pairs), batch_format="pandas"
    )
    # distinct (src, dst): count() is the cheapest built-in distinct-by-key
    distinct = pairs.groupby(["src", "dst"]).count()
    return distinct.drop_columns(["count()"])
