"""LSH candidate-pair emission with explicit skew handling.

Replaces the reference's all-pairs kNN-graph build (closed-source HNSW,
reference __init__.py:292-297, RUN.md:43-55) with a hash-partitioned
shuffle over the band rows produced by `BandStage` (SURVEY.md G1, §7.3).

Implementation notes (scale):
- Bucket cardinality ~ num_bands x corpus size, nearly all singletons, so
  a per-bucket `map_groups` would pay Python overhead per bucket. Instead
  we hash-partition by bucket (`partitioned_groupby`) and, inside each
  partition, drop singleton buckets VECTORIZED (duplicated mask) before a
  Python loop over only the multi-occupant buckets.
- Skew (SURVEY.md §4, §7.4): boilerplate/template pages collapse into
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

from fastdup_ray.config import DedupConfig
from fastdup_ray.relational.ops import distinct, partitioned_groupby


def make_emit_partition(max_bucket_pairs: int):
    """Per-hash-partition pair emitter: rows (bucket, doc_id) -> (src, dst),
    src < dst canonical (D1 pair canonicalization, SURVEY.md §2.8)."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        multi = df[df.duplicated("bucket", keep=False)]
        if multi.empty:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        multi = multi.sort_values(["bucket", "doc_id"], kind="mergesort")
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        for _, g in multi.groupby("bucket", sort=False):
            ids = np.unique(g["doc_id"].to_numpy().astype(np.int64))
            m = ids.shape[0]
            if m < 2:
                continue
            if m <= max_bucket_pairs:
                iu = np.triu_indices(m, k=1)
                srcs.append(ids[iu[0]])
                dsts.append(ids[iu[1]])
            else:
                # hot bucket: star to the min id — connectivity-preserving cap
                srcs.append(np.full(m - 1, ids[0], dtype=np.int64))
                dsts.append(ids[1:])
        if not srcs:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        out = pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
        # partial dedup before the global (src,dst) distinct: the same pair
        # fires in up to num_bands buckets, many land in one partition
        return out.drop_duplicates()

    return emit


def make_emit_cross_partition(max_bucket_pairs: int):
    """Cross-corpus pair emitter (G7 train/test mode, reference RUN.md:188-191,
    __init__.py:594-597): rows carry a `side` column (0=query corpus,
    1=index corpus); only side-0 x side-1 pairs are emitted, as
    (src=side0 doc, dst=side1 doc)."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        multi = df[df.duplicated("bucket", keep=False)]
        if multi.empty:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        srcs: list[np.ndarray] = []
        dsts: list[np.ndarray] = []
        for _, g in multi.groupby("bucket", sort=False):
            a = np.unique(g.loc[g["side"] == 0, "doc_id"].to_numpy().astype(np.int64))
            b = np.unique(g.loc[g["side"] == 1, "doc_id"].to_numpy().astype(np.int64))
            if a.size == 0 or b.size == 0:
                continue
            if a.size * b.size > max_bucket_pairs * max_bucket_pairs:
                # hot cross bucket: each side-0 doc pairs with the min side-1 doc
                srcs.append(a)
                dsts.append(np.full(a.size, b[0], dtype=np.int64))
            else:
                srcs.append(np.repeat(a, b.size))
                dsts.append(np.tile(b, a.size))
        if not srcs:
            return pd.DataFrame({"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)})
        out = pd.DataFrame({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
        # partial dedup before the global (src,dst) distinct: the same pair
        # fires in up to num_bands buckets, many land in one partition
        return out.drop_duplicates()

    return emit


def cross_candidate_pairs(band_rows_query, band_rows_index,
                          config: DedupConfig | None = None):
    """Candidates BETWEEN two corpora only (no intra-corpus pairs):
    the G7 train/test-similarity mode. Inputs are BandStage outputs."""
    import pyarrow as pa

    from fastdup_ray.relational.ops import distinct

    cfg = config or DedupConfig()

    def tag(side):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8))
            )

        return fn

    both = band_rows_query.map_batches(tag(0), batch_format="pyarrow").union(
        band_rows_index.map_batches(tag(1), batch_format="pyarrow")
    )
    pairs = partitioned_groupby(
        both, "bucket", make_emit_cross_partition(cfg.max_bucket_pairs),
        num_parts=cfg.num_partitions,
    )
    return distinct(pairs, ["src", "dst"], num_parts=cfg.num_partitions)


def candidate_pairs(band_rows, config: DedupConfig | None = None):
    """band rows Dataset (bucket, doc_id) -> distinct candidate pairs (src, dst).

    Two partitioned shuffles: bucket-hash (pair emission) and (src,dst)
    (cross-band dedup; the same near-dup pair fires in many bands — the
    D1 `drop_duplicates(['from','to'])` analog, reference galleries.py:356).
    """
    cfg = config or DedupConfig()
    pairs = partitioned_groupby(
        band_rows, "bucket", make_emit_partition(cfg.max_bucket_pairs),
        num_parts=cfg.num_partitions,
    )
    return distinct(pairs, ["src", "dst"], num_parts=cfg.num_partitions)
