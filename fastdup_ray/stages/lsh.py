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
    src < dst canonical (D1 pair canonicalization, SURVEY.md §2.8).

    Fully vectorized — no per-bucket Python. Rows are lexsorted and
    deduped, segment (bucket) sizes derived by run-length, and each row
    of a clique-sized bucket pairs with its `m-1-l` successors via one
    global repeat/arange construction; star-capped hot buckets emit
    min-id -> others the same way."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
        b = df["bucket"].to_numpy().astype(np.int64, copy=False)
        d = df["doc_id"].to_numpy().astype(np.int64, copy=False)
        if b.size == 0:
            return empty
        order = np.lexsort((d, b))
        b, d = b[order], d[order]
        keep = np.ones(b.size, dtype=bool)
        keep[1:] = (b[1:] != b[:-1]) | (d[1:] != d[:-1])
        b, d = b[keep], d[keep]
        starts = np.flatnonzero(np.concatenate([[True], b[1:] != b[:-1]]))
        counts = np.diff(np.append(starts, b.size))
        pos = np.arange(b.size, dtype=np.int64)
        seg_m = np.repeat(counts, counts)  # bucket size, per row
        loc = pos - np.repeat(starts, counts)  # local index, per row
        # per row: how many successors it pairs with — all of them in
        # clique buckets (m <= cap); in star buckets only the min-id row
        # (loc == 0) pairs with everything after it
        clique = np.repeat(counts <= max_bucket_pairs, counts)
        rep = np.where(clique, seg_m - 1 - loc, np.where(loc == 0, seg_m - 1, 0))
        total = int(rep.sum())
        if total == 0:
            return empty
        src = np.repeat(d, rep)
        csum = np.cumsum(rep) - rep
        off = np.arange(total, dtype=np.int64) - np.repeat(csum, rep)
        dst = d[np.repeat(pos + 1, rep) + off]
        # partial dedup before the global (src,dst) distinct: the same pair
        # fires in up to num_bands buckets, many land in one partition
        key_order = np.lexsort((dst, src))
        src, dst = src[key_order], dst[key_order]
        uniq = np.ones(src.size, dtype=bool)
        uniq[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        return pd.DataFrame({"src": src[uniq], "dst": dst[uniq]})

    return emit


def make_emit_cross_partition(max_bucket_pairs: int):
    """Cross-corpus pair emitter (G7 train/test mode, reference RUN.md:188-191,
    __init__.py:594-597): rows carry a `side` column (0=query corpus,
    1=index corpus); only side-0 x side-1 pairs are emitted, as
    (src=side0 doc, dst=side1 doc)."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
        b = df["bucket"].to_numpy().astype(np.int64, copy=False)
        s = df["side"].to_numpy().astype(np.int64, copy=False)
        d = df["doc_id"].to_numpy().astype(np.int64, copy=False)
        if b.size == 0:
            return empty
        # lexsort so each bucket is [side-0 run | side-1 run], docs
        # ascending within a run; dedup (bucket, side, doc)
        order = np.lexsort((d, s, b))
        b, s, d = b[order], s[order], d[order]
        keep = np.ones(b.size, dtype=bool)
        keep[1:] = (b[1:] != b[:-1]) | (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        b, s, d = b[keep], s[keep], d[keep]
        starts = np.flatnonzero(np.concatenate([[True], b[1:] != b[:-1]]))
        counts = np.diff(np.append(starts, b.size))
        # per bucket: na side-0 rows, nb side-1 rows
        na_row = (s == 0).astype(np.int64)
        cum0 = np.concatenate([[0], np.cumsum(na_row)])
        na = cum0[starts + counts] - cum0[starts]
        nb = counts - na
        b_start = starts + na  # first side-1 row per bucket
        per_bucket = np.where(
            (na > 0) & (nb > 0),
            np.where(na * nb > max_bucket_pairs * max_bucket_pairs, 1, nb),
            0,
        )  # dst fan-out per side-0 row (1 = star to min side-1 doc)
        rep = np.where(s == 0, np.repeat(per_bucket, counts), 0)
        total = int(rep.sum())
        if total == 0:
            return empty
        src = np.repeat(d, rep)
        csum = np.cumsum(rep) - rep
        off = np.arange(total, dtype=np.int64) - np.repeat(csum, rep)
        dst = d[np.repeat(np.repeat(b_start, counts), rep) + off]
        # partial dedup before the global (src,dst) distinct: the same pair
        # fires in up to num_bands buckets, many land in one partition
        key_order = np.lexsort((dst, src))
        src, dst = src[key_order], dst[key_order]
        uniq = np.ones(src.size, dtype=bool)
        uniq[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        return pd.DataFrame({"src": src[uniq], "dst": dst[uniq]})

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
