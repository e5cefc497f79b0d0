"""Distributed connected components over the similarity graph.

Reproduces the reference's connected-components stage (Turi-style CC at
`ccthreshold`, reference RUN.md:77-113, fastdup_controller.py:435-453)
as iterative min-label propagation expressed with Ray Data hash joins
and hash-partitioned vectorized aggregations — no driver-side graph and
no per-group Python calls (SURVEY.md G4; see
relational.ops.partitioned_groupby for why built-in per-key aggregates
are avoided at node cardinality).

Algorithm: every node starts labeled min(own id, min neighbor id); each
round, every node's label becomes min(own label, labels of neighbors).
Labels only decrease and converge to the component's minimum doc_id —
which also NORMALIZES component ids deterministically (min member id),
unlike the reference's arbitrary ints (RUN.md:92), so outputs are
parallelism-invariant.

One round = one hash join (edge endpoint -> neighbor label), one
partitioned min-aggregation, and a Sum aggregate for exact fixpoint
detection. Labels are materialized per round (iterative lineage would
otherwise re-execute all prior rounds; the label table is 16 bytes/node).
Round count is O(graph diameter); LSH buckets emit cliques or stars
(diameter <= 2), so diameters stay small; `cc_max_rounds` bounds
pathology.

Also provides a driver-side union-find for oracle tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from fastdup_ray.config import DedupConfig
from fastdup_ray.relational.ops import hash_join, partitioned_groupby

_NULL = np.int64(np.iinfo(np.int64).max)  # "no old label" sentinel on edge messages


def _symmetrize(batch: pa.Table) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "node": pa.array(np.concatenate([src, dst]), pa.int64()),
            "nbr": pa.array(np.concatenate([dst, src]), pa.int64()),
        }
    )


def connected_components(edges, config: DedupConfig | None = None):
    """edges: Dataset (src, dst[, ...]) -> materialized Dataset (node, label).

    Only nodes incident to at least one edge appear; callers treat
    absent docs as singletons (their own component), matching the
    reference where singleton components are dropped downstream via the
    count filter (fastdup_controller.py:440).
    """
    import ray.data as rd

    cfg = config or DedupConfig()
    nparts = cfg.num_partitions

    # hybrid finalize: below cc_driver_max_edges the whole edge list fits
    # on the driver (16 B/edge) and union-find beats O(diameter) shuffle
    # rounds; above it, one of the two distributed routes runs. The count
    # is taken on the raw edges — symmetrizing (2x rows into the object
    # store) only happens on the path that needs it.
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges > cfg.cc_driver_max_edges and cfg.cc_algorithm == "star":
        return connected_components_star(edges, cfg)
    if n_edges <= cfg.cc_driver_max_edges:
        pairs = []
        for b in edges.iter_batches(batch_size=1_000_000, batch_format="pyarrow"):
            src = b[b.column_names[0]].to_numpy(zero_copy_only=False)
            dst = b[b.column_names[1]].to_numpy(zero_copy_only=False)
            keep = src != dst  # self-loops never name a component
            pairs.extend(zip(src[keep].tolist(), dst[keep].tolist()))
        labels = union_find_oracle(pairs)
        if not labels:
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
            )
        nodes = np.fromiter(labels.keys(), dtype=np.int64, count=len(labels))
        labs = np.fromiter(labels.values(), dtype=np.int64, count=len(labels))
        order = np.argsort(nodes)
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes[order]), "label": pa.array(labs[order])})
        ).materialize()

    # label-propagation path: symmetrize once here (the star path builds
    # its own canonical edge representation instead)
    sym = edges.map_batches(_symmetrize, batch_format="pyarrow").materialize()

    # initial labels: min(node, min neighbor) in one partitioned shuffle
    def init_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False, sort=False)["nbr"].min()
        g["label"] = np.minimum(g["node"].to_numpy(), g["nbr"].to_numpy())
        return g[["node", "label"]]

    labels = partitioned_groupby(
        sym, "node", init_agg, num_parts=nparts, prune_empty=True
    ).materialize()

    for _round in range(cfg.cc_max_rounds):
        nbr_side = labels.rename_columns({"node": "nbr_node", "label": "nbr_label"})
        edge_msgs = hash_join(
            sym, nbr_side, on="nbr", right_on="nbr_node", num_partitions=nparts
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "cand": b["nbr_label"],
                    "old": pa.array(np.full(b.num_rows, _NULL), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        self_msgs = labels.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "cand": b["label"], "old": b["label"]}
            ),
            batch_format="pyarrow",
        )

        def resolve(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False).agg(
                label=("cand", "min"), old_label=("old", "min")
            )
            g = g.reset_index()
            changed = (
                g["label"].to_numpy() < g["old_label"].to_numpy()
            ).astype(np.int64)
            return pd.DataFrame(
                {"node": g["node"], "label": g["label"], "changed": changed}
            )

        # prune_empty: the loop state otherwise gains one (empty) block
        # per input block every round — see ops.drop_empty_blocks
        resolved = partitioned_groupby(
            edge_msgs.union(self_msgs), "node", resolve, num_parts=nparts,
            prune_empty=True,
        ).materialize()
        n_changed = resolved.aggregate(Sum("changed", alias_name="n"))["n"]
        labels = resolved.drop_columns(["changed"])
        if not n_changed:
            break
    return labels.materialize()


def _canon_edges(batch: pa.Table) -> pa.Table:
    """(src,dst)-ish batch -> canonical (hi, lo) with self-loops dropped."""
    a = batch[batch.column_names[0]].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch[batch.column_names[1]].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    return pa.table(
        {"hi": pa.array(np.maximum(a, b), pa.int64()),
         "lo": pa.array(np.minimum(a, b), pa.int64())}
    )


def _dedup_sorted(a: np.ndarray, b: np.ndarray):
    """Sort rows by (a, b) and drop duplicate rows. Returns (a, b)."""
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    if a.size:
        keep = np.empty(a.size, dtype=bool)
        keep[0] = True
        np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=keep[1:])
        a, b = a[keep], b[keep]
    return a, b


def _emit_large_star(df: pd.DataFrame) -> pd.DataFrame:
    """Large-star round over one hash partition of the symmetrized edge
    set (all of a node's rows colocate): for each node u with neighbors
    N(u), m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    Emitted edges are canonical (m ≤ u < v) and never self-loops."""
    node, nbr = _dedup_sorted(
        df["node"].to_numpy().astype(np.int64),
        df["nbr"].to_numpy().astype(np.int64),
    )
    starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
    m = np.minimum(np.minimum.reduceat(nbr, starts), node[starts])
    mfull = np.repeat(m, np.diff(np.r_[starts, node.size]))
    sel = nbr > node
    return pd.DataFrame({"hi": nbr[sel], "lo": mfull[sel]})


def _emit_small_star(df: pd.DataFrame) -> pd.DataFrame:
    """Small-star round over one hash partition of canonical (hi, lo)
    edges grouped by hi (so every copy of an edge colocates and the
    partition-local dedup is global): for each node u with smaller
    neighbors N(u), m = min(N(u)); emit (v, m) for v ∈ N(u) \\ {m} plus
    (u, m). All emissions stay canonical (second component is the min)."""
    hi, lo = _dedup_sorted(
        df["hi"].to_numpy().astype(np.int64),
        df["lo"].to_numpy().astype(np.int64),
    )
    starts = np.flatnonzero(np.r_[True, hi[1:] != hi[:-1]])
    m = np.minimum.reduceat(lo, starts)
    mfull = np.repeat(m, np.diff(np.r_[starts, hi.size]))
    sel = lo != mfull
    return pd.DataFrame(
        {"hi": np.concatenate([lo[sel], hi[starts]]),
         "lo": np.concatenate([mfull[sel], m])}
    )


def _dedup_part(df: pd.DataFrame) -> pd.DataFrame:
    hi, lo = _dedup_sorted(
        df["hi"].to_numpy().astype(np.int64),
        df["lo"].to_numpy().astype(np.int64),
    )
    return pd.DataFrame({"hi": hi, "lo": lo})


def _edge_signature(E) -> tuple[int, int]:
    """(row count, order-independent multiset hash) of a deduped edge
    Dataset — the star-contraction fixpoint test. Per-block digests are
    tiny (one row per block); combined on the driver with uint64
    wraparound, so the signature is independent of block layout."""
    from fastdup_ray.functions.hashing import mix64

    def digest(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = batch["lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = mix64(hi ^ mix64(lo))
        with np.errstate(over="ignore"):
            s = np.uint64(np.sum(h, dtype=np.uint64))
        return pa.table(
            {"n": pa.array([batch.num_rows], pa.int64()),
             "h": pa.array([int(s.astype(np.int64))], pa.int64())}
        )

    n, h = 0, np.uint64(0)
    for b in E.map_batches(digest, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        n += int(np.sum(b["n"].to_numpy(zero_copy_only=False)))
        with np.errstate(over="ignore"):
            h += np.uint64(
                np.sum(b["h"].to_numpy(zero_copy_only=False).astype(np.uint64),
                       dtype=np.uint64))
    return n, int(h)


def connected_components_star(edges, config: DedupConfig | None = None,
                              stats: dict | None = None):
    """Alternating large-star / small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") — the
    giant-diameter scale path. Min-label propagation (above) needs
    O(diameter) shuffle rounds; boilerplate mega-components chained
    through overlapping LSH buckets can have diameter ~ component size.
    Star contraction converges in O(log^2 n) rounds (practically ~log n)
    regardless of diameter, each round = three hash exchanges
    (large-star, small-star, dedup+digest) with numpy segment-min
    kernels inside — no driver-side graph state at any size.

    At the fixpoint the edge set is a star forest rooted at each
    component's minimum node id, so labels match connected_components()
    exactly (same (node, label) schema, label = min member id).
    Fixpoint detection: (count, order-independent multiset hash) of the
    deduped canonical edge set stable across one round.
    """
    import ray.data as rd

    cfg = config or DedupConfig()
    nparts = cfg.num_partitions
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    E = partitioned_groupby(
        edges.map_batches(_canon_edges, batch_format="pyarrow"),
        "hi", _dedup_part, num_parts=nparts, prune_empty=True,
    ).materialize()
    sig = _edge_signature(E)
    if sig[0] == 0:
        return rd.from_arrow(empty)

    def sym(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([hi, lo]), pa.int64()),
             "nbr": pa.array(np.concatenate([lo, hi]), pa.int64())}
        )

    rounds = 0
    for _round in range(cfg.cc_max_rounds):
        large = partitioned_groupby(
            E.map_batches(sym, batch_format="pyarrow"),
            "node", _emit_large_star, num_parts=nparts, prune_empty=True,
        )
        small = partitioned_groupby(
            large, "hi", _emit_small_star, num_parts=nparts, prune_empty=True,
        )
        E = partitioned_groupby(
            small, "hi", _dedup_part, num_parts=nparts, prune_empty=True,
        ).materialize()
        rounds += 1
        new_sig = _edge_signature(E)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds

    # star forest -> labels: every edge is (member, root); roots label
    # themselves. Min per node collapses any duplicate rows.
    def to_labels(batch: pa.Table) -> pa.Table:
        hi = batch["hi"].to_numpy(zero_copy_only=False)
        lo = batch["lo"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node": pa.array(np.concatenate([hi, lo]), pa.int64()),
             "label": pa.array(np.concatenate([lo, lo]), pa.int64())}
        )

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False, sort=False)["label"].min()
        return g

    return partitioned_groupby(
        E.map_batches(to_labels, batch_format="pyarrow"),
        "node", min_label, num_parts=nparts, prune_empty=True,
    ).materialize()


def component_info(labels, num_parts: int = 64):
    """labels (node, label) -> (component_id, count) — the reference's
    component_info.csv (RUN.md:84-93)."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False, sort=False).size()
        return g.rename(columns={"label": "component_id", "size": "count"})

    return partitioned_groupby(labels, "label", counts, num_parts=num_parts)


def union_find_oracle(pairs) -> dict[int, int]:
    """Driver-side union-find for tests: node -> min-id component label."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    seen: set[int] = set()
    for a, b in pairs:
        a, b = int(a), int(b)
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}
