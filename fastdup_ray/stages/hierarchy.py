"""Hierarchical components (SURVEY.md G9): cluster the clusters.

The reference's galleries compute a second clustering level — similarity
between component exemplars, surfaced as `cluster_from`/`cluster_to`
edge columns (reference galleries.py:223-266, 365-367). Here:

- each first-level component's exemplar is its canonical doc — in this
  repo the component label IS the min doc_id of the component
  (stages/components.py), so exemplar selection is a semi-join of docs
  against the distinct component ids (no extra groupby);
- the full MinHash/LSH/verify stack re-runs over exemplar texts at a
  LOWER threshold (`cluster_threshold`, default 0.7: components whose
  representatives still share most shingles belong to one theme);
- connected components over the exemplar graph yield `cluster_id` per
  component (cluster_id = min component_id in the cluster — same
  normalization as level one, so output is parallelism-invariant).

Returns (component_clusters, component_edges):
  component_clusters: (component_id, cluster_id) — every input component,
      singletons mapped to themselves;
  component_edges: (cluster_from, cluster_to, distance) — the verified
      exemplar edges (reference's cluster_from/cluster_to columns).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fastdup_ray.config import DedupConfig
from fastdup_ray.relational.ops import cogroup_join, with_schema
from fastdup_ray.stages.components import connected_components
from fastdup_ray.stages.lsh import candidate_pairs
from fastdup_ray.stages.signatures import BandStage, SignStage
from fastdup_ray.stages.verify import verify_pairs


def hierarchical_components(docs, components, config: DedupConfig | None = None,
                            *, cluster_threshold: float = 0.7):
    """docs: (doc_id, text, ...); components: (doc_id, component_id)."""
    import ray.data as rd

    cfg = config or DedupConfig()
    sub_cfg = dataclasses.replace(
        cfg, threshold=cluster_threshold, cc_threshold=cluster_threshold
    )

    comp_ids = components.select_columns(["component_id"]).map_batches(
        lambda b: pa.table(
            {"component_id": b["component_id"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    # distinct component ids (exemplar doc ids)
    from fastdup_ray.relational.ops import distinct

    exemplar_ids = distinct(comp_ids, "component_id",
                            num_parts=cfg.num_partitions).materialize()
    empty_cl = pa.table(
        {"component_id": pa.array([], pa.int64()),
         "cluster_id": pa.array([], pa.int64())}
    )
    empty_ed = pa.table(
        {"cluster_from": pa.array([], pa.int64()),
         "cluster_to": pa.array([], pa.int64()),
         "distance": pa.array([], pa.float64())}
    )
    if exemplar_ids.count() == 0:
        return rd.from_arrow(empty_cl), rd.from_arrow(empty_ed)

    exemplars = cogroup_join(
        exemplar_ids,
        docs.select_columns(["doc_id", "text"]).rename_columns(
            {"doc_id": "xdoc"}
        ),
        on="component_id", right_on="xdoc", num_parts=cfg.num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b["component_id"].cast(pa.int64()), "text": b["text"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    sigs = exemplars.map_batches(
        SignStage(sub_cfg), batch_format="pyarrow", batch_size=cfg.batch_size
    ).materialize()
    pairs = candidate_pairs(
        sigs.map_batches(BandStage(sub_cfg), batch_format="pyarrow"), sub_cfg
    )
    scores = verify_pairs(pairs, sigs, exemplars, sub_cfg).materialize()
    edges = scores.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["distance"], pa.scalar(cluster_threshold))
        ),
        batch_format="pyarrow",
    ).materialize()

    comp_edges = edges.map_batches(
        lambda b: pa.table(
            {
                "cluster_from": b["src"].cast(pa.int64()),
                "cluster_to": b["dst"].cast(pa.int64()),
                "distance": b["distance"],
            }
        ),
        batch_format="pyarrow",
    )

    if edges.count() == 0:
        clusters = exemplar_ids.map_batches(
            lambda b: pa.table(
                {
                    "component_id": b["component_id"].cast(pa.int64()),
                    "cluster_id": b["component_id"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        return clusters, rd.from_arrow(empty_ed)

    labels = connected_components(edges, sub_cfg)  # (node, label)
    # rename inside with_schema (rename_columns on from_arrow_refs
    # datasets is unreliable in ray 2.49 — see ops.with_schema)
    labels = with_schema(labels, {"lnode": pa.int64(), "label": pa.int64()},
                         rename={"node": "lnode"})

    # every component gets a cluster: clustered ones take their CC label,
    # singletons map to themselves (left join + coalesce)
    joined = cogroup_join(
        exemplar_ids,
        labels,
        on="component_id", right_on="lnode", num_parts=cfg.num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {
                "component_id": b["component_id"].cast(pa.int64()),
                "cluster_id": b["label"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    from fastdup_ray.relational.ops import cogroup_anti_join

    singletons = cogroup_anti_join(
        exemplar_ids, labels, on="component_id", right_on="lnode",
        num_parts=cfg.num_partitions,
    ).map_batches(
        lambda b: pa.table(
            {
                "component_id": b["component_id"].cast(pa.int64()),
                "cluster_id": b["component_id"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return joined.union(singletons), comp_edges
