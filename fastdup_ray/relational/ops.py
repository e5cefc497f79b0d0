"""Relational helpers over Ray Datasets (joins, anti/semi joins, top-k).

These wrap the operator inventory the reference performs with pandas
merges (SURVEY.md §2.5 J1-J9): id->name joins, annotation left-joins,
anti-joins for outliers, semi-join filters — expressed as Ray hash joins
or broadcast lookups.
"""

from __future__ import annotations


def num_join_partitions(requested: int) -> int:
    """Cap hash-shuffle partition count at the cluster's CPU count.

    Ray 2.49's `Dataset.join`/hash-shuffle spins up one aggregator actor
    per partition, each reserving a CPU slot; asking for more partitions
    than the cluster has CPUs deadlocks the streaming executor (observed
    on a 4-CPU local cluster with num_partitions=32). At real cluster
    scale the requested value wins.
    """
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    return max(2, min(int(requested), int(cpus)))


def actor_pool_size(requested: int) -> int:
    """Cap an actor-pool's size so it can't reserve every cluster CPU.

    A pool sized at the full CPU count starves upstream/downstream task
    operators (observed: 4 extract actors on a 4-CPU cluster deadlock the
    repartition feeding them). Leaves one CPU headroom.
    """
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    return max(1, min(int(requested), int(cpus) - 1))


def hash_join(left, right, *, on, right_on=None, join_type: str = "inner",
              num_partitions: int = 32):
    """`Dataset.join` with a deadlock-safe partition count.

    NOTE (ray 2.49): chaining a second lazy join on a join output trips
    acero field resolution; materialize between chained joins.
    """
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_join_partitions(num_partitions),
        on=on if isinstance(on, tuple) else (on,),
        right_on=(right_on if isinstance(right_on, tuple) else (right_on,))
        if right_on is not None
        else None,
    )


def broadcast_semi_join(ds, key: str, key_set, *, keep: bool = True):
    """Filter ds to rows whose `key` is (not) in a small key set — the
    broadcast analog of the reference's `isin` semi-joins (J6,
    fastdup_controller.py:880) without a shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(np.asarray(list(key_set)))

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key], value_set=arr)
        if not keep:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")
