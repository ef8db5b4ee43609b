"""Cluster- and bytes-aware shuffle partition-count defaults.

Every hash-partitioned exchange in the package (shuffle join, as-of
join, dedup band/verify buckets) masks a key hash down to a
power-of-two partition count.  The old default capped that count at
``min(cpus, 16)`` -- right for a 32-CPU dev box, but a scale-killer on
the stated target (fixed-size multi-node cluster, ~100 TB): a 512-core
cluster would still run 16-way joins with per-partition memory growing
O(data/16).

The default here instead scales with BOTH the cluster and the data:

* at least one partition per cluster CPU (so every core can own a
  partition of the exchange), and
* at least one partition per ``per_partition_bytes`` of estimated input
  (default 256 MiB -- a partition must fit comfortably in a worker
  heap next to its join hash table), when the caller can estimate the
  bytes it is about to shuffle.

rounded up to a power of two (the partitioners use ``hash & (p - 1)``).
Callers that cannot estimate bytes cheaply (Ray executes the plan to
answer ``Dataset.size_bytes`` on transformed datasets) simply omit
``est_bytes`` and get the CPU-proportional default.
"""

from __future__ import annotations

PER_PARTITION_BYTES = 256 << 20     # 256 MiB target partition payload


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def num_partitions(est_bytes: int | None = None,
                   per_partition_bytes: int = PER_PARTITION_BYTES) -> int:
    """Power-of-two partition count: ``max(cluster CPUs, est_bytes /
    per_partition_bytes)``, minimum 2.  See module docstring."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    n = max(2, cpus)
    if est_bytes:
        n = max(n, -(-int(est_bytes) // per_partition_bytes))
    return _pow2_at_least(n)
