"""Distributed connected components (duplicate-cluster labeling).

The dedup family (minhash/simhash/embedding, ``stages/dedup.py``) emits
verified near-duplicate PAIRS; turning pairs into clusters so exactly one
document per duplicate CLUSTER survives is a connected-components problem.
``minhash_dedup`` union-finds its cap-bounded pair list on the driver; this
module is the scale path: min-label propagation expressed entirely in Ray
Data groupbys, O(diameter) sweeps over narrow (id, key, label) rows, no
driver-side graph.  Reference analog: the segment-merge lineage walk
(``src/commands/merge.go``) is also a fixpoint over a relation table; the
algorithm here is the classic hash-to-min formulation (Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds").

Graph encodings supported:

* node-attribute graphs: nodes connected iff they share a value in ANY of
  ``key_cols`` (the minhash band-bucket relation is exactly this shape);
* explicit edge lists: each edge becomes a shared key.

Labels are the node ids themselves (strings), folded with ``min`` -- the
same semilattice the SQL oracle's recursive CTE computes, so results are
bit-comparable.  Each sweep is one groupby shuffle per key column over rows
a few dozen bytes wide; the working set is materialized once per sweep
(narrow projection, never the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min, Sum


def _propagate(ds: Dataset, key_col: str) -> Dataset:
    """label := min(label) within each key group (one shuffle)."""

    def fold(t: pa.Table) -> pa.Table:
        lab = t.column("label")
        m = pc.min(lab).as_py()
        n = t.num_rows
        return t.drop_columns(["label"]).append_column(
            "label", pa.array([m] * n, pa.string()))

    return ds.groupby(key_col).map_groups(fold, batch_format="pyarrow")


def _changed(ds: Dataset) -> int:
    """Rows whose label differs from prev (tiny aggregate, no collect)."""

    def mark(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"chg": pa.array([], pa.int64())})
        ne = pc.not_equal(t.column("label"), t.column("prev"))
        return pa.table({"chg": pa.array(
            [pc.sum(pc.cast(ne, pa.int64())).as_py() or 0], pa.int64())})

    agg = ds.map_batches(mark, batch_format="pyarrow") \
        .aggregate(Sum("chg", alias_name="chg"))
    return int(agg["chg"] or 0)


def connected_components(ds: Dataset, id_col: str, key_cols: list[str],
                         max_iter: int = 64) -> Dataset:
    """Connected components over "nodes share a key value" edges.

    Input: one row per node with ``id_col`` (unique, non-null string) and
    string ``key_cols``; a NULL key never connects (each null-key row gets
    a private singleton key, matching SQL join-on-NULL semantics).
    Returns a Dataset ``(id_col, component)`` where ``component`` is the
    lexicographic min node id of the component.
    """

    def init(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.string())
        cols = {id_col: ids, "label": ids}
        for k in key_cols:
            kv = pc.cast(t.column(k), pa.string())
            # null key -> unique singleton bucket (no connection)
            cols[k] = pc.if_else(pc.is_valid(kv), kv,
                                 pc.binary_join_element_wise("\x00", ids, ""))
        return pa.table(cols)

    work = ds.select_columns([id_col] + key_cols) \
        .map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(max_iter):
        prev = work.add_column(
            "prev", lambda b: b["label"], batch_format="pyarrow")
        swept = prev
        for k in key_cols:
            swept = _propagate(swept, k)
        # a node's rows are unique here (one row per node), but the same
        # label must also fold ACROSS key sweeps -- each sweep reads the
        # prior sweep's labels, so one pass per key col suffices.
        swept = swept.materialize()
        n_changed = _changed(swept)
        work = swept.drop_columns(["prev"]).materialize()
        if n_changed == 0:
            return work.select_columns([id_col, "label"]) \
                .rename_columns({"label": "component"})
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} sweeps")


def connected_components_edges(nodes: Dataset, edges: Dataset,
                               id_col: str = "id", src: str = "src",
                               dst: str = "dst",
                               max_iter: int = 64) -> Dataset:
    """Connected components over an explicit edge list.

    ``nodes``: one row per node (covers isolated nodes); ``edges``: pair
    rows.  Encoding: every edge becomes a shared key ``min(src,dst) ++
    max(src,dst)`` carried by BOTH endpoints; a node with several edges
    contributes several rows, re-folded per node id each sweep.  Sweeps =
    groupby(edge_key) min + groupby(node) min, exactly hash-to-min.
    Returns ``(id_col, component)`` with one row per node.
    """

    def edge_rows(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column(src), pa.string())
        b = pc.cast(t.column(dst), pa.string())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        ek = pc.binary_join_element_wise(lo, "\x00", hi, "")
        return pa.concat_tables([
            pa.table({id_col: a, "ekey": ek}),
            pa.table({id_col: b, "ekey": ek})]).combine_chunks()

    def node_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column(id_col), pa.string())
        # private key: isolated nodes keep their own label
        return pa.table({
            id_col: ids,
            "ekey": pc.binary_join_element_wise("\x00", ids, "")})

    work = edges.select_columns([src, dst]) \
        .map_batches(edge_rows, batch_format="pyarrow") \
        .union(nodes.select_columns([id_col])
               .map_batches(node_rows, batch_format="pyarrow")) \
        .add_column("label", lambda b: pc.cast(b[id_col], pa.string()),
                    batch_format="pyarrow").materialize()

    for _ in range(max_iter):
        prev = work.add_column(
            "prev", lambda b: b["label"], batch_format="pyarrow")
        swept = _propagate(_propagate(prev, "ekey"), id_col).materialize()
        n_changed = _changed(swept)
        work = swept.drop_columns(["prev"]).materialize()
        if n_changed == 0:
            # one row per node remains after folding replicas
            return work.groupby(id_col) \
                .aggregate(Min("label", alias_name="component"))
    raise RuntimeError(
        f"connected_components_edges did not converge in {max_iter} sweeps")
