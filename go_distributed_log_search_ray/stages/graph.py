"""Distributed PageRank over an explicit edge list (integer-exact).

Link-graph ranking is the canonical Common-Crawl-scale iterative job:
the reference's search scoring (`src/commands/search.go`) ranks by a
static per-document score; this is the graph-global version a web
corpus needs for crawl prioritisation / quality weighting.

All arithmetic is scaled-integer with floor division so the result is
BIT-EXACT against a SQL oracle (no float summation order to worry
about):

    r_0(v)     = scale
    r_{t+1}(v) = floor(scale * (1 - d)) + sum over edges (u -> v) of
                 (r_t(u) * damp_num) // (damp_den * outdeg(u))

with d = damp_num / damp_den (default 17/20 = 0.85).

Scale shape (per iteration, the classic pull formulation):

* the edge table is the big side; it is joined to the rank table ONCE
  per iteration via the co-partitioned ``hash_join`` (both sides move
  once, Arrow C++ joins per partition);
* contributions are pre-aggregated per (batch, dst) inside
  ``map_batches`` before the groupby shuffle, so the exchange carries
  at most one row per (block, dst), not one per edge;
* ranks materialize once per iteration -- the inherent barrier of
  PageRank -- and with ``checkpoint_dir`` each iteration's rank table
  is persisted to parquet with a ``_SUCCESS`` marker, so a killed run
  resumes at the last finished iteration instead of recomputing
  (the same idempotent-resume contract as ``state/manifest.py``).

Dangling nodes (outdegree 0) contribute nothing but still receive the
base term -- mirror the same convention in the oracle.  Edges are
taken as-given: dedupe upstream if multi-edges should not multiply
contributions.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from .join import hash_join


def _distinct_nodes(edges: Dataset, src: str, dst: str) -> Dataset:
    """Distinct node ids appearing on either side (one unique shuffle)."""

    def both(b: pa.Table) -> pa.Table:
        s = b.column(src).combine_chunks() if isinstance(
            b.column(src), pa.ChunkedArray) else b.column(src)
        d = b.column(dst).combine_chunks() if isinstance(
            b.column(dst), pa.ChunkedArray) else b.column(dst)
        node = pc.unique(pa.concat_arrays([
            s.cast(pa.int64()), d.cast(pa.int64())]))
        return pa.table({"node": node})

    return edges.map_batches(both, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="n")) \
        .select_columns(["node"])


def pagerank_integer(edges: Dataset, src: str = "src", dst: str = "dst",
                     iterations: int = 3, scale: int = 1_000_000,
                     damp_num: int = 17, damp_den: int = 20,
                     checkpoint_dir: str | None = None,
                     num_partitions: int | None = None) -> Dataset:
    """Return a Dataset of (node:int64, r:int64) after ``iterations``
    integer-exact PageRank sweeps over the directed edge list."""
    base = (scale * (damp_den - damp_num)) // damp_den

    # one-time prep: outdegree per src, riding every edge as the
    # contribution denominator (damp_den * outdeg)
    deg = edges.groupby(src).aggregate(Count(alias_name="od"))

    def mk_den(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column(src).cast(pa.int64()),
            "den": pc.multiply(b.column("od").cast(pa.int64()),
                               pa.scalar(damp_den, pa.int64()))})

    deg = deg.map_batches(mk_den, batch_format="pyarrow")
    e_schema = pa.schema([("node", pa.int64()), ("dst", pa.int64()),
                          ("den", pa.int64())])
    e = hash_join(
        edges.map_batches(
            lambda b: pa.table({"node": b.column(src).cast(pa.int64()),
                                "dst": b.column(dst).cast(pa.int64())}),
            batch_format="pyarrow"),
        deg, on="node", num_partitions=num_partitions,
        left_schema=pa.schema([("node", pa.int64()),
                               ("dst", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("den", pa.int64())])).materialize()

    nodes = _distinct_nodes(edges, src, dst).materialize()
    zero = nodes.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "c": pa.nulls(b.num_rows, pa.int64())
                            .fill_null(0)}),
        batch_format="pyarrow")

    ranks = nodes.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "r": pa.nulls(b.num_rows, pa.int64())
                            .fill_null(scale)}),
        batch_format="pyarrow")
    rank_schema = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    def partial_contrib(b: pa.Table) -> pa.Table:
        """(rank x edge) rows -> one partial sum per dst in the batch."""
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        c = pc.divide(pc.multiply(b.column("r"), pa.scalar(
            damp_num, pa.int64())), b.column("den"))
        t = pa.table({"node": b.column("dst"), "c": c})
        g = t.group_by(["node"]).aggregate([("c", "sum")])
        return g.rename_columns(["node", "c"])

    def add_base(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node").cast(pa.int64()),
            "r": pc.add(b.column("c").cast(pa.int64()),
                        pa.scalar(base, pa.int64()))})

    for it in range(1, iterations + 1):
        ck = (os.path.join(checkpoint_dir, f"iter_{it:03d}")
              if checkpoint_dir else None)
        if ck and os.path.exists(os.path.join(ck, "_SUCCESS")):
            ranks = ray.data.read_parquet(ck)
            continue
        joined = hash_join(e, ranks, on="node",
                           num_partitions=num_partitions,
                           left_schema=e_schema,
                           right_schema=rank_schema)
        ranks = joined.map_batches(partial_contrib,
                                   batch_format="pyarrow") \
            .union(zero) \
            .groupby("node").aggregate(Sum("c", alias_name="c")) \
            .map_batches(add_base, batch_format="pyarrow")
        if ck:
            # torn-write safety: a run killed mid write_parquet leaves
            # partial files with no _SUCCESS; write_parquet into the
            # same dir APPENDS uniquely-named files, so a resume would
            # read stale partials + new files (duplicated rank rows
            # corrupting every later iteration).  Clear the unfinished
            # dir first so only complete iteration data is readable.
            if os.path.isdir(ck):
                import shutil
                shutil.rmtree(ck)
            os.makedirs(ck, exist_ok=True)
            ranks.write_parquet(ck)
            open(os.path.join(ck, "_SUCCESS"), "w").close()
            ranks = ray.data.read_parquet(ck)
        else:
            # bound the rank table's block count before snapping the
            # iteration: the join unions both sides' blocks and the
            # groupby inherits them, so without this blocks multiply
            # every iteration and driver-side dispatch swamps compute
            # (same geometric blowup measured in kcore's peel loop)
            from .partitions import num_partitions as _default_partitions
            ranks = ranks.repartition(
                num_partitions or _default_partitions(None)).materialize()
    return ranks


def _annotate_degrees(e: Dataset, deg: Dataset, p: int) -> Dataset:
    """(u, v, du, dv): both endpoints' degrees attached via two
    co-partitioned ``hash_join`` exchanges against the degree Dataset.
    The degree table never leaves the cluster -- no O(nodes) driver
    ``take_all`` and no O(nodes) broadcast object -- so this is the
    orientation input that still works when the node set of a
    web-scale link graph exceeds one machine's memory."""
    from .join import hash_join

    e_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    deg_schema = pa.schema([("n", pa.int64()), ("deg", pa.int64())])
    j1 = hash_join(e, deg, on="u", right_on="n", num_partitions=p,
                   left_schema=e_schema, right_schema=deg_schema) \
        .map_batches(lambda b: b.rename_columns(["u", "v", "du"]),
                     batch_format="pyarrow")
    j1_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                           ("du", pa.int64())])
    return hash_join(j1, deg, on="v", right_on="n", num_partitions=p,
                     left_schema=j1_schema, right_schema=deg_schema) \
        .map_batches(lambda b: b.rename_columns(["v", "u", "du", "dv"]),
                     batch_format="pyarrow")


def triangle_count(edges: Dataset, src: str = "src", dst: str = "dst",
                   num_partitions: int | None = None,
                   degree_mode: str = "copartition") -> int:
    """Exact triangle count via degree-oriented wedge counting -- the
    standard bounded-work distributed algorithm (public knowledge:
    node-iterator++ / Suri & Vassilvitskii 2011 "Counting Triangles
    and the Curse of the Last Reducer").

    Plan: distinct undirected edges (one groupby), degrees (one count
    shuffle), orient each edge from its lower-(degree, id) endpoint so
    every node's FORWARD adjacency is O(sqrt(m)) amortized, emit each
    forward wedge (b, c) once from its apex, and co-partition wedges
    with the edge set by (b, c) hash so one membership pass per
    partition counts closures.  Total work O(m^1.5), no all-pairs
    stage, hub nodes defused by the orientation.

    ``degree_mode`` picks how orientation reads degrees:
    * ``"copartition"`` (default, the web-scale path): the degree
      table STAYS a Dataset and each endpoint's degree arrives via a
      co-partitioned ``hash_join`` -- nothing O(nodes) ever
      materializes on the driver or in a broadcast object.
    * ``"broadcast"``: one ``take_all`` of the (node, degree) table
      into a sorted numpy lookup shipped by ``ray.put`` -- one shuffle
      cheaper, right when the node set comfortably fits one machine."""
    import ray
    from ray.data.aggregate import Count

    from .partitions import num_partitions as _default_partitions

    p = num_partitions or _default_partitions(None)

    def canon(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column(src), pa.int64())
        d = pc.cast(b.column(dst), pa.int64())
        u = pc.min_element_wise(a, d)
        v = pc.max_element_wise(a, d)
        t = pa.table({"u": u, "v": v}).filter(pc.less(u, v))
        # per-batch distinct collapse before the global distinct
        return t.group_by(["u", "v"]).aggregate([])

    e = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Count(alias_name="__c")) \
        .select_columns(["u", "v"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.concat_arrays([
            b.column("u").combine_chunks(),
            b.column("v").combine_chunks()])})

    deg = e.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("n").aggregate(Count(alias_name="deg"))

    def orient_rows(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column("u"))
        v = np.asarray(b.column("v"))
        du = np.asarray(b.column("du"))
        dv = np.asarray(b.column("dv"))
        # forward = lower (degree, id) endpoint first
        fwd = (du < dv) | ((du == dv) & (u < v))
        s = np.where(fwd, u, v)
        t = np.where(fwd, v, u)
        return pa.table({"s": pa.array(s), "t": pa.array(t)})

    if degree_mode == "copartition":
        oe = _annotate_degrees(e, deg, p) \
            .map_batches(orient_rows, batch_format="pyarrow") \
            .materialize()
    else:
        deg_rows = deg.take_all()
        nodes = np.array([r["n"] for r in deg_rows], np.int64)
        degs = np.array([r["deg"] for r in deg_rows], np.int64)
        order = np.argsort(nodes)
        nodes, degs = nodes[order], degs[order]
        deg_ref = ray.put((nodes, degs))

        def orient(b: pa.Table, _r=deg_ref) -> pa.Table:
            nd, dg = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
            u = np.asarray(b.column("u"))
            v = np.asarray(b.column("v"))
            t = pa.table({"u": b.column("u"), "v": b.column("v"),
                          "du": pa.array(dg[np.searchsorted(nd, u)]),
                          "dv": pa.array(dg[np.searchsorted(nd, v)])})
            return orient_rows(t)

        oe = e.map_batches(orient, batch_format="pyarrow").materialize()

    def wedge_rows(t: pa.Table) -> pa.Table:
        """apex group -> all forward-neighbor pairs (b < c by the
        orientation order is not guaranteed; canonicalize by id)."""
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        nb = np.unique(np.asarray(t.column("t")))
        if len(nb) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        i, j = np.triu_indices(len(nb), 1)
        return pa.table({"a": pa.array(np.minimum(nb[i], nb[j])),
                         "b": pa.array(np.maximum(nb[i], nb[j])),
                         "w": pa.array(np.ones(len(i), np.int64))})

    wedges = oe.groupby("s").map_groups(wedge_rows,
                                        batch_format="pyarrow")

    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            a = np.asarray(b.column("u" if side == 0 else "a"))
            c = np.asarray(b.column("v" if side == 0 else "b"))
            w = np.ones(len(a), np.int64) if side == 0 else \
                np.asarray(b.column("w"))
            part = ((a * np.int64(0x9E3779B1) + c)
                    % np.int64(p)).astype(np.int32)
            return pa.table({"a": pa.array(a), "b": pa.array(c),
                             "w": pa.array(w),
                             "side": pa.array(
                                 np.full(len(a), side, np.int8)),
                             "__part": pa.array(np.abs(part))})
        return f

    both = e.map_batches(tag(0), batch_format="pyarrow") \
        .union(wedges.map_batches(tag(1), batch_format="pyarrow"))

    def close(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        side = np.asarray(t.column("side"), np.int8)
        a = np.asarray(t.column("a"))
        b = np.asarray(t.column("b"))
        w = np.asarray(t.column("w"))
        ek = a[side == 0] * np.int64(1 << 32) + b[side == 0]
        ek = np.sort(ek)
        wk = a[side == 1] * np.int64(1 << 32) + b[side == 1]
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, max(0, len(ek) - 1))
        hit = len(ek) > 0 and (ek[pos] == wk)
        n = int(w[side == 1][hit].sum()) if len(ek) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    rows = both.groupby("__part").map_groups(
        close, batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in rows))


def kcore(edges: Dataset, k: int, src: str = "src", dst: str = "dst",
          max_rounds: int = 32,
          peel_mode: str = "copartition") -> tuple[pa.Table, int]:
    """k-core: the maximal subgraph where every node keeps degree
    >= k, by iterative peeling (public-knowledge algorithm; Seidman
    1983).  Returns ``(table(node, deg), rounds_used)`` where deg is
    the node's degree INSIDE the core.

    Per round: one degree count shuffle over the surviving edge set,
    then a filter pass dropping edges touching a sub-``k`` node.
    ``peel_mode``:
    * ``"copartition"`` (default, the web-scale path): the degree
      table stays a Dataset; the filter is two co-partitioned LEFT
      SEMI ``hash_join`` exchanges of the edge set against the alive
      node set, and convergence is decided by a tiny dead-count
      aggregate -- nothing O(nodes) on the driver until the FINAL
      core table (the return value) is collected.
    * ``"broadcast"``: the per-round (node, degree) table lands on
      the driver and ships as one sorted-lookup broadcast -- two
      shuffles cheaper per round, right when nodes fit one machine.
    Rounds are data-dependent; raises if ``max_rounds`` is hit so a
    caller (or an unrolled SQL oracle with the same round budget)
    can never silently diverge."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .join import hash_join
    from .partitions import num_partitions as _default_partitions

    def canon(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column(src), pa.int64())
        d = pc.cast(b.column(dst), pa.int64())
        u = pc.min_element_wise(a, d)
        v = pc.max_element_wise(a, d)
        t = pa.table({"u": u, "v": v}).filter(pc.less(u, v))
        return t.group_by(["u", "v"]).aggregate([])

    e = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["u", "v"]).aggregate(Count(alias_name="__c")) \
        .select_columns(["u", "v"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.concat_arrays([
            b.column("u").combine_chunks(),
            b.column("v").combine_chunks()])})

    if peel_mode == "copartition":
        p = _default_partitions(None)
        e_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
        n_schema = pa.schema([("n", pa.int64())])

        def dead_partial(b: pa.Table) -> pa.Table:
            d = pc.sum(pc.cast(pc.less(b.column("deg"), k),
                               pa.int64())).as_py() or 0
            return pa.table({"dead": pa.array([d], pa.int64()),
                             "total": pa.array([b.num_rows], pa.int64())})

        for rounds in range(1, max_rounds + 1):
            deg = e.map_batches(endpoints, batch_format="pyarrow") \
                .groupby("n").aggregate(Count(alias_name="deg")) \
                .materialize()
            cnt = deg.map_batches(dead_partial, batch_format="pyarrow") \
                .aggregate(Sum("dead", alias_name="dead"),
                           Sum("total", alias_name="total"))
            dead = int(cnt.get("dead") or 0)
            total = int(cnt.get("total") or 0)
            if total == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "deg": pa.array([], pa.int64())}), rounds
            if dead == 0:
                # converged: ONLY NOW does the (final, core-sized)
                # degree table come to the driver -- it is the result
                rows = deg.take_all()
                nodes = np.array([r["n"] for r in rows], np.int64)
                degs = np.array([r["deg"] for r in rows], np.int64)
                order = np.argsort(nodes)
                return pa.table({"node": pa.array(nodes[order]),
                                 "deg": pa.array(degs[order])}), rounds
            alive = deg.map_batches(
                lambda b: pa.table({"n": b.column("n")}).filter(
                    pc.greater_equal(b.column("deg"), k)),
                batch_format="pyarrow")
            e = hash_join(e, alive, on="u", right_on="n",
                          num_partitions=p, join_type="left semi",
                          left_schema=e_schema, right_schema=n_schema)
            # bound the block count BEFORE snapping the round: each
            # join unions both sides' blocks, so without this the edge
            # set's block count grows geometrically round over round
            # and driver-side per-block dispatch swamps the compute
            # (measured: rounds went 3s -> 13s -> 53s; with the bound,
            # every round is ~2s and the loop matches broadcast mode)
            e = hash_join(e, alive, on="v", right_on="n",
                          num_partitions=p, join_type="left semi",
                          left_schema=e_schema, right_schema=n_schema) \
                .repartition(p).materialize()
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")

    for rounds in range(1, max_rounds + 1):
        deg_rows = e.map_batches(endpoints, batch_format="pyarrow") \
            .groupby("n").aggregate(Count(alias_name="deg")).take_all()
        nodes = np.array([r["n"] for r in deg_rows], np.int64)
        degs = np.array([r["deg"] for r in deg_rows], np.int64)
        if len(nodes) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "deg": pa.array([], pa.int64())}), rounds
        alive_mask = degs >= k
        if alive_mask.all():
            order = np.argsort(nodes)
            return pa.table({"node": pa.array(nodes[order]),
                             "deg": pa.array(degs[order])}), rounds
        alive = np.sort(nodes[alive_mask])
        aref = ray.put(alive)

        def keep(b: pa.Table, _r=aref) -> pa.Table:
            al = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
            u = np.asarray(b.column("u"))
            v = np.asarray(b.column("v"))

            def member(x):
                if len(al) == 0:
                    return np.zeros(len(x), bool)
                p = np.clip(np.searchsorted(al, x), 0, len(al) - 1)
                return al[p] == x
            return b.filter(pa.array(member(u) & member(v)))

        e = e.map_batches(keep, batch_format="pyarrow").materialize()
    raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
