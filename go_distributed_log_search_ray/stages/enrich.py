"""Broadcast-lookup enrichment stage (actor pool).

The reference's only lookups are broadcast-small-side hash lookups
(catalog by name src/commands/mod.go:161-180, checkpoints by partition
src/commands/sources/kafka_checkpoint.go:47-105, footer offset ranges
src/unified_index/unified_directory.go:152-166) -- never a shuffle join.
We keep that shape: the small tables are ``ray.put`` once on the driver
and each enrich actor materializes dict lookups ONCE in ``__init__``;
``__call__`` does a vectorized dictionary-encode + take per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def load_lookup_tables(lookup_dir: str) -> dict[str, dict]:
    """Driver-side: read the small lookup parquets into plain dicts."""
    import os
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    ll = pq.read_table(os.path.join(lookup_dir, "lang_locale.parquet"))
    out["lang_locale"] = {
        r["lang"]: (r["locale"], r["lang_family"]) for r in ll.to_pylist()
    }
    sm = pq.read_table(os.path.join(lookup_dir, "site_meta.parquet"))
    out["site_meta"] = {
        r["host"]: (r["site_id"], r["category"], r["tier"]) for r in sm.to_pylist()
    }
    hg = pq.read_table(os.path.join(lookup_dir, "host_geo.parquet"))
    out["host_geo"] = {r["host"]: (r["country"], r["asn"]) for r in hg.to_pylist()}
    return out


def broadcast_lookups(lookup_dir: str) -> "ray.ObjectRef":
    """ray.put once; every actor reads the same plasma object (one copy
    per node on a real cluster, not one per batch)."""
    return ray.put(load_lookup_tables(lookup_dir))


def _map_column(keys: pa.Array, table: dict, slot: int, out_type: pa.DataType) -> pa.Array:
    """Vectorized dict lookup: unique keys -> python lookup -> take."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    d = keys.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    vals = []
    for u in uniq:
        hit = table.get(u) if u is not None else None
        vals.append(hit[slot] if hit is not None else None)
    lut = pa.array(vals, type=out_type)
    return pc.take(lut, d.indices)


class Enricher:
    """map_batches(Enricher, fn_constructor_args=(lookups,),
    concurrency=N, batch_format="pyarrow").

    ``lookups`` may be a dict, an ObjectRef from ``broadcast_lookups``,
    or a PATH STRING to the lookup dir.  For restartable pipelines prefer
    ``Enricher.at(path)``: it returns a no-arg-constructible subclass with
    the path baked into a class attribute, so map_batches ships ZERO
    constructor args -- Ray Data puts fn_constructor_args in the object
    store, and with actor restarts enabled a lost arg object makes every
    restart fail (ray#53727).  ``__init__`` loads the tables itself from
    the path, so a restarted actor is fully self-contained.
    The dicts are built once per actor either way (reference analog: the
    Kafka consumer holding checkpoint/assignment state per process,
    src/commands/sources/kafka_source.go:59-68).
    """

    LOOKUPS = None                 # set on subclasses made by .at()

    @classmethod
    def at(cls, lookups_path: str) -> type:
        """A no-arg-constructible subclass bound to a lookup-dir path."""
        return type("EnricherAt", (cls,), {"LOOKUPS": lookups_path})

    def __init__(self, lookups=None) -> None:
        if lookups is None:
            lookups = self.LOOKUPS
        if isinstance(lookups, str):            # path: restart-safe load
            lookups = load_lookup_tables(lookups)
        if isinstance(lookups, ray.ObjectRef):  # defensive: nested-ref case
            lookups = ray.get(lookups)
        self.lang_locale = lookups["lang_locale"]
        self.site_meta = lookups["site_meta"]
        self.host_geo = lookups["host_geo"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang = batch.column("lang")
        host = batch.column("host")
        cols = {
            "locale": _map_column(lang, self.lang_locale, 0, pa.string()),
            "lang_family": _map_column(lang, self.lang_locale, 1, pa.string()),
            "site_id": _map_column(host, self.site_meta, 0, pa.int64()),
            "category": _map_column(host, self.site_meta, 1, pa.string()),
            "tier": _map_column(host, self.site_meta, 2, pa.string()),
            "country": _map_column(host, self.host_geo, 0, pa.string()),
            "asn": _map_column(host, self.host_geo, 1, pa.int64()),
        }
        out = batch
        for name, arr in cols.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out
