"""Composed training-data preparation pipeline over a documents table:

    features -> quality filter -> exact dedup -> per-language aggregate

the canonical LLM-corpus prep shape (C4/Gopher-style integer-rule
filtering, then dedup, then accounting), built from this repo's
operators so the whole chain is one streaming Dataset plan:

1. one vectorized ``map_batches`` chain computes token counts, quality
   features, and md5 fingerprints (textstats kernels; no extra passes);
2. the quality filter is INTEGER-RULE based (min tokens, digit-ratio
   cap) so the composed result stays exactly SQL-expressible -- the
   whole pipeline is value-hash oracle-checked, not just its pieces;
3. exact dedup keeps the min doc id per fingerprint AMONG SURVIVORS:
   a groupby(fingerprint) -> Min(doc_id) produces the keeper set, and a
   distributed semi ``hash_join`` on doc_id recovers the kept rows --
   no driver-side id set, so the keeper set may be O(corpus);
4. per-language partial aggregates fold doc/token counts.

Scale shape: two shuffles (fingerprint groupby, doc_id join), both
moving narrow columns only; text/html never pass the first stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ..stages.textstats import (token_count_batch, quality_features_batch,
                                fingerprint_batch)
from ..stages.join import hash_join


def featurize(ds: Dataset, id_col: str = "doc_id",
              text_col: str = "text") -> Dataset:
    """tokens + quality features + fingerprint in ONE map_batches chain,
    then the text column is dropped (narrow rows from here on)."""
    def f(b: pa.Table) -> pa.Table:
        b = token_count_batch(b, text_col)
        b = quality_features_batch(b, text_col)
        b = fingerprint_batch(b, text_col)
        return b.drop_columns([text_col])
    return ds.map_batches(f, batch_format="pyarrow")


def quality_filter(ds: Dataset, min_tokens: int = 10,
                   digit_ratio_x5_max: bool = True) -> Dataset:
    """Integer quality rules (SQL twin: n_tokens >= K AND
    n_digit*5 <= n_chars): drop too-short and digit-heavy docs."""
    def f(b: pa.Table) -> pa.Table:
        ok = pc.greater_equal(b.column("n_tokens"), min_tokens)
        if digit_ratio_x5_max:
            ok = pc.and_(ok, pc.less_equal(
                pc.multiply(b.column("n_digit"), 5),
                b.column("n_chars_calc")))
        return b.filter(ok)
    return ds.map_batches(f, batch_format="pyarrow")


def dedup_keep_rows(ds: Dataset, id_col: str = "doc_id",
                    keep_cols: list[str] | None = None,
                    num_partitions: int | None = None) -> Dataset:
    """First-writer-wins exact dedup that RETURNS THE KEPT ROWS (not just
    ids): keeper set = groupby(fingerprint).Min(id), recovered via a
    distributed semi hash_join on the id -- the keeper set never lands
    on the driver, so this holds at O(corpus) keepers."""
    keep_cols = keep_cols or [c for c in ds.schema().names
                              if c != "fingerprint"]
    keepers = ds.groupby("fingerprint").aggregate(
        Min(id_col, alias_name=id_col)) \
        .select_columns([id_col])
    left_schema = pa.schema([(id_col, pa.int64())])
    rows = ds.select_columns(keep_cols)
    right_fields = [(c, pa.int64() if c in (id_col, "n_tokens", "n_digit",
                                            "n_chars_calc") else pa.string())
                    for c in keep_cols]
    return hash_join(keepers, rows, on=id_col,
                     num_partitions=num_partitions,
                     left_schema=left_schema,
                     right_schema=pa.schema(right_fields))


def doc_prep_agg(sf_dir: str) -> pa.Table:
    """The composed pipeline's per-language accounting (oracle-checked):
    docs kept and total tokens after quality filter + exact dedup."""
    from ..functions.tableops import read_clean, small_table

    ds = read_clean(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "text"])
    feat = featurize(ds)
    filtered = quality_filter(feat)
    kept = dedup_keep_rows(filtered, keep_cols=["doc_id", "lang", "n_tokens"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang"]).aggregate(
            [("doc_id", "count"), ("n_tokens", "sum")])
        return g.rename_columns(["lang", "doc_count", "sum_tokens"])

    agg = kept.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(
            Sum("doc_count", alias_name="doc_count"),
            Sum("sum_tokens", alias_name="sum_tokens"))
    return small_table(agg, sort_keys=["lang"],
                       int64_cols=["doc_count", "sum_tokens"]) \
        .select(["lang", "doc_count", "sum_tokens"])
