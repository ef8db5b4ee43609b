"""CCNet perplexity bucketing (stages/ccnet.py): NTILE math vs SQL,
exact bucket stats vs a DuckDB oracle, and parallelism stability."""

import duckdb
import numpy as np
import pyarrow as pa
import ray

from go_distributed_log_search_ray.stages.ccnet import (
    ccnet_bucket_stats, ntile_of_rank)


def test_ntile_matches_duckdb():
    con = duckdb.connect()
    for n in (1, 2, 3, 7, 9, 100):
        for k in (2, 3, 4):
            duck = [r[0] for r in con.execute(
                f"SELECT ntile({k}) OVER (ORDER BY i) FROM "
                f"range({n}) t(i)").fetchall()]
            mine = ntile_of_rank(np.arange(n), n, k).tolist()
            assert mine == duck, (n, k)


def _docs():
    rng = np.random.default_rng(11)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]
    rows = []
    for i in range(60):
        n = int(rng.integers(2, 20))
        rows.append(" ".join(rng.choice(vocab, n)))
    rows += ["solo", "", None]          # <2 tokens: out of scope
    return pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                     "text": pa.array(rows, pa.string())})


ORACLE = """
WITH docs AS (
    SELECT doc_id,
           string_split_regex(coalesce(lower(text), ''), '\\s+') AS toks
    FROM docs_in),
pairs AS (
    SELECT doc_id, toks[g.i] AS l, toks[g.i + 1] AS r
    FROM docs JOIN (
        SELECT unnest(generate_series(
            1, (SELECT max(len(toks)) FROM docs) - 1)) AS i) g
      ON g.i < len(toks)
    WHERE toks[g.i] <> '' AND toks[g.i + 1] <> ''),
uni AS (SELECT t.tok AS term, count(*) AS n
        FROM docs, unnest(toks) AS t(tok) WHERE t.tok <> '' GROUP BY 1),
bi AS (SELECT l, r, count(*) AS n FROM pairs GROUP BY 1, 2),
icp AS (SELECT bi.l, bi.r, (uni.n * 1000) // bi.n AS icp
        FROM bi JOIN uni ON uni.term = bi.l),
scored AS (
    SELECT p.doc_id,
           CAST(CAST(sum(icp.icp) AS BIGINT) // count(*) AS BIGINT)
               AS surprise
    FROM pairs p JOIN icp USING (l, r) GROUP BY p.doc_id),
tiled AS (
    SELECT surprise,
           ntile(3) OVER (ORDER BY surprise, doc_id) AS tile
    FROM scored)
SELECT CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                 ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       min(surprise) AS min_surprise,
       max(surprise) AS max_surprise,
       CAST(sum(surprise) AS BIGINT) AS surprise_sum
FROM tiled GROUP BY tile ORDER BY tile
"""


def test_bucket_stats_match_oracle_and_parallelism_stable():
    t = _docs()
    con = duckdb.connect()
    con.register("docs_in", t.to_pandas())
    oracle = con.execute(ORACLE).fetch_df()
    outs = []
    for parts in (1, 11):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(ccnet_bucket_stats(ds).to_pandas())
    assert outs[0].equals(outs[1])
    mine = outs[0]
    assert list(mine["bucket"]) == ["head", "middle", "tail"]
    for col in ("n_docs", "min_surprise", "max_surprise", "surprise_sum"):
        assert list(mine[col]) == list(oracle[col]), col
    # head is the fluent tier: its max surprise <= middle's min
    assert mine["max_surprise"][0] <= mine["min_surprise"][1]
    assert mine["max_surprise"][1] <= mine["min_surprise"][2]


def test_empty_corpus():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = ccnet_bucket_stats(ds)
    assert out.num_rows == 0
    assert out.column_names == ["bucket", "n_docs", "min_surprise",
                                "max_surprise", "surprise_sum"]
