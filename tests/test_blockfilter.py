"""C4-style blocklist screening (stages/blockfilter.py): word-boundary
semantics, distinct-term counting, null tolerance, parallelism-stable
docfreq fold, and RE2/DuckDB pattern parity."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import ray

from go_distributed_log_search_ray.stages.blockfilter import (
    blocklist_screen, blocklist_term_docfreq, term_patterns)

TERMS = ["spam", "click here", "c++"]


def _docs():
    txt = [
        "pure SPAM and more spam",          # 1 distinct term, 2 hits
        "please Click Here now",            # phrase, case-insensitive
        "spamming is not spam-free spam",   # boundary: hyphen + suffix
        "i like c++ a lot",                 # regex specials escaped
        "clean document entirely",          # no hits
        "spam click here c++",              # all three
        "",                                 # empty
        None,                               # null
    ]
    return pa.table({"doc_id": pa.array(range(len(txt)), pa.int64()),
                     "text": pa.array(txt, pa.string())})


def test_screen_flags_and_counts():
    ds = ray.data.from_arrow(_docs()).repartition(3)
    out = blocklist_screen(ds, TERMS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_blocked_terms"]) == [1, 1, 1, 1, 0, 3, 0, 0]
    assert list(out["blocked"]) == [True, True, True, True,
                                    False, True, False, False]
    # all input columns ride along
    assert "text" in out.columns


def test_boundary_semantics():
    # "spamming" must NOT match \bspam\b; "spam-free" MUST (hyphen is
    # a word boundary); "c++" matches literally, not as regex
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["spamming only", "spam-free", "ccc plus"],
                         pa.string())}))
    out = blocklist_screen(ds, TERMS).to_pandas().sort_values("doc_id")
    assert list(out["blocked"]) == [False, True, False]


def test_docfreq_fold_parallelism_stable():
    t = _docs()
    outs = []
    for parts in (1, 5):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(blocklist_term_docfreq(ds, TERMS))
    assert outs[0].equals(outs[1])
    got = dict(zip(outs[0].column("term").to_pylist(),
                   outs[0].column("n_docs").to_pylist()))
    assert got == {"spam": 3, "click here": 2, "c++": 2}


def test_docfreq_includes_zero_hit_terms():
    ds = ray.data.from_arrow(_docs())
    out = blocklist_term_docfreq(ds, ["absentterm", "spam"])
    got = dict(zip(out.column("term").to_pylist(),
                   out.column("n_docs").to_pylist()))
    assert got == {"absentterm": 0, "spam": 3}


def test_re2_duckdb_parity():
    """The exact patterns the stage scans must give DuckDB the same
    verdicts (both engines are RE2; this is the oracle contract)."""
    t = _docs()
    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    low = pc.fill_null(pc.utf8_lower(t.column("text")), "")
    for pat in term_patterns(TERMS):
        duck = [r[0] for r in con.execute(
            "SELECT regexp_matches(coalesce(lower(text), ''), ?) "
            "FROM docs ORDER BY doc_id", [pat]).fetchall()]
        arrow = pc.match_substring_regex(low, pat).to_pylist()
        assert duck == arrow, pat
