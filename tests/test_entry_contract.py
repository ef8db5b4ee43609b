"""Driver-contract invariants over __ray_entry__ (no pipelines run).

The driver imports this module after its own ray.init and trusts three
properties the code itself never re-checks: registry names are unique
(a duplicate dict key would silently shadow a query), every oracle
belongs to a registered query, and the first-50 window -- the only
slice the driver's correctness gate records -- contains full-oracle
entries only (a rows-only entry there would burn a gate slot on the
weaker check; BASELINE.md documents that policy).
"""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entry

DRIVER_WINDOW = 50


def test_registry_names_unique_and_callable():
    qs = entry.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    assert all(callable(fn) for fn in qs.values())


def test_every_oracle_has_a_query():
    qs = entry.queries()
    orphans = set(entry.oracle_sql()) - set(qs)
    assert not orphans, f"oracle_sql keys without queries(): {orphans}"


def test_driver_window_is_full_oracle():
    names = list(entry.queries())[:DRIVER_WINDOW]
    osql = entry.oracle_sql()
    rows_only = [n for n in names if n not in osql]
    assert not rows_only, (
        f"rows-only entries occupy driver-window slots: {rows_only}")


def test_oracle_sql_mentions_only_resolvable_relations():
    # the driver pre-registers exactly these views; an oracle naming
    # any other base relation fails only at gate time, which is too
    # late.  Every FROM/JOIN identifier must be a registered view, a
    # CTE defined in the same statement, or a table function.
    import re
    known = {"region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "documents", "embeddings"}
    fns = {"unnest", "read_parquet", "generate_series", "range",
           "values", "lateral", "glob"}
    for name, sql in entry.oracle_sql().items():
        # extract(hour FROM ts) / substring(x FROM 1) / trim(x FROM y)
        # carry a FROM that names a column, not a relation
        sql = re.sub(r"\b(?:extract|substring|trim)\s*\([^()]*\)", "()",
                     sql, flags=re.IGNORECASE)
        ctes = {m.group(1).lower() for m in re.finditer(
            r"(?:WITH|,)\s*(?:RECURSIVE\s+)?([a-z_][a-z0-9_]*)"
            r"(?:\s*\([^)]*\))?\s+AS\s+(?:NOT\s+)?(?:MATERIALIZED\s+)?\(",
            sql, re.IGNORECASE)}
        for m in re.finditer(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)\b",
                             sql, re.IGNORECASE):
            t = m.group(1).lower()
            assert t in known or t in ctes or t in fns, (
                f"{name}: relation {t!r} is neither a registered view, "
                f"a CTE, nor a table function")
