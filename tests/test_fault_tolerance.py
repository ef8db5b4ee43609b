"""Fault injection: an extract actor dies mid-run; Ray restarts it and
re-executes its task, and the pipeline's output stays EXACT (the
idempotent-sink / unique-output-path design means retried tasks cannot
double-write -- SURVEY section 4 'stragglers/retries')."""

import glob
import os

import duckdb

from go_distributed_log_search_ray.testing import DyingExtractor


def test_actor_death_retry_is_exact(corpus_dir, tmp_path):
    import ray.data
    marker = str(tmp_path / "died.marker")
    files = sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    ds = ds.map_batches(DyingExtractor, fn_constructor_args=(marker,),
                        batch_size=512, batch_format="pyarrow",
                        concurrency=2)
    out = ds.select_columns(["url", "text"])
    got = {r["url"]: r["text"] for r in out.take_all()}

    assert os.path.exists(marker)  # the crash really happened
    oracle = duckdb.connect().execute(f"""
        SELECT url, text FROM read_parquet('{corpus_dir}/pages/*.parquet')
    """).fetchall()
    assert len(got) == len(oracle)
    for url, text in oracle:
        assert got[url] == text


def test_class_attribute_config_is_restart_self_contained(corpus_dir):
    """The flagship's actor pools ship ZERO constructor args
    (ray#53727): config rides on dynamically-created subclasses.  The
    subclasses must (a) construct with no args, (b) behave per their
    baked config, (c) survive a pickle round-trip (what an actor
    restart deserializes) with the config intact."""
    import pickle

    from go_distributed_log_search_ray.stages.enrich import Enricher
    from go_distributed_log_search_ray.stages.extract import HtmlExtractor

    keep = HtmlExtractor.configured(False)
    drop = HtmlExtractor.configured(True)
    assert drop is HtmlExtractor          # default reused, no new class
    assert keep().drop_html is False and drop().drop_html is True
    # pickle round-trip (cloudpickle uses pickle semantics for the
    # dynamic class via its __reduce__ path; plain pickle fails on
    # dynamic classes, so round-trip an INSTANCE through cloudpickle)
    import ray.cloudpickle as cp
    k2 = cp.loads(cp.dumps(keep))
    assert k2().drop_html is False

    lookups_path = os.path.join(corpus_dir, "lookups")
    ecls = Enricher.at(lookups_path)
    e = ecls()                             # loads tables from the path
    assert e.lang_locale and e.site_meta and e.host_geo
    e2cls = cp.loads(cp.dumps(ecls))
    assert e2cls().lang_locale == e.lang_locale
