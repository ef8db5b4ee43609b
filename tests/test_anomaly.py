"""events_type_anomaly (pipelines/relational.py): exact-integer
trailing-window 3-sigma decision over dense per-type hourly series --
spike detection, zero-variance windows, the exactly-tau boundary
(strict inequality: 3.0 sigma exactly must NOT flag), and silent-hour
densification across the global hour range."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from go_distributed_log_search_ray.pipelines.relational import (
    events_type_anomaly)

H0 = pd.Timestamp("2024-01-01 00:00:00")


def _write_events(tmp_path, per_hour: dict[str, list[int]]):
    rows_t, rows_ty, rows_u, rows_v, rows_p, rows_id = [], [], [], [], [], []
    i = 0
    for etype, counts in per_hour.items():
        for h, c in enumerate(counts):
            for j in range(c):
                rows_t.append(H0 + pd.Timedelta(hours=h, seconds=j))
                rows_ty.append(etype)
                rows_u.append(i); rows_v.append(1.0); rows_p.append("{}")
                rows_id.append(i); i += 1
    tbl = pa.table({
        "event_id": pa.array(rows_id, pa.int64()),
        "ts": pa.array(rows_t, pa.timestamp("us")),
        "user_id": pa.array(rows_u, pa.int64()),
        "event_type": pa.array(rows_ty, pa.string()),
        "value": pa.array(rows_v, pa.float64()),
        "props": pa.array(rows_p, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_spike_flagged_boundary_not(tmp_path):
    # spike: constant 5 for 8 hours, then 50 -> the zero-variance
    # window flags ANY deviation, and 50 certainly.
    # exact: window [0,0,0,6,6,6] has S=18, Q=108, 6Q-S^2=324=18^2,
    # so c=12 sits at EXACTLY 3 sigma ((72-18)^2 = 2916 = 9*324) and
    # must not flag; later hours sit at the window mean.
    sf = _write_events(tmp_path, {
        "spike": [5, 5, 5, 5, 5, 5, 5, 5, 50],
        "exact": [0, 0, 0, 6, 6, 6, 12, 5, 6],
    })
    out = events_type_anomaly(sf).to_pandas()
    spike_epoch = int((H0 + pd.Timedelta(hours=8)).timestamp())
    assert out[["event_type", "hour_epoch", "cnt", "win_sum",
                "win_sumsq"]].values.tolist() == \
        [["spike", spike_epoch, 50, 30, 150]]


def test_silent_hours_densified(tmp_path):
    # a type that goes SILENT is a drop anomaly: constant 9 for six
    # hours then zero rows forever -- the densified series flags the
    # first silent hour (zero-variance window, c=0 != 9).  The global
    # range comes from a second type that keeps emitting.
    sf = _write_events(tmp_path, {
        "dropped": [9, 9, 9, 9, 9, 9, 0, 0, 0],
        "steady": [3, 3, 3, 3, 3, 3, 3, 3, 3],
    })
    out = events_type_anomaly(sf).to_pandas()
    flagged = out[out.event_type == "dropped"]
    first = int((H0 + pd.Timedelta(hours=6)).timestamp())
    assert first in flagged.hour_epoch.tolist()
    assert flagged[flagged.hour_epoch == first].cnt.iloc[0] == 0
    assert "steady" not in out.event_type.tolist()
