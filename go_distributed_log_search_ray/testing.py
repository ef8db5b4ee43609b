"""Fault-injection helpers (importable by Ray workers -- classes defined
in pytest test modules can't be unpickled inside worker processes)."""

from __future__ import annotations

import os

import pyarrow as pa

from .stages.extract import HtmlExtractor


class DyingExtractor(HtmlExtractor):
    """First actor to process a batch kills its own process (simulating a
    worker/node loss).  A marker file makes the crash happen at most once
    per marker across the run; restarted actors see the marker and
    proceed.  Used to evidence that Ray's actor restart + task retry
    keeps pipeline output exact (SURVEY section 4, stragglers/retries).
    """

    def __init__(self, marker: str) -> None:
        super().__init__()
        self.marker = marker

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not os.path.exists(self.marker):
            with open(self.marker, "w") as f:
                f.write("died")
            os._exit(1)          # hard kill: not an application exception
        return super().__call__(batch)
