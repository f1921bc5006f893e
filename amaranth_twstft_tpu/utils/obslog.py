"""Observability: per-epoch science rows and timestamped event logs.

The reference's observability is stdout rows ``n dt df P SNR``
(``godual_ranging.m:74,96``), an append-only event log ``rxcomplex.log``
(``rxcomplex.cpp:439-441,580-583,756-793``) and per-run ``$date.log``
files (``gosampling.sh:14``).  This module reproduces those as structured
helpers with machine-parsable output.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

__all__ = ["EpochRow", "EventLog", "format_epoch_row"]


@dataclass
class EpochRow:
    """One science row (``godual_ranging.m:96`` column order)."""

    n: int
    dt_s: float
    df_hz: float
    p_db: float
    snr_db: float


def format_epoch_row(row: EpochRow) -> str:
    """Tab row matching the reference printout precision
    (``%d %.12f %.3f %.1f %.1f``)."""
    return (
        f"{row.n}\t{row.dt_s:.12f}\t{row.df_hz:.3f}\t{row.p_db:.1f}"
        f"\t{row.snr_db:.1f}"
    )


class EventLog:
    """Append-only timestamped event log (the ``rxcomplex.log`` role).

    Events are JSON lines: replayable, greppable, and the basis for the
    failure-detection tests (lock loss, slips, PPS quality in the
    reference; SURVEY.md §5).
    """

    def __init__(self, path: str | None = None):
        self.path = path
        self.events: list[dict] = []

    def emit(self, kind: str, **fields) -> dict:
        ev = {"t": time.time(), "kind": kind, **fields}
        self.events.append(ev)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(ev) + "\n")
        return ev

    def of_kind(self, kind: str) -> list[dict]:
        return [e for e in self.events if e["kind"] == kind]
