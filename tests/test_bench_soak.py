"""bench.bench_session_soak glue, CPU-scale: the full reference-shaped
session (two stations -> 4 claudio archives -> go1s solve -> .1s
products -> campaign series + figure) at a small signal geometry.

The driver's round-end bench runs the same function at production
geometry on the chip; this test pins the chain GLUE (file naming,
archive conventions, window scaling, policy scaling, ambiguity-folded
truth) where it is cheap to run every time."""

import sys

import numpy as np
import pytest  # noqa: F401  (fixtures)


def test_session_soak_glue(small_cfg, tmp_path, monkeypatch):
    sys.modules.pop("bench", None)
    import bench

    monkeypatch.setitem(bench.RESULTS, "link_h2d_mbps", 1e9)  # CPU: no link
    out = bench.bench_session_soak(
        small_cfg, str(tmp_path), budget_s=1e9,
        target_seconds=12, min_seconds=12, noise_sigma=60.0,
    )
    assert out is not None
    assert out["session_seconds_per_site"] == 12
    # 4 archives -> one solved session with .1s (+ refined .1sc) products
    assert any(p.endswith(".1s") for p in out["session_products"])
    assert any(p.endswith(".1sc") for p in out["session_products"])
    assert "campaign.png" in out["session_campaign_files"]
    # the injected clock offset x survives the full chain to a fraction
    # of the scaled sample period (fs_ns/8 — claudio parabola bias and
    # gating noise at this tiny geometry dominate)
    fs_ns = 1e9 / small_cfg.fs
    assert out["session_offset_err_ps"] < fs_ns / 8 * 1e3, out
    assert out["session_chains_s"] > 0 and out["session_solve_s"] > 0
