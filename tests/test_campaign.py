"""Campaign products: step corrections, fold, text series, figure.

Reference behavior: ``acquisition/go_1s.m:356-429`` — the display fold
``s = mod(resmean25, 200/(2N+1)/2); s(s>10) -= half``, the per-MJD step
corrections (+6.5 ns after 60904, -5.5+1.29 ns after 60926.5), the
``ladate``/``resmean25`` text series, and the campaign figures.
"""

import json
import os

import numpy as np
import pytest

from amaranth_twstft_tpu import cli
from amaranth_twstft_tpu.models import campaign, go1s
from amaranth_twstft_tpu.models.campaign import StepCorrection


def test_fold_half_window_matches_reference_formula():
    # N=1: half = 200/3/2 = 33.333; mod then shift values > 10 down
    s = campaign.fold_half_window(np.array([5.0, 105.0, 12.0, -3.0]), 1)
    half = 200.0 / 3.0 / 2.0
    # 5 -> 5; 105 mod 33.33 = 5; 12 > 10 -> 12-33.33; -3 mod -> 30.33 ->
    # >10 -> -3
    np.testing.assert_allclose(s, [5.0, 105 % half, 12 - half, -3.0],
                               atol=1e-9)


def test_step_corrections_reference_table():
    """The reference's own hard-coded 2024-25 campaign steps, expressed
    as a table, reproduce go_1s.m:361-365 exactly."""
    mjd = np.array([60900.0, 60910.0, 60926.5, 60927.0, 60940.0])
    base = np.zeros(5)
    table = [
        StepCorrection(60904.0, 6.5),
        StepCorrection(60926.5, -5.5 + 1.29),
    ]
    out = campaign.apply_step_corrections(mjd, base, table)
    # strictly-after semantics: 60926.5 itself only gets the first step
    np.testing.assert_allclose(
        out, [0.0, 6.5, 6.5, 6.5 - 5.5 + 1.29, 6.5 - 5.5 + 1.29]
    )


def test_load_corrections_both_formats(tmp_path):
    j = tmp_path / "c.json"
    j.write_text(json.dumps([[60904.0, 6.5],
                             {"mjd_after": 60926.5, "offset_ns": -4.21}]))
    t = tmp_path / "c.txt"
    t.write_text("# steps\n60904 6.5\n60926.5 -4.21\n")
    for p in (j, t):
        table = campaign.load_corrections(str(p))
        assert table[0] == StepCorrection(60904.0, 6.5)
        assert table[1].mjd_after == 60926.5
        assert abs(table[1].offset_ns + 4.21) < 1e-12


def _summary_rows():
    rows = []
    for i, (mjd, res25) in enumerate(
        [(60900.0, 3.0), (60910.0, 3.2), (60930.0, 2.8), (60935.0, 0.0)]
    ):
        rows.append(dict(
            mjd=mjd, res_mean_ns=res25, res_std_ns=0.3,
            res25_mean_ns=res25, res25_std_ns=0.05,
            filtered_std_ns=0.04, n_flagged=0,
            snr_op_db=50.0 + i, snr_lt_db=48.0 - i, n_codes=7000,
            res_refined_mean_ns=res25 - 0.01,
            res25_refined_std_ns=0.005,
        ))
    return rows


def test_campaign_series_and_writer(tmp_path):
    rows = _summary_rows()
    table = [StepCorrection(60904.0, 1.5)]
    series = campaign.campaign_series(rows, nint=1, corrections=table)
    # the resmean==0 session is dropped (go_1s.m:344)
    assert len(series["ladate"]) == 3
    np.testing.assert_allclose(series["ladate"], [60900, 60910, 60930])
    # fold is identity here (<10 ns), steps applied after 60904
    np.testing.assert_allclose(series["resmean25"], [3.0, 4.7, 4.3])
    np.testing.assert_allclose(series["resmean25_raw"], [3.0, 3.2, 2.8])
    np.testing.assert_allclose(series["resmean25_refined"],
                               [2.99, 4.69, 4.29])
    paths = campaign.write_campaign_series(str(tmp_path), series)
    lad = np.loadtxt(os.path.join(tmp_path, "ladate.txt"))
    rm = np.loadtxt(os.path.join(tmp_path, "resmean25.txt"))
    np.testing.assert_allclose(lad, series["ladate"])
    np.testing.assert_allclose(rm, series["resmean25"], atol=1e-6)
    assert any(p.endswith("campaign.tsv") for p in paths)


def test_campaign_cli_with_plot(tmp_path):
    pytest.importorskip("matplotlib")
    out = tmp_path / "camp"
    out.mkdir()
    for r in _summary_rows():
        go1s.append_summary(str(out), r)
    corr = tmp_path / "steps.txt"
    corr.write_text("60904 1.5\n")
    png = str(tmp_path / "campaign.png")
    rc = cli.main([
        "campaign", str(out), "--corrections", str(corr), "--plot", png,
    ])
    assert rc == 0
    assert os.path.exists(png) and os.path.getsize(png) > 5000
    rm = np.loadtxt(os.path.join(out, "resmean25.txt"))
    np.testing.assert_allclose(rm, [3.0, 4.7, 4.3], atol=1e-6)


def test_session_slope_diagnostic():
    """240527 go.m:78-84: quadratic-fit linear coefficient = slope
    (ns/s), 25-smoothed detrended residual std = session noise."""
    from amaranth_twstft_tpu.models.twoway import session_slope

    rng = np.random.default_rng(2)
    t = np.arange(750) / 25.0
    s = 5000.0 + 2.5 * t + 0.1 * t**2 + rng.normal(0, 0.05, 750)
    slope, std = session_slope(s, 25)
    assert abs(slope - 2.5) < 0.05, slope
    assert std < 0.05  # smoothing cuts the 50 ps noise ~5x
    # NaN-robust; degenerate input
    s[::3] = np.nan
    slope2, _ = session_slope(s, 25)
    assert abs(slope2 - 2.5) < 0.05
    assert np.isnan(session_slope(np.full(2, np.nan), 25)[0])
