"""go_1s session workflow: four archives -> .1s products, end to end."""

import gzip
import os

import numpy as np
import pytest

from amaranth_twstft_tpu.models import go1s
from amaranth_twstft_tpu.models.twoway import GatingPolicy
from amaranth_twstft_tpu.utils import matio

FS = 5e6
N_CODES = 300  # 12 s of 40 ms codes
TRUE_OFFSET_NS = 37.5  # injected clock offset


def _archive(path, delay_ns, rng, n=N_CODES, bad_head=5, bad_tail=3,
             gzip_it=True):
    """A claudio-style archive with a given per-code delay series (ns)."""
    delay_samples = np.asarray(delay_ns) * FS / 1e9
    indice = np.floor(delay_samples)
    corr3 = (delay_samples - indice) * 3.0  # correction on the 3x grid
    amp = np.full(n, 1000.0)
    amp[:bad_head] = 10.0  # below the half-max gate
    if bad_tail:
        amp[-bad_tail:] = 10.0
    xval = amp * np.exp(1j * rng.uniform(0, 2 * np.pi, n))
    ch = dict(
        indice=indice,
        correction=corr3,
        snr_r=np.full(n, 5e-4),
        snr_i=np.full(n, 1e-5),
        df=np.full(n, 100.0),
        puissance=np.full(n, 1.0),
        xval=xval,
    )
    raw_path = path[:-3] if path.endswith(".gz") else path
    matio.save_claudio_style(raw_path, ch)
    if gzip_it:
        with open(raw_path, "rb") as f:
            data = f.read()
        with gzip.open(path, "wb") as f:
            f.write(data)
        os.remove(raw_path)
    return path


@pytest.fixture()
def session_dirs(tmp_path):
    rng = np.random.default_rng(3)
    op = tmp_path / "OP"
    lt = tmp_path / "LTFB"
    op.mkdir()
    lt.mkdir()
    ts_op, ts_lt = 1755400003, 1755400007  # same decade (go_1s.m:124)
    codes = np.arange(N_CODES)
    noise = lambda s: rng.normal(0, 0.02, N_CODES)  # noqa: E731
    # loopbacks: flat delays; remotes: loopback + one-way + clock term
    op_lo = 100.0 + noise(0)
    lt_lo = 80.0 + noise(1)
    path_d = 250.0  # common one-way path
    op_re = op_lo + path_d + TRUE_OFFSET_NS + noise(2)
    lt_re = lt_lo + path_d - TRUE_OFFSET_NS + noise(3)
    _archive(str(op / f"localclaudio{ts_op}_2.mat.gz"), op_lo, rng)
    _archive(str(op / f"remoteclaudio{ts_op}_1.mat.gz"), op_re, rng)
    _archive(str(lt / f"localclaudio{ts_lt}_2.mat.gz"), lt_lo, rng)
    _archive(str(lt / f"remoteclaudio{ts_lt}_1.mat.gz"), lt_re, rng)
    return str(op), str(lt)


def test_find_sessions(session_dirs):
    op, lt = session_dirs
    sessions = go1s.find_sessions(op, lt)
    assert len(sessions) == 1
    s = sessions[0]
    assert s.ts_op == 1755400003 and s.ts_lt == 1755400007
    assert "remoteclaudio" in s.op_re and "_1" in s.op_re


def test_process_sessions_recovers_offset(session_dirs, tmp_path):
    op, lt = session_dirs
    out = tmp_path / "out"
    out.mkdir()
    res = go1s.process_sessions(
        op, lt, str(out), fs=FS,
        policy=GatingPolicy(codes_per_second=25),
        verbose=True,
    )
    assert len(res) == 1
    r = res[0]
    # res = 0.5*((opre-oplo)-(ltre-ltlo)) = TRUE_OFFSET_NS
    assert abs(r["res_mean_ns"] - TRUE_OFFSET_NS) < 0.05, r
    assert r["res_std_ns"] < 0.2
    assert r["n_codes"] > 250

    # .1s file: header + one row per second, reference byte format
    path = r["one_s_path"]
    assert path is not None and os.path.exists(path)
    lines = open(path).read().splitlines()
    assert lines[0] == "# MJD\t\tOPlocal\tOPremote\tLTFBlocal\tLTBBremote"
    body = [ln.split("\t") for ln in lines[1:]]
    assert len(body) >= 10  # ~11 full seconds survive gating
    assert all(len(c) == 5 for c in body)
    # columns reproduce the series and the MJD advances 1 s per row
    mjds = np.array([float(c[0]) for c in body])
    # %f rows quantize the MJD to 1e-6 day (the reference's own format)
    np.testing.assert_allclose(np.diff(mjds), 1.0 / 86400.0, atol=1e-6)
    oplo = np.array([float(c[1]) for c in body])
    opre = np.array([float(c[2]) for c in body])
    ltlo = np.array([float(c[3]) for c in body])
    ltre = np.array([float(c[4]) for c in body])
    tw = 0.5 * ((opre - oplo) - (ltre - ltlo))
    np.testing.assert_allclose(tw, TRUE_OFFSET_NS, atol=0.05)

    # idempotent resume: second run skips the session
    res2 = go1s.process_sessions(
        op, lt, str(out), fs=FS, policy=GatingPolicy(codes_per_second=25)
    )
    assert res2 == []


def test_summary_product_roundtrip(session_dirs, tmp_path):
    """Campaign summary rows persist and reconstruct from outputs alone
    (the multi-day series of go_1s.m:356-429 / gofinal_ltfb.m:84-91)."""
    op, lt = session_dirs
    out = tmp_path / "out"
    out.mkdir()
    res = go1s.process_sessions(
        op, lt, str(out), fs=FS, policy=GatingPolicy(codes_per_second=25)
    )
    assert len(res) == 1
    spath = res[0]["summary_path"]
    assert os.path.exists(spath)
    rows = go1s.read_summary(spath)
    assert len(rows) == 1
    r = rows[0]
    for col in ("mjd", "res_mean_ns", "res_std_ns", "res25_std_ns",
                "snr_op_db", "snr_lt_db"):
        assert abs(r[col] - float(res[0][col])) < 1e-5
    assert r["n_codes"] == res[0]["n_codes"]
    # appending the same session again does not duplicate the row
    go1s.append_summary(str(out), res[0])
    assert len(go1s.read_summary(spath)) == 1


def test_gating_drops_low_amplitude_head(session_dirs):
    op, lt = session_dirs
    ses = go1s.find_sessions(op, lt)[0]
    out = go1s.site_delays(ses.op_lo, ses.op_re, FS)
    assert out is not None
    lo_ns, re_ns, snr = out
    # 5 low-amp + 11 dropped codes at the head, low-amp tail trimmed
    assert len(lo_ns) <= N_CODES - 5 - 11 - 3 + 1
    assert len(lo_ns) == len(re_ns)
    np.testing.assert_allclose(lo_ns, 100.0, atol=0.1)


def test_go1s_mjd_matches_reference_formula():
    # 2025-08-17 ~03:06 UTC; MJD of that midnight is 60904
    ts = 1755400000
    mjd = go1s.go1s_mjd(ts)
    assert abs(mjd - (60904.0 + 0.129398 + 0.5 - 0.084)) < 2e-3, mjd


@pytest.fixture()
def session_dirs_phase(tmp_path):
    """Like session_dirs, but the xval phases ENCODE each channel's true
    delay at the 70 MHz IF (phi = -fc*tau) with small phase noise, while
    the code series carries 10x more noise — the physical situation the
    carrier-phase refinement exploits (rxcomplex.cpp:702-744)."""
    fc = 70e6
    rng = np.random.default_rng(5)
    op = tmp_path / "OPp"
    lt = tmp_path / "LTFBp"
    op.mkdir()
    lt.mkdir()
    ts_op, ts_lt = 1755400003, 1755400007
    t = np.arange(N_CODES) / 25.0
    # true delays: level + drift + 150 ps wander; code noise 80 ps
    wander = 0.15 * np.sin(2 * np.pi * 0.25 * t)
    truth = {
        "op_lo": 100.0 + 0.02 * t + wander,
        "lt_lo": 80.0 + 0.02 * t + wander,
    }
    truth["op_re"] = truth["op_lo"] + 250.0 + TRUE_OFFSET_NS
    truth["lt_re"] = truth["lt_lo"] + 250.0 - TRUE_OFFSET_NS
    paths = {
        "op_lo": str(op / f"localclaudio{ts_op}_2.mat.gz"),
        "op_re": str(op / f"remoteclaudio{ts_op}_1.mat.gz"),
        "lt_lo": str(lt / f"localclaudio{ts_lt}_2.mat.gz"),
        "lt_re": str(lt / f"remoteclaudio{ts_lt}_1.mat.gz"),
    }
    for key, tau_ns in truth.items():
        code_ns = tau_ns + rng.normal(0, 0.08, N_CODES)
        phi = -fc * tau_ns * 1e-9 + rng.normal(0, 2e-4, N_CODES)
        delay_samples = code_ns * FS / 1e9
        indice = np.floor(delay_samples)
        amp = np.full(N_CODES, 1000.0)
        amp[:5] = 10.0
        ch = dict(
            indice=indice,
            correction=(delay_samples - indice) * 3.0,
            snr_r=np.full(N_CODES, 5e-4),
            snr_i=np.full(N_CODES, 1e-5),
            df=np.full(N_CODES, 100.0),
            puissance=np.full(N_CODES, 1.0),
            xval=amp * np.exp(2j * np.pi * phi),
        )
        raw = paths[key][:-3]
        matio.save_claudio_style(raw, ch)
        with open(raw, "rb") as f:
            data = f.read()
        with gzip.open(paths[key], "wb") as f:
            f.write(data)
        os.remove(raw)
    return str(op), str(lt)


def test_carrier_refined_products(session_dirs_phase, tmp_path):
    """The refinement wired into the product chain (VERDICT r03 item 4):
    process_sessions re-solves on carrier-smoothed series, the refined
    1 s-std beats the code-only one, the summary carries the refined
    columns and a parallel .1sc product is written."""
    op, lt = session_dirs_phase
    out = tmp_path / "outp"
    out.mkdir()
    res = go1s.process_sessions(
        op, lt, str(out), fs=FS,
        policy=GatingPolicy(codes_per_second=25),
    )
    assert len(res) == 1
    r = res[0]
    # the refined solve still recovers the injected clock offset
    assert abs(r["res_refined_mean_ns"] - TRUE_OFFSET_NS) < 0.05, r
    # and its 1 s-std beats the code-only series' (the whole point)
    assert r["res25_refined_std_ns"] < r["res25_std_ns"], r
    assert r["res25_refined_std_ns"] < 0.01  # < 10 ps
    # summary roundtrip carries the refined columns
    rows = go1s.read_summary(r["summary_path"])
    assert abs(rows[0]["res25_refined_std_ns"]
               - r["res25_refined_std_ns"]) < 1e-5
    # the .1sc product exists with the .1s row format
    onesc = r["one_s_path"][:-3] + ".1sc"
    assert os.path.exists(onesc)
    lines = open(onesc).read().splitlines()
    assert len(lines) >= 10 and all(
        len(ln.split("\t")) == 5 for ln in lines[1:]
    )
    # refinement off: columns are nan, no .1sc
    out2 = tmp_path / "outp2"
    out2.mkdir()
    res2 = go1s.process_sessions(
        op, lt, str(out2), fs=FS,
        policy=GatingPolicy(codes_per_second=25), f_carrier_hz=None,
    )
    assert np.isnan(res2[0]["res25_refined_std_ns"])
    assert not os.path.exists(
        res2[0]["one_s_path"][:-3] + ".1sc"
    )


def test_mjd_name_resolution_no_collision():
    """Session file stems resolve same-day sessions 2 h apart (the
    reference names with Octave num2str's ~9 significant digits; a
    6-digit %g bucketed at 0.1 day and silently skipped the second
    session of the day as 'already done')."""
    from amaranth_twstft_tpu.models.go1s import _mjd_name

    a = _mjd_name(60904.045710648)   # ~01:06 UTC session
    b = _mjd_name(60904.129043981)   # ~03:06 UTC session (next cron slot)
    assert a != b, (a, b)
    # sub-second resolution at MJD magnitudes
    assert _mjd_name(60904.5) != _mjd_name(60904.50002)
