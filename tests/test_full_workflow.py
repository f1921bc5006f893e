"""The complete reference-user workflow, end to end, through the CLI.

One test walks the whole production path a reference operator runs
across machines and cron slots (SURVEY.md §1 L3-L7): acquisition
(fc32 stream -> sc16 capture), per-epoch processing at both sites,
claudio-style archives, the go_1s session solve with carrier
refinement, and the campaign products with an operator step table.
"""

import gzip
import io as _io
import json
import os
import shutil

import numpy as np

from amaranth_twstft_tpu import cli, pipeline
from amaranth_twstft_tpu.config import ProcessingConfig
from amaranth_twstft_tpu.models import campaign, go1s
from amaranth_twstft_tpu.models.twoway import GatingPolicy
from amaranth_twstft_tpu.ops.lfsr import prn_chips, write_prn_file
from amaranth_twstft_tpu.ops.prn import chips_to_pm1, upsample_zoh
from amaranth_twstft_tpu.utils import matio
from amaranth_twstft_tpu.utils.recorder import record_fc32_stream

X_NS = 37.5  # injected clock offset
PATH_NS = 5000.0


def _site_stream(code, L, fs, lo_ns, re_ns, n_seconds, rng):
    """Interleaved fc32 bytes for one site's 2-channel capture
    (ch1 = remote at re_ns, ch2 = loopback at lo_ns)."""
    n_sec = int(fs)
    fs_ns = 1e9 / fs
    k = np.fft.fftfreq(L)
    t = np.arange(n_sec) / fs

    def chan(d_ns, dop, amp):
        c = np.fft.ifft(np.fft.fft(code) * np.exp(-2j * np.pi * k
                                                  * (d_ns / fs_ns)))
        z = amp * np.tile(c, n_sec // L) * np.exp(2j * np.pi * dop * t)
        return z + rng.normal(0, 0.0003, n_sec) \
            + 1j * rng.normal(0, 0.0003, n_sec)

    ch1 = chan(re_ns, 90.0, 0.025)
    ch2 = chan(lo_ns, 4.0, 0.05)
    sec = np.empty(2 * n_sec, np.complex64)
    sec[0::2] = ch1
    sec[1::2] = ch2
    return sec.tobytes() * n_seconds


def test_full_workflow_acquire_to_campaign(small_cfg, tmp_path):
    cfg = small_cfg
    L = cfg.samples_per_code
    fs = cfg.fs
    code_path = str(tmp_path / "code.bin")
    write_prn_file(code_path, cfg.bit_len, cfg.code_len, cfg.taps)
    code = chips_to_pm1(
        upsample_zoh(prn_chips(cfg.bit_len, cfg.taps, cfg.code_len),
                     cfg.samples_per_chip),
        np.float64,
    )
    rng = np.random.default_rng(9)
    n_seconds = 5

    # L4 acquisition: the fc32 stream through the recorder (b210_file
    # stages) -> sc16 captures, one per site
    sites = {"OP": (20000.0, 20000.0 + PATH_NS + X_NS),
             "LTFB": (16000.0, 16000.0 + PATH_NS - X_NS)}
    caps = {}
    for site, (lo_ns, re_ns) in sites.items():
        stream = _site_stream(code, L, fs, lo_ns, re_ns, n_seconds, rng)
        cap = str(tmp_path / f"{site}.bin")
        got = record_fc32_stream(
            _io.BytesIO(stream), cap, fs, n_seconds, channels=2
        )
        assert got == n_seconds * int(fs)
        caps[site] = cap

    # L5 per-epoch processing at both sites -> claudio-style archives
    ts = {"OP": 1755400003, "LTFB": 1755400007}
    dirs = {}
    # nint=7: the parabola S-curve bias scales with the sample period
    # (13.5 ps at production Ts=200 ns for nint=4 -> ~0.7 ns at this
    # geometry's 10 us samples); the finer grid keeps the workflow
    # assertion delay-bias-free (PARITY deviation 11)
    nint = 7
    R = 2 * nint + 1
    proc = ProcessingConfig(hamming_window=True, nint=nint)
    for site, cap in caps.items():
        out = pipeline.process_capture_overlapped(
            cap, code_path, cfg, proc, batch_epochs=25,
            out_mat=str(tmp_path / f"{site}.mat"),
        )
        ddir = tmp_path / f"dir_{site}"
        ddir.mkdir()
        for chkey, name in (("ch2", f"localclaudio{ts[site]}_2.mat"),
                            ("ch1", f"remoteclaudio{ts[site]}_1.mat")):
            ch = out[chkey]
            ind = np.asarray(ch["indice"])
            cor = np.asarray(ch["correction"])
            raw = str(ddir / name)
            matio.save_claudio_style(
                raw,
                dict(indice=ind // R, correction=(ind % R) + cor,
                     snr_r=ch["snr_r"], snr_i=ch["snr_i"],
                     df=np.full(len(ind), out["df"][0]),
                     puissance=ch["puissance"], xval=ch["xval"]),
            )
            with open(raw, "rb") as f:
                data = f.read()
            with gzip.open(raw + ".gz", "wb") as f:
                f.write(data)
            os.remove(raw)
        dirs[site] = str(ddir)

    # L6 session solve (go_1s semantics + carrier refinement)
    out_dir = tmp_path / "products"
    out_dir.mkdir()
    # the production GatingPolicy constants are written for Ts=200 ns;
    # for_signal scales the Ts-derived levels to this geometry (the
    # production ambiguity fold would otherwise shift noise-tail codes
    # by 66.7 ns and bias the session mean)
    policy = GatingPolicy.for_signal(cfg, nint=nint)
    res = go1s.process_sessions(
        dirs["OP"], dirs["LTFB"], str(out_dir), fs=fs, nint=nint,
        policy=policy,
    )
    assert len(res) == 1
    r = res[0]
    assert abs(r["res_mean_ns"] - X_NS) < 1.0, r
    assert abs(r["res_refined_mean_ns"] - X_NS) < 1.0, r
    # NOTE: at this synthetic SNR the code-tracking noise sits BELOW the
    # carrier-phase floor (unphysical for a real link), so refined <=
    # code does not apply here — that ordering is asserted at realistic
    # SNR by test_go1s.py::test_carrier_refined_products and measured in
    # the bench rehearsal; here both just have to be clean series
    assert r["res25_refined_std_ns"] < 0.2, r
    assert r["res25_std_ns"] < 0.2, r
    onesc = r["one_s_path"][:-3] + ".1sc"
    assert os.path.exists(r["one_s_path"]) and os.path.exists(onesc)

    # L7 campaign products via the CLI, with an operator step table
    steps = tmp_path / "steps.txt"
    steps.write_text("60000 0.0\n")  # no-op step: exercise the path
    png = str(tmp_path / "campaign.png")
    args = ["campaign", str(out_dir), "--corrections", str(steps)]
    try:
        import matplotlib  # noqa: F401

        args += ["--plot", png]
    except ImportError:
        png = None
    rc = cli.main(args)
    assert rc == 0
    tsv = os.path.join(out_dir, "campaign.tsv")
    assert os.path.exists(tsv)
    rm = np.loadtxt(os.path.join(out_dir, "resmean25.txt"), ndmin=1)
    assert len(rm) == 1
    if png:
        assert os.path.getsize(png) > 5000

    # idempotent resume across the whole chain: nothing reprocesses
    res2 = go1s.process_sessions(
        dirs["OP"], dirs["LTFB"], str(out_dir), fs=fs, nint=nint,
        policy=policy,
    )
    assert res2 == []
    shutil.rmtree(out_dir)
