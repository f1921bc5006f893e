"""On-device (TPU) regression tests — OPT-IN, run by ``bench.py``.

Unlike ``tests/`` (which forces the CPU backend), these run on whatever
accelerator the process already holds — bench.py invokes them in-process
after its measurement runs so the relay-compiled programs are warm in
the persistent compile cache.  Standalone: ``pytest tests_tpu -m tpu``
(NEVER while another process holds the axon TPU).

Every test here regression-checks a PARITY.md deviation that CPU tests
cannot see (TPU bf16 dot defaults, transfer-format quantization on
device, staged-FFT precision) — VERDICT r03 item 8.
"""

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    for item in items:
        item.add_marker(pytest.mark.tpu)


@pytest.fixture(scope="session")
def accel():
    """The live accelerator platform, or skip (CPU smoke runs)."""
    import jax

    platform = jax.devices()[0].platform
    if platform == "cpu":
        pytest.skip("no accelerator in this process (CPU backend)")
    from amaranth_twstft_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    return platform


@pytest.fixture(scope="session")
def prod_cfg():
    from amaranth_twstft_tpu.config import SignalConfig

    return SignalConfig()  # production geometry: L=200000, fs=5 MS/s


@pytest.fixture(scope="session")
def prod_code(prod_cfg):
    """(code_f64, spectrum_f64, hamming) at production geometry."""
    from amaranth_twstft_tpu.ops.lfsr import prn_chips
    from amaranth_twstft_tpu.ops.prn import chips_to_pm1, hamming, upsample_zoh

    chips = prn_chips(prod_cfg.bit_len, prod_cfg.taps, prod_cfg.code_len)
    code64 = chips_to_pm1(
        upsample_zoh(chips, prod_cfg.samples_per_chip), np.float64
    )
    return code64, np.fft.fft(code64), hamming(prod_cfg.samples_per_code)
