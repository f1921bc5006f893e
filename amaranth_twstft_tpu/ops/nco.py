"""LUT-based numerically controlled oscillator (reference tutorial gateware).

Behavioral model of ``Doc/EuGRD_tutorial/slides_nath/src/NCO.py:1-60``: a
phase accumulator incremented by ``fcw = f_out * unit`` every tick indexes
the top `resol` bits into a 2**resol-entry quantized cosine table.  The
tutorial uses it as the pedagogical DDS for the `myradio` example; here it
doubles as a spur model — `nco_spur_floor` quantifies the phase-truncation
spurs that motivated the production gateware's *square* carrier + analog
filtering instead of a DDS (``amaranth_twstft/oscillator.py``).

Vectorized numpy, exact integer phase arithmetic (no drift).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["make_cosine_lut", "nco_wave", "nco_spur_floor"]


def make_cosine_lut(resol: int) -> np.ndarray:
    """The tutorial's quantized cosine table (``NCO.py:25-32``).

    2**resol unsigned entries: ``int((cos(2 pi i / pts) + 1) / 2 * (pts-1))``.
    """
    pts = 1 << resol
    i = np.arange(pts)
    val = np.cos(i * 2 * np.pi / pts)
    return ((val + 1.0) / 2.0 * (pts - 1)).astype(np.int64)


def nco_wave(
    tick_freq: float,
    f_out: float,
    n: int,
    resol: int = 8,
    granularity: float = 1.0,
    exact: bool = False,
) -> np.ndarray:
    """`n` NCO output samples at `tick_freq` for programmed `f_out` Hz.

    Accumulator sizing per ``NCO.py:12-15``: acc_size = ceil(log2(F/g)),
    gain_bits = ceil(log2(F)); the frequency control word is
    ``round(f_out) * unit`` with unit = 2**ceil(log2(F^2/g)) / F.
    Returns unsigned LUT values in [0, 2**resol - 1].

    REFERENCE QUIRK (reproduced bit-faithfully, ``exact=False``): the
    tutorial sizes the unit exponent as ceil(log2(F^2/g)) but the
    accumulator as acc_size+gain_bits = ceil(log2(F/g))+ceil(log2(F));
    whenever frac(log2 F) < 0.5 those differ by one bit and the
    GATEWARE ITSELF outputs HALF the programmed frequency (e.g. at the
    production 280 MHz tick: log2 F = 28.06, accumulator 58 bits, unit
    2^57/F -> f_out/2).  The tutorial's own 2 MHz examples have
    frac(log2 F) = 0.93 and mask it.  ``exact=True`` derives the unit
    from the accumulator width (2**acc_bits / F) so the programmed
    frequency is produced at every tick rate — the corrected design.
    """
    gain_bits = math.ceil(math.log2(tick_freq))
    acc_size = math.ceil(math.log2(tick_freq / granularity))
    acc_bits = acc_size + gain_bits
    if exact:
        unit = int((1 << acc_bits) / tick_freq)
    else:
        unit = int(2 ** math.ceil(math.log2(tick_freq * tick_freq / granularity)) / tick_freq)
    fcw = int(round(f_out)) * unit
    lut = make_cosine_lut(resol)
    acc = (np.arange(n, dtype=np.uint64) * np.uint64(fcw)) & np.uint64(
        (1 << acc_bits) - 1
    )
    idx = (acc >> np.uint64(acc_bits - resol)).astype(np.int64)
    return lut[idx]


def nco_spur_floor(
    tick_freq: float, f_out: float, n: int = 1 << 14, resol: int = 8
) -> float:
    """Worst spur level (dBc) of the NCO output — the DDS design metric.

    Phase truncation to `resol` LUT bits bounds spurs near -6.02*resol dBc;
    the test suite checks the model obeys that bound.
    """
    x = nco_wave(tick_freq, f_out, n, resol).astype(np.float64)
    x -= x.mean()
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    k0 = int(np.argmax(spec))
    carrier = spec[k0]
    spec[max(0, k0 - 3) : k0 + 4] = 0.0
    return 20.0 * np.log10(np.max(spec) / carrier)
