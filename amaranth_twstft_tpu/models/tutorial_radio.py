"""Tutorial standalone FM radio — behavioral model of the EuGRD gateware.

Reference: ``Doc/EuGRD_tutorial/slides_nath/src/Prescaler.py:26-42`` (the
clock prescaler) and ``.../myradio.py:49-145`` (the complete pedagogical
radio: a sample-rate prescaler gates an 8-bit audio NCO whose LUT output
FM-modulates a 1-bit radio NCO around a 70 MHz carrier, driven by a
note "partition" stepped by a beat prescaler).  These close the last
§2.4 tutorial item of SURVEY.md; the production emitter never uses them
(the production carrier is the square :class:`Oscillator` — see
``ops/nco.py`` for why the DDS was rejected).

Exact integer phase arithmetic throughout (uint64 wraparound cumsum is
exact modulo ``2**acc_bits`` for ``acc_bits <= 64``), matching
``ops.nco.nco_wave``'s accumulator sizing — including the reference's
halved-frequency unit-exponent quirk (``exact=False``) and the
corrected sizing (``exact=True``).
"""

from __future__ import annotations

import math

import numpy as np

from amaranth_twstft_tpu.ops.nco import make_cosine_lut

__all__ = [
    "NOTES",
    "TETRIS_PARTITION",
    "get_partition",
    "prescaler_wave",
    "myradio_waveform",
    "partition_to_samples",
]

#: the tutorial's note table (``myradio.py:15-30``; note si2 = 2*la —
#: the reference's own typo, reproduced)
NOTES = {
    "silence": 0, "do": 262, "re": 294, "mi": 329, "fa": 349,
    "sol": 392, "la": 440, "si": 493,
    "do2": 524, "re2": 588, "mi2": 658, "fa2": 698,
    "sol2": 784, "la2": 880, "si2": 880,
}

#: the Tetris partition of ``myradio.py:148-192`` as (note, beats) pairs
TETRIS_PARTITION = (
    "mi2", 2, "si", 1, "do2", 1, "re2", 2, "do2", 1, "si", 1,
    "la", 2, "la", 1, "do2", 1, "mi2", 2, "re2", 1, "do2", 1,
    "si", 3, "do2", 1, "re2", 2, "mi2", 2,
    "do2", 2, "la", 2, "la", 4,
    "silence", 1, "re2", 2, "fa2", 1, "la2", 2, "sol2", 1, "fa2", 1,
    "mi2", 2, "silence", 1, "do2", 1, "mi2", 2, "re2", 1, "do2", 1,
    "si", 3, "do2", 1, "re2", 2, "mi2", 2,
    "do2", 2, "la", 2, "la", 4,
)


def get_partition(*args) -> list[int]:
    """(note, duration, note, duration, ...) -> flat per-beat note list
    (``myradio.py:33-46``); notes may be Hz ints or ``NOTES`` names."""
    out: list[int] = []
    for note, duration in zip(args[::2], args[1::2]):
        hz = NOTES[note] if isinstance(note, str) else int(note)
        out.extend([hz] * int(duration))
    return out


def prescaler_wave(
    freqin: float, freqout: float, enable: np.ndarray
) -> np.ndarray:
    """Cycle-accurate prescaler output for a per-tick ``enable`` vector.

    ``Prescaler.py:26-42``: a counter increments each tick; the output
    is combinationally high at ``ticks_per_period - 1``; the counter
    resets on that tick or whenever ``enable`` is low (so disabling
    holds the output low and restarts the period).
    """
    tpp = math.ceil(freqin / freqout)
    enable = np.asarray(enable, bool)
    out = np.zeros(len(enable), np.uint8)
    cnt = 0
    for t in range(len(enable)):
        out[t] = 1 if cnt == tpp - 1 else 0
        cnt = 0 if (cnt == tpp - 1 or not enable[t]) else cnt + 1
    return out


def _nco_sizing(tick_freq: float, granularity: float, exact: bool):
    """(acc_bits, unit) per ``ops.nco.nco_wave`` (``NCO.py:12-15``)."""
    gain_bits = math.ceil(math.log2(tick_freq))
    acc_size = math.ceil(math.log2(tick_freq / granularity))
    acc_bits = acc_size + gain_bits
    if exact:
        unit = int((1 << acc_bits) / tick_freq)
    else:
        unit = int(
            2 ** math.ceil(math.log2(tick_freq * tick_freq / granularity))
            / tick_freq
        )
    return acc_bits, unit


def _varying_nco(fcw: np.ndarray, acc_bits: int, resol: int) -> np.ndarray:
    """LUT outputs of an NCO whose control word varies per tick.

    ``acc[t] = sum(fcw[:t]) mod 2**acc_bits`` — the uint64 wraparound
    cumsum is exact modulo any power of two <= 2**64."""
    acc = np.zeros(len(fcw), np.uint64)
    acc[1:] = np.cumsum(fcw[:-1].astype(np.uint64))
    acc &= np.uint64((1 << acc_bits) - 1)
    lut = make_cosine_lut(resol)
    return lut[(acc >> np.uint64(acc_bits - resol)).astype(np.int64)]


def partition_to_samples(
    partition, n_samples: int, sample_rate: int, beat_s: float = 0.25
) -> np.ndarray:
    """Per-sample note frequency from a per-beat partition (the tempo
    prescaler + memory of ``myradio.py:147-236``; the song loops)."""
    notes = np.asarray(
        [NOTES[p] if isinstance(p, str) else int(p) for p in partition]
    )
    beat = np.arange(n_samples) // max(1, int(round(beat_s * sample_rate)))
    return notes[beat % len(notes)]


def myradio_waveform(
    note_hz,
    n_ticks: int,
    f_clk: float,
    *,
    sample_rate: int = 48_000,
    resol: int = 8,
    carrier: int = 70_000_000,
    excursion: int = 10,
    exact: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """The complete radio chain (``myradio.py:124-145``), cycle-level.

    - a sampler prescaler pulses at ``sample_rate``; the baseband NCO
      (``resol`` bits, tick_freq = sample_rate) steps once per pulse
      with control input ``note_hz`` (scalar Hz, or one Hz value per
      audio sample),
    - the radio NCO (1-bit) ticks every clock with control input
      ``carrier + base_out * excursion`` — binary FM around the
      carrier with deviation ``excursion * (2**resol - 1)`` Hz,

    Returns ``(radio_bits, base_out)``: the 1-bit antenna stream
    (length ``n_ticks``) and the per-audio-sample baseband LUT values.
    """
    tpp = math.ceil(f_clk / sample_rate)
    n_samples = n_ticks // tpp + 1
    note = np.broadcast_to(
        np.asarray(note_hz, np.int64), (n_samples,)
    ) if np.ndim(note_hz) == 0 else np.asarray(note_hz, np.int64)[:n_samples]
    if len(note) < n_samples:
        note = np.pad(note, (0, n_samples - len(note)), mode="edge")

    bb_bits, bb_unit = _nco_sizing(sample_rate, 1.0, exact)
    base_out = _varying_nco(note * bb_unit, bb_bits, resol)

    # sampler pulses at tick tpp-1, 2*tpp-1, ...: the baseband register
    # has advanced floor(t / tpp) times by clock t
    steps = np.arange(n_ticks, dtype=np.int64) // tpp
    r_bits, r_unit = _nco_sizing(f_clk, 1.0, exact)
    freq_in = carrier + base_out[steps].astype(np.int64) * excursion
    radio = _varying_nco(freq_in * r_unit, r_bits, 1)
    return radio.astype(np.uint8), base_out
