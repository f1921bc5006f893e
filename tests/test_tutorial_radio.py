"""Tutorial standalone FM radio (Prescaler + myradio) behavioral model
vs the reference gateware semantics
(``Doc/EuGRD_tutorial/slides_nath/src/{Prescaler.py,myradio.py}``)."""

import math

import numpy as np

from amaranth_twstft_tpu.models.tutorial_radio import (
    NOTES,
    TETRIS_PARTITION,
    get_partition,
    myradio_waveform,
    partition_to_samples,
    prescaler_wave,
)


def test_prescaler_period_and_enable_gating():
    """Mirror of the reference's own testbench (Prescaler.py:44-66):
    pulses every ceil(freqin/freqout) ticks; ~enable holds the counter
    in reset and the output low; re-enabling restarts a full period."""
    freqin, freqout = 10e6, 1e6
    tpp = math.ceil(freqin / freqout)  # 10
    en = np.ones(204, bool)
    out = prescaler_wave(freqin, freqout, en)
    pulses = np.flatnonzero(out)
    assert pulses[0] == tpp - 1
    assert np.all(np.diff(pulses) == tpp)
    # gate off mid-run: no pulses while disabled
    en2 = np.concatenate([np.ones(25, bool), np.zeros(100, bool),
                          np.ones(200, bool)])
    out2 = prescaler_wave(freqin, freqout, en2)
    assert out2[25:125].sum() == 0
    resumed = np.flatnonzero(out2[125:])
    # a FULL period elapses after re-enable before the first pulse
    assert resumed[0] == tpp - 1
    assert np.all(np.diff(resumed) == tpp)


def test_get_partition_expansion():
    """(note, duration) pairs expand to one entry per beat
    (myradio.py:33-46); names resolve through the note table."""
    p = get_partition("mi2", 2, "si", 1, 440, 3)
    assert p == [NOTES["mi2"], NOTES["mi2"], NOTES["si"], 440, 440, 440]
    tetris = get_partition(*TETRIS_PARTITION)
    assert len(tetris) == sum(TETRIS_PARTITION[1::2])
    # the reference's own typo: si2 is defined as 2*la, not 2*si
    assert NOTES["si2"] == 2 * NOTES["la"]


def test_partition_to_samples_loops():
    notes = partition_to_samples(["do", "re"], 10, sample_rate=8,
                                 beat_s=0.25)
    # 2 samples per beat at 8 S/s; the 2-beat song loops
    assert notes.tolist() == [262, 262, 294, 294, 262, 262, 294, 294,
                              262, 262]


def test_myradio_fm_carrier_band():
    """Constant-note radio output: a 1-bit stream whose dominant
    spectral line sits inside the FM band carrier..carrier +
    excursion*(2**resol - 1) (myradio.py:124-145)."""
    f_clk, carrier, exc = 2_000_000, 200_000, 10
    radio, base = myradio_waveform(
        NOTES["re2"], 1 << 18, f_clk, sample_rate=5000, resol=8,
        carrier=carrier, excursion=exc, exact=True,
    )
    assert set(np.unique(radio)) <= {0, 1}
    x = radio.astype(np.float64) - radio.mean()
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    f = np.fft.rfftfreq(len(x), 1.0 / f_clk)
    pk = f[np.argmax(spec)]
    dev = exc * 255
    assert carrier - 500 <= pk <= carrier + dev + 500, pk
    # the baseband NCO really oscillates (LUT spans most of its range)
    assert base.max() - base.min() > 200


def test_myradio_unit_exponent_quirk():
    """The reference NCO's unit-exponent quirk (ops/nco.nco_wave):
    at tick rates with frac(log2 F) < 0.5 the radio NCO outputs HALF
    the programmed carrier; exact=True corrects it."""
    # frac(log2 F) = 0.31 (0 < frac < 0.5) -> the unit exponent loses
    # one bit and the gateware outputs half the programmed frequency
    f_clk, carrier = 2_600_000, 200_000

    def peak(exact):
        radio, _ = myradio_waveform(
            NOTES["la"], 1 << 17, f_clk, sample_rate=4096, resol=8,
            carrier=carrier, excursion=0, exact=exact,
        )
        x = radio.astype(np.float64) - radio.mean()
        spec = np.abs(np.fft.rfft(x))
        return np.fft.rfftfreq(len(x), 1.0 / f_clk)[np.argmax(spec)]

    pk_exact = peak(True)
    pk_quirk = peak(False)
    assert abs(pk_exact - carrier) < 200, pk_exact
    assert abs(pk_quirk - carrier / 2) < 200, pk_quirk
