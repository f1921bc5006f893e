"""amaranth_twstft_tpu — TPU-native TWSTFT post-processing framework.

A from-scratch JAX / XLA / Pallas re-architecture of the capabilities of
``oscimp/amaranth_twstft`` (Two-Way Satellite Time and Frequency Transfer):

- PRN (m-sequence LFSR) code replica generation, bit-exact with the
  reference gateware's pure-Python oracle (``amaranth_twstft/common.py``),
- batched FFT cross-correlation of recorded SDR IQ streams against the
  replica with 3x zero-pad spectral interpolation and parabolic sub-sample
  peak refinement (``processing/Octave/godual_ranging.m``,
  ``processing/CPP/main.cpp``),
- squaring-FFT Doppler estimation and dense cross-ambiguity (CAF) search,
- per-code aligned tracking with slip re-acquisition
  (``acquisition/claudio_aligned_code_ranging_separate.m``),
- a DLL/PLL multi-channel tracking receiver built on MXU lag-bank matmuls
  (``experiments/231001_DLL_PLL/rxcomplex.cpp``),
- the two-way clock-offset solver with all production gating/ambiguity
  policies (``acquisition/go_1s.m``, ``processing/Octave/tw.m``),
- multi-chip sharding over a ``jax.sharding.Mesh`` (time-blocks x
  Doppler/channel) with overlap-save halos and collective peak reduction.

Nothing in this package is a translation of the reference's code; the
reference defines the *behavior* (cited as ``file:line`` in docstrings),
the implementation is TPU-first.
"""

__version__ = "0.1.0"

from amaranth_twstft_tpu.config import (  # noqa: F401
    SignalConfig,
    ProcessingConfig,
    StationConfig,
    MeshConfig,
)
