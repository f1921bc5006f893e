"""Multi-chip sharding: mesh layout, overlap-save halos, peak reduction.

The reference's concurrency (channel pthreads + semaphores, FFTW threads,
process-level octave jobs, `dold` carry buffers, scp file shipping —
SURVEY.md §2.6) maps onto a 2-D ``jax.sharding.Mesh``:

- ``time`` axis: epoch blocks of the capture (the reference's process-
  level parallelism and streaming carry), with overlap-save halo exchange
  via ``lax.ppermute`` replacing the ``dold`` leftover buffer
  (``acquisition/claudio_aligned_code_ranging_separate.m:167,196-200``),
- ``channel`` axis: channels x Doppler hypotheses (the reference's two
  worker pthreads and the DLL/PLL 120-channel loop,
  ``processing/CPP/main.cpp:180-187``, ``rxcomplex.cpp:466-799``), with
  collective argmax peak reduction replacing the per-thread argmax.

Numerics are shard-count invariant: tests compare N-device against
1-device results bit-for-bit (SURVEY.md §4.6).
"""

from amaranth_twstft_tpu.parallel.mesh import make_mesh  # noqa: F401
