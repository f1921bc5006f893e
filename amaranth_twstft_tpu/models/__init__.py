"""Processing-chain models: each reference chain generation, TPU-native.

- :mod:`emitter` — baseband simulation of the FPGA transmit chain
  (fixture generator; the reference's recorded IQ files are its fixtures).
- :mod:`godual` — archived dual-channel ranging chain (Octave semantics).
- :mod:`goranging` — the C++ ``GoRanging`` chain (fixed per-file df).
- :mod:`claudio` — current per-code aligned tracking chain.
- :mod:`dllpll` — multi-channel DLL/PLL acquisition/tracking receiver.
- :mod:`twoway` — two-way solver and 1-s products.
"""
