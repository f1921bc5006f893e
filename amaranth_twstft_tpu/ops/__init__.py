"""Pure-functional compute kernels (JAX/XLA/Pallas) of the TWSTFT framework."""
