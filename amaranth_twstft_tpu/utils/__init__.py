"""Host-side utilities: IO, MAT files, time scales, logging, profiling."""
