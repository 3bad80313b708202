"""Low-level compute ops: normalizations, style statistics, upsampling and
the Pallas kernels for the hot paths."""
