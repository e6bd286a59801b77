"""Pure, deterministic kernels used inside map_batches bodies."""
