"""Pure, process-local kernels: no Ray, no I/O, fully deterministic."""
