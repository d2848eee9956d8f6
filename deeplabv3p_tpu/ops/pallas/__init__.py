"""Pallas TPU kernels for hot paths XLA fusion doesn't cover."""
