"""Pallas TPU kernels for the hot paths (leapfrog, fused log-joints,
resampling).  Pure-JAX fallbacks live beside each kernel; kernels engage
on TPU backends only."""
