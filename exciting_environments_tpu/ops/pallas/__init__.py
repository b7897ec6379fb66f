"""Fused Pallas TPU rollout kernels (performance layer)."""
