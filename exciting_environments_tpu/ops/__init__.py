"""Numerical ops: ODE solvers, scan rollout engine, transforms, LUTs, Pallas kernels."""
