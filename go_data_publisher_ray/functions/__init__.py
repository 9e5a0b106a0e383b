"""Vectorized scalar-function kernels shared by stages and oracles."""
