"""Compute ops: stage kernels, scans, factorizations, projections."""
