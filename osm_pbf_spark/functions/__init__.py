"""Vectorized numpy kernels + Spark column helpers (no external geo libs)."""
