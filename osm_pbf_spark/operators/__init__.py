"""Distributed operators: spatial join, kNN, tiling, doc render, dedup, ANN."""
