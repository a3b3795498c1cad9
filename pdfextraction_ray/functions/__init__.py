"""Scalar/vectorized functions: text analysis, dedup sketches, similarity."""
