"""Scalar/vectorized functions: change-record decode, text normalization, text analytics, vector math."""
