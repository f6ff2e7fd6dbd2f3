"""Structured Streaming front-end for the CDC engine."""
