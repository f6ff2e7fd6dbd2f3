"""Relational + training-data operators: LWW merge, dedup, similarity, joins, OHLC."""
