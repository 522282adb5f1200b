"""Operator library: reference-parity car analytics + TPC-H-style
relational queries + large-scale pipeline extensions (dedup, similarity,
text, time windows)."""
