"""Relational + custom operators: posting-list build, scoring, BM25/WAND
top-k, posting codec, segment write/merge, dedup, similarity search."""
