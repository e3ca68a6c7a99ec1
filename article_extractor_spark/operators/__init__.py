"""Spark operators: the vectorized extraction stage plus the corpus-level
operations a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing)."""
