"""Vectorized building blocks: analyzers, posting-list codecs, routing,
and the training-data-pipeline function library (dedup, similarity,
text analysis, multimodal plumbing)."""
