"""Embedding-cosine near-duplicate pairs (re-export; implementation in
similarity/ann.py — exact pair scan + LSH-bucketed scale path)."""

from centimators_spark.similarity.ann import embedding_cosine_pairs

__all__ = ["embedding_cosine_pairs"]
