"""Deterministic embedders for testing and oracle-checked queries.

``ord_sum_embedder`` mirrors the reference's mock embedder
(/root/reference/tests/test_feature_transformers.py:102-108):
``[len(text), sum(ord(c)) % 100]`` — integer-valued float32, exactly
reproducible in SQL (length + char-code sum), so the embedding plumbing
(batching, null zero-fill, template rendering, column expansion) can be
differentially verified end-to-end without a hosted model.
"""

from __future__ import annotations

import numpy as np


def ord_sum_embedder(texts: list[str]) -> np.ndarray:
    return np.array(
        [[len(t), sum(ord(c) for c in t) % 100] for t in texts], dtype=np.float32
    )
