"""Shared test fixtures (the reference's test_utils.py equivalents)."""

import numpy as np


def fake_inception(images):
    """Deterministic stand-in feature extractor: random-projection pool
    features and logits with the real tensor contract (the reference
    mocks the Inception graph the same way, test_utils.py:37-55)."""
    flat = images.reshape(len(images), -1).astype(np.float64) / 255.0
    rng = np.random.RandomState(0)
    pool = flat @ rng.randn(flat.shape[1], 16)
    logits = flat @ rng.randn(flat.shape[1], 10)
    return pool, logits
