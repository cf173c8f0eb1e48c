"""Deterministic RNG contract (reference tpu/tpu_random_test.py:88-170):
identical across runs, different across steps, sub-steps and op names."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu.ops import rng as random


def _draw(key, name="z", shape=(4,)):
    with random.rng_context(key):
        return np.asarray(random.uniform(shape, name=name))


def test_identical_across_runs():
    key = random.base_key_from_step(jax.random.PRNGKey(1), 5)
    np.testing.assert_array_equal(_draw(key), _draw(key))


def test_different_across_steps():
    k1 = random.base_key_from_step(jax.random.PRNGKey(1), 5)
    k2 = random.base_key_from_step(jax.random.PRNGKey(1), 6)
    assert not np.array_equal(_draw(k1), _draw(k2))


def test_different_across_sub_steps():
    k1 = random.base_key_from_step(jax.random.PRNGKey(1), 5, sub_step=0)
    k2 = random.base_key_from_step(jax.random.PRNGKey(1), 5, sub_step=1)
    assert not np.array_equal(_draw(k1), _draw(k2))


def test_different_across_op_names():
    key = jax.random.PRNGKey(0)
    assert not np.array_equal(_draw(key, "z"), _draw(key, "alpha"))


def test_unnamed_draws_use_counter():
    key = jax.random.PRNGKey(0)
    with random.rng_context(key):
        a = np.asarray(random.uniform((4,)))
        b = np.asarray(random.uniform((4,)))
    assert not np.array_equal(a, b)
    # Fresh context restarts the counter -> same sequence.
    with random.rng_context(key):
        a2 = np.asarray(random.uniform((4,)))
    np.testing.assert_array_equal(a, a2)


def test_requires_context():
    with pytest.raises(RuntimeError):
        random.uniform((2,))


def test_normal_and_randint_shapes():
    with random.rng_context(jax.random.PRNGKey(0)):
        assert random.normal((2, 3), stddev=2.0).shape == (2, 3)
        r = random.randint((8,), 0, 10)
        assert r.dtype == jnp.int32
        assert (np.asarray(r) >= 0).all() and (np.asarray(r) < 10).all()
