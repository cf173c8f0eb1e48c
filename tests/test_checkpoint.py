"""Checkpoint round-trip, retention, and async saver tests
(reference conventions: main.py:83-84, hooks.py:28-46)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu import checkpoint as ckpt_lib


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    return {"params": {"a/kernel": jnp.asarray(rng.randn(3, 4), jnp.float32),
                       "b/bias": jnp.asarray(rng.randn(4), jnp.float32)},
            "step": jnp.asarray(seed, jnp.int32)}


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path)
    tree = _tree(5)
    ckpt_lib.save_checkpoint(d, tree, step=10)
    restored = ckpt_lib.restore_checkpoint(
        ckpt_lib.checkpoint_path(d, 10), _tree(0))
    np.testing.assert_array_equal(restored["params"]["a/kernel"],
                                  tree["params"]["a/kernel"])
    assert int(restored["step"]) == 5


def test_pointer_and_latest(tmp_path):
    d = str(tmp_path)
    for s in [5, 10, 15]:
        ckpt_lib.save_checkpoint(d, _tree(s), step=s)
    assert ckpt_lib.latest_checkpoint(d).endswith("model.ckpt-15.npz")
    assert [ckpt_lib.step_of(p) for p in ckpt_lib.all_checkpoints(d)] == \
        [5, 10, 15]


def test_keep_checkpoint_max_gc(tmp_path):
    d = str(tmp_path)
    for s in range(6):
        ckpt_lib.save_checkpoint(d, _tree(s), step=s,
                                 keep_checkpoint_max=3)
    steps = [ckpt_lib.step_of(p) for p in ckpt_lib.all_checkpoints(d)]
    assert steps == [3, 4, 5]
    assert not os.path.exists(ckpt_lib.checkpoint_path(d, 0))


def test_restore_missing_leaf_raises(tmp_path):
    d = str(tmp_path)
    ckpt_lib.save_checkpoint(d, {"x": jnp.zeros(3)}, step=1)
    try:
        ckpt_lib.restore_checkpoint(ckpt_lib.checkpoint_path(d, 1),
                                    {"x": jnp.zeros(3), "y": jnp.zeros(2)})
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_async_saver(tmp_path):
    d = str(tmp_path)
    saver = ckpt_lib.AsyncCheckpointSaver(d, save_checkpoint_steps=5)
    assert not saver.should_save(3)
    assert saver.should_save(5)
    saver.save(_tree(1), 5)
    saver.join()
    assert ckpt_lib.latest_checkpoint(d).endswith("model.ckpt-5.npz")


def test_bfloat16_leaves_roundtrip(tmp_path):
    """bf16 leaves (e.g. AdamOptimizer.moment_dtype='bfloat16' moments)
    serialize through npz as raw void bytes — restore must reinterpret,
    not value-cast (np.asarray(void, bfloat16) raises)."""
    import jax.numpy as jnp
    tree = {"m": jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16),
            "p": jnp.asarray([1.0, 2.0], jnp.float32)}
    ckpt_lib.save_checkpoint(str(tmp_path), tree, 5)
    out = ckpt_lib.restore_checkpoint(ckpt_lib.checkpoint_path(str(tmp_path), 5),
                                  tree)
    assert np.asarray(out["m"]).dtype == np.asarray(tree["m"]).dtype
    np.testing.assert_array_equal(np.asarray(out["m"], np.float32),
                                  np.asarray(tree["m"], np.float32))


def test_saver_cadence_at_chunk_boundaries(tmp_path):
    """should_save must fire at the first chunk boundary past each
    multiple of the cadence, not only on exact multiples (the trainer
    asks only at iterations_per_loop boundaries)."""
    saver = ckpt_lib.AsyncCheckpointSaver(str(tmp_path),
                                      save_checkpoint_steps=250)
    fired = [s for s in range(100, 1101, 100)
             if saver.should_save(s) and (saver.align(s) or True)]
    assert fired == [300, 500, 800, 1000]
