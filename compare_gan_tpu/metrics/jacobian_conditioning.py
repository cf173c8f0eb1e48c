"""Generator Jacobian conditioning (rebuild of compare_gan/metrics/
jacobian_conditioning.py; following arXiv:1802.08768).

The reference builds the Jacobian column-by-column with a tf.while_loop of
tf.gradients calls (jacobian_conditioning.py:94-124). In JAX the whole
batched Jacobian is one `jax.vmap(jax.jacrev(...))` — a single compiled
program, MXU-batched.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu.metrics import eval_task


def compute_jacobian(generator_fn: Callable, z: jax.Array) -> np.ndarray:
    """df/dz of shape [batch, out_dim, z_dim] for f(z) flattened images."""

    def flat_gen(z_single):
        out = generator_fn(z_single[None])
        return out.reshape(-1)

    jac = jax.vmap(jax.jacrev(flat_gen))(z)
    return np.asarray(jac)


def _analyze_metric_tensor(metric_tensor: np.ndarray) -> Dict[str, np.ndarray]:
    """Spectral stats of [batch, dim, dim] metric tensors
    (jacobian_conditioning.py:127-147)."""
    eigenvalues, _ = np.linalg.eig(metric_tensor)
    condition_number = np.linalg.cond(metric_tensor)
    log_condition_number = np.log(condition_number)
    _, logdet = np.linalg.slogdet(metric_tensor)
    return {"eigenvalues": eigenvalues, "logdet": logdet,
            "log_condition_number": log_condition_number}


def analyze_jacobian(jacobian_array: np.ndarray) -> Dict:
    """Condition stats of JᵀJ per-sample and of the batch-mean tensor
    (jacobian_conditioning.py:150-175)."""
    jacobian_array = np.asarray(jacobian_array)
    jt = np.transpose(jacobian_array, [0, 2, 1])
    metric_tensor = np.matmul(jt, jacobian_array)
    mean_metric_tensor = metric_tensor.mean(0)[None]
    return {"metric_tensor": _analyze_metric_tensor(metric_tensor),
            "mean_metric_tensor": _analyze_metric_tensor(mean_metric_tensor)}


class GeneratorConditionNumberTask(eval_task.EvalTask):
    """Mean/std of log condition numbers of G's metric tensor across a
    minibatch of z samples (jacobian_conditioning.py:30-58).

    Runs directly against the GAN: the runner passes a `generator_fn` and a
    z batch via attributes on the fake dataset is not possible, so this
    task exposes `run_with_generator` for direct use.
    """

    _CONDITION_NUMBER_COUNT = "log_condition_number_count"
    _CONDITION_NUMBER_MEAN = "log_condition_number_mean"
    _CONDITION_NUMBER_STD = "log_condition_number_std"

    def metric_list(self):
        return frozenset([self._CONDITION_NUMBER_COUNT,
                          self._CONDITION_NUMBER_MEAN,
                          self._CONDITION_NUMBER_STD])

    def run_with_gan(self, gan, ts, batch_size=64, seed=42):
        """Sample one minibatch of z from the gan's prior (the reference
        analyzes the graph's live z feed, jacobian_conditioning.py:63-91)
        and analyze G's Jacobian there. Rides eval_gan_lib's generic
        run_with_gan dispatch."""
        from compare_gan_tpu.ops import rng as rng_ops

        with rng_ops.rng_context(jax.random.PRNGKey(seed)):
            z = gan.z_generator([batch_size, gan.z_dim], name="jacobian_z")

        def generator_fn(zb):
            images, _ = gan.sample(ts, zb)
            return images

        return self.run_with_generator(generator_fn, np.asarray(z))

    def run_with_generator(self, generator_fn, z):
        jac = compute_jacobian(generator_fn, z)
        result = analyze_jacobian(jac)["metric_tensor"][
            "log_condition_number"]
        return {self._CONDITION_NUMBER_COUNT: len(result),
                self._CONDITION_NUMBER_MEAN: float(np.mean(result)),
                self._CONDITION_NUMBER_STD: float(np.std(result))}

    def run_after_session(self, fake_dset, real_dset=None):
        raise NotImplementedError(
            "GeneratorConditionNumberTask needs generator access; call "
            "run_with_generator(generator_fn, z) (legacy run_in_session "
            "API in the reference, jacobian_conditioning.py:56-58).")
