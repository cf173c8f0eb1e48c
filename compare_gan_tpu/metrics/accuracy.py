"""Discriminator accuracy metric (rebuild of compare_gan/metrics/
accuracy.py:36-145, a legacy `run_in_session`-API task).

Computes D's accuracy (and loss) on train images, test images and fresh
fake samples — all forwards jitted and batched.
"""

from __future__ import annotations

import jax
import numpy as np

from compare_gan_tpu import core
from compare_gan_tpu.metrics import eval_task
from compare_gan_tpu.ops import rng as random


class AccuracyTask(eval_task.EvalTask):
    """Evaluation Task for computing and reporting accuracy
    (accuracy.py:36-48)."""

    def metric_list(self):
        return frozenset(["train_accuracy", "test_accuracy", "fake_accuracy",
                          "train_d_loss", "test_d_loss"])

    def run_after_session(self, fake_dset, real_dset=None):
        raise NotImplementedError(
            "AccuracyTask needs discriminator access; call "
            "run_with_gan(gan, train_state, test_images) (the reference "
            "uses the legacy run_in_session API, accuracy.py:45-48).")

    def run_with_gan(self, gan, ts, test_images, max_train_examples=50000,
                     num_repeat=5, batch_size=64, seed=0):
        """D accuracy/loss on train/test/fake (accuracy.py:51-145).
        Images are [N,H,W,C] in [0,255]; predictions ≥ 0.5 on real and
        < 0.5 on fake count as correct."""
        train_images = gan.dataset.load_eval_images(
            min(max_train_examples, 10 * len(test_images)), split="train",
            failure_on_insufficient_examples=False)
        if train_images.shape[0] < test_images.shape[0]:
            raise ValueError(
                f"num_train {train_images.shape[0]} must be larger than "
                f"num_test {test_images.shape[0]}.")

        # Params/state enter as jit ARGUMENTS — a closure over ts would
        # bake the discriminator weights into the HLO (the axon >50 MB
        # program limit; same fix as metrics/gilbo.py).
        @jax.jit
        def _d(params, state, images):
            def fwd():
                return gan.discriminator(images, y=None,
                                         is_training=False)[0]
            out, _ = core.apply(fwd, params, state)
            return out

        def d_fn(images):
            return np.asarray(_d(ts.params, ts.state,
                                 np.asarray(images, np.float32)))

        sampler_key = jax.random.PRNGKey(seed)

        def bce(pred, label):
            p = np.clip(np.asarray(pred, np.float64), 1e-7, 1 - 1e-7)
            return -(label * np.log(p) + (1 - label) * np.log(1 - p))

        rng = np.random.default_rng(seed)
        num_batches = len(test_images) // batch_size
        ret = {k: [] for k in self.metric_list()}
        for rep in range(num_repeat):
            idx = rng.choice(len(train_images), len(test_images))
            train_subset = train_images[idx]
            accs = {"train": [], "test": [], "fake": []}
            losses = {"train": [], "test": []}
            for i in range(num_batches):
                sl = slice(i * batch_size, (i + 1) * batch_size)
                test_p = np.asarray(d_fn(test_images[sl] / 255.0))
                train_p = np.asarray(d_fn(train_subset[sl] / 255.0))
                # Fresh z per (repeat, batch) — keying on i alone would
                # make every repeat score identical fake samples. Drawn
                # through the gan's configured prior (reference
                # accuracy.py:105 uses gan.z_generator), not a hardcoded
                # uniform: a normal-z recipe's fakes would otherwise be
                # off-distribution and D's fake accuracy inflated.
                with random.rng_context(
                        jax.random.fold_in(
                            jax.random.fold_in(sampler_key, rep), i)):
                    z = np.asarray(gan.z_generator(
                        [batch_size, gan.z_dim], name="accuracy_z"))
                fakes, _ = gan.sample(ts, z)
                fake_p = np.asarray(d_fn(np.asarray(fakes)))
                accs["test"].append((test_p >= 0.5).mean())
                accs["train"].append((train_p >= 0.5).mean())
                accs["fake"].append((fake_p < 0.5).mean())
                losses["test"].append(bce(test_p, 1.0).mean())
                losses["train"].append(bce(train_p, 1.0).mean())
            ret["train_accuracy"].append(np.mean(accs["train"]))
            ret["test_accuracy"].append(np.mean(accs["test"]))
            ret["fake_accuracy"].append(np.mean(accs["fake"]))
            ret["train_d_loss"].append(np.mean(losses["train"]))
            ret["test_d_loss"].append(np.mean(losses["test"]))
        return {k: float(np.mean(v)) for k, v in ret.items()}
