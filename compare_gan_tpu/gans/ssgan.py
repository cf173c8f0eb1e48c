"""Self-Supervised GAN (rebuild of compare_gan/gans/ssgan.py; Chen et al.,
arXiv:1811.11212).

Adds a 4-way rotation classification head on D's penultimate features
(ssgan.py:80-102) and rotation CE losses: weight 1.0 into D (real images)
and 0.2 into G (fake images) (ssgan.py:49-51,196-216). The rotation batch
is global here — the reference divides `rotated_batch_size` by the replica
count per-core (ssgan.py:137-143); in global-batch math the division is
unnecessary and the semantics are mesh-size-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu import utils
from compare_gan_tpu.gans import loss_lib
from compare_gan_tpu.gans import modular_gan
from compare_gan_tpu.ops import arch_ops as ops

NUM_ROTATIONS = 4


@gin.configurable("SSGAN", denylist=["dataset", "parameters", "model_dir"])
class SSGAN(modular_gan.ModularGAN):
    """Self-Supervised GAN (ssgan.py:40-226)."""

    def __init__(self, self_supervision="rotation_gan",
                 rotated_batch_size=None, weight_rotation_loss_d=1.0,
                 weight_rotation_loss_g=0.2, **kwargs):
        super().__init__(**kwargs)
        if rotated_batch_size is None:
            raise gin.ConfigError("SSGAN.rotated_batch_size is required.")
        self._self_supervision = self_supervision
        self._rotated_batch_size = rotated_batch_size
        self._weight_rotation_loss_d = weight_rotation_loss_d
        self._weight_rotation_loss_g = weight_rotation_loss_g
        # Split D calls not supported (ssgan.py:75-78).
        assert not self._deprecated_split_disc_calls, (
            "Splitting discriminator calls is not supported in SSGAN.")

    def discriminator_with_rotation_head(self, x, y, is_training):
        """D + linear rotation head on penultimate features
        (ssgan.py:80-102)."""
        real_probs, real_scores, final = self.discriminator(
            x=x, y=y, is_training=is_training)
        use_sn = self.discriminator._spectral_norm
        with core.scope("discriminator_rotation"):
            rotation_scores = ops.linear(
                final.reshape(x.shape[0], -1), NUM_ROTATIONS,
                scope="score_classify", use_sn=use_sn)
        return real_probs, real_scores, rotation_scores

    def create_loss(self, features, labels, is_training=True):
        """GAN loss + rotation self-supervision (ssgan.py:105-226)."""
        images = features["images"]
        generated = features["generated"]
        if self.conditional:
            y = self._get_one_hot_labels(labels)
            sampled_y = self._get_one_hot_labels(features["sampled_labels"])
        else:
            y = sampled_y = all_y = None

        bs = images.shape[0]
        rotated_bs = self._rotated_batch_size
        assert rotated_bs % NUM_ROTATIONS == 0, rotated_bs
        num_rot = rotated_bs // NUM_ROTATIONS

        if "rotation" in self._self_supervision:
            assert num_rot <= bs, (num_rot, bs)
            images_rotated = utils.rotate_images(
                images[-num_rot:], rot90_scalars=(1, 2, 3))
            generated_rotated = utils.rotate_images(
                generated[-num_rot:], rot90_scalars=(1, 2, 3))
            rotate_labels = jnp.asarray(
                np.repeat(np.arange(NUM_ROTATIONS, dtype=np.int32),
                          num_rot))
            rotate_labels_onehot = jax.nn.one_hot(rotate_labels,
                                                  NUM_ROTATIONS)
            all_images = jnp.concatenate(
                [images, images_rotated, generated, generated_rotated], 0)
            if self.conditional:
                y_rotated = jnp.tile(y[-num_rot:], (3, 1))
                sampled_y_rotated = jnp.tile(y[-num_rot:], (3, 1))
                all_y = jnp.concatenate(
                    [y, y_rotated, sampled_y, sampled_y_rotated], 0)
        else:
            all_images = jnp.concatenate([images, generated], 0)
            if self.conditional:
                all_y = jnp.concatenate([y, sampled_y], 0)

        d_all, d_all_logits, c_all_logits = (
            self.discriminator_with_rotation_head(
                all_images, y=all_y, is_training=is_training))
        d_real, d_fake = jnp.split(d_all, 2)
        d_real_logits, d_fake_logits = jnp.split(d_all_logits, 2)
        c_real_logits, c_fake_logits = jnp.split(c_all_logits, 2)

        # True/fake scores come from the un-rotated slice.
        d_loss, _, _, g_loss = loss_lib.get_losses(
            d_real=d_real[:bs], d_fake=d_fake[:bs],
            d_real_logits=d_real_logits[:bs],
            d_fake_logits=d_fake_logits[:bs])

        penalty_loss = self._penalty_loss(images, generated, y, is_training)
        d_loss = d_loss + self._lambda * penalty_loss

        if "rotation" in self._self_supervision:
            c_real_logits = c_real_logits[-rotated_bs:]
            c_fake_logits = c_fake_logits[-rotated_bs:]
            preds_onreal = jnp.argmax(c_real_logits, -1).astype(
                rotate_labels.dtype)
            accuracy = jnp.mean(
                (rotate_labels == preds_onreal).astype(jnp.float32))
            c_real_probs = jax.nn.softmax(
                c_real_logits.astype(jnp.float32))
            c_fake_probs = jax.nn.softmax(
                c_fake_logits.astype(jnp.float32))
            c_real_loss = -jnp.mean(jnp.sum(
                rotate_labels_onehot * jnp.log(c_real_probs + 1e-10), 1))
            c_fake_loss = -jnp.mean(jnp.sum(
                rotate_labels_onehot * jnp.log(c_fake_probs + 1e-10), 1))
            if self._self_supervision == "rotation_only":
                d_loss = d_loss * 0.0
                g_loss = g_loss * 0.0
            d_loss = d_loss + c_real_loss * self._weight_rotation_loss_d
            g_loss = g_loss + c_fake_loss * self._weight_rotation_loss_g
        else:
            c_real_loss = jnp.float32(0.0)
            c_fake_loss = jnp.float32(0.0)
            accuracy = jnp.float32(0.0)

        return {"d_loss": d_loss, "g_loss": g_loss,
                "penalty_loss": penalty_loss,
                "c_real_loss": c_real_loss, "c_fake_loss": c_fake_loss,
                "rotation_accuracy": accuracy}
