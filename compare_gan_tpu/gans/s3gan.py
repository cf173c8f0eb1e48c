"""S3GAN: semi-supervised GAN with auxiliary heads (rebuild of
compare_gan/gans/s3gan.py; "High-Fidelity Image Generation With Fewer
Labels", arXiv:1903.02271).

D gains up to three heads on its feature representation (s3gan.py:96-158):
a rotation classifier (shared mechanism with SSGAN), a label predictor that
imputes labels for unlabeled examples (soft or hard), and a projection
head <embed(y), x_rep> using imputed-or-real labels. An example counts as
labeled iff its one-hot/soft label row sums > 0.5 (s3gan.py:120-122).
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


@gin.configurable("S3GAN", denylist=["dataset", "parameters", "model_dir"])
class S3GAN(modular_gan.ModularGAN):
    """S3GAN which enables auxiliary heads for the modular GAN
    (s3gan.py:40-321)."""

    def __init__(self, self_supervision="rotation",
                 rotated_batch_fraction=None, weight_rotation_loss_d=1.0,
                 weight_rotation_loss_g=0.2, project_y=False,
                 use_predictor=False, use_soft_pred=False,
                 weight_class_loss=1.0, use_soft_labels=False, **kwargs):
        super().__init__(**kwargs)
        if rotated_batch_fraction is None:
            raise gin.ConfigError(
                "S3GAN.rotated_batch_fraction is required.")
        if use_predictor and not project_y:
            raise ValueError("Using predictor requires projection.")
        assert self_supervision in {"none", "rotation"}
        self._self_supervision = self_supervision
        self._rotated_batch_fraction = rotated_batch_fraction
        self._weight_rotation_loss_d = weight_rotation_loss_d
        self._weight_rotation_loss_g = weight_rotation_loss_g
        self._project_y = project_y
        self._use_predictor = use_predictor
        self._use_soft_pred = use_soft_pred
        self._weight_class_loss = weight_class_loss
        self._use_soft_labels = use_soft_labels
        assert not self._deprecated_split_disc_calls, (
            "Splitting discriminator calls is not supported in S3GAN.")

    # -- heads -------------------------------------------------------------

    def get_class_embedding(self, y, embedding_dim, use_sn):
        """Projection embedding, glorot-normal init (s3gan.py:160-172)."""
        with core.scope("discriminator_projection"):
            kernel = core.param("kernel", (y.shape[1], embedding_dim),
                                jax.nn.initializers.glorot_normal())
            if use_sn:
                kernel = ops.spectral_norm(kernel)
            return jnp.dot(y, kernel.astype(y.dtype))

    def discriminator_with_additonal_heads(self, x, y, is_training):
        """D + rotation/predictor/projection heads (s3gan.py:96-158).
        Returns (d_probs, d_logits, rotation_logits, aux_logits,
        is_label_available)."""
        d_probs, d_logits, x_rep = self.discriminator(
            x, y=y, is_training=is_training)
        use_sn = self.discriminator._spectral_norm
        assert x_rep.ndim == 2, x_rep.shape

        is_label_available = (jnp.sum(y, axis=1, keepdims=True)
                              > 0.5).astype(jnp.float32) if y is not None \
            else jnp.zeros((x.shape[0], 1), jnp.float32)

        rotation_logits = None
        if "rotation" in self._self_supervision:
            with core.scope("discriminator_rotation"):
                rotation_logits = ops.linear(x_rep, NUM_ROTATIONS,
                                             scope="score_classify",
                                             use_sn=use_sn)

        if not self._project_y:
            return (d_probs, d_logits, rotation_logits, None,
                    is_label_available)

        aux_logits = None
        if self._use_predictor:
            with core.scope("discriminator_predictor"):
                aux_logits = ops.linear(x_rep, y.shape[1], use_bias=True,
                                        scope="predictor_linear",
                                        use_sn=use_sn)
                if self._use_soft_pred:
                    y_predicted = jax.nn.softmax(aux_logits)
                else:
                    y_predicted = jax.nn.one_hot(
                        jnp.argmax(aux_logits, 1), aux_logits.shape[1])
                y = ((1.0 - is_label_available) * y_predicted
                     + is_label_available * y)
                y = jax.lax.stop_gradient(y)

        class_embedding = self.get_class_embedding(
            y=y, embedding_dim=x_rep.shape[-1], use_sn=use_sn)
        d_logits = d_logits + jnp.sum(class_embedding * x_rep, axis=1,
                                      keepdims=True)
        d_probs = jax.nn.sigmoid(d_logits)
        return d_probs, d_logits, rotation_logits, aux_logits, \
            is_label_available

    def merge_with_rotation_data(self, real, fake, real_labels, fake_labels,
                                 num_rot_examples):
        """[real, real-rot, fake, fake-rot] batch (s3gan.py:174-193)."""
        real_rotated = utils.rotate_images(real[-num_rot_examples:],
                                           rot90_scalars=(1, 2, 3))
        fake_rotated = utils.rotate_images(fake[-num_rot_examples:],
                                           rot90_scalars=(1, 2, 3))
        all_features = jnp.concatenate(
            [real, real_rotated, fake, fake_rotated], 0)
        all_labels = None
        if self.conditional:
            real_rot_labels = jnp.tile(
                real_labels[-num_rot_examples:], (3, 1))
            fake_rot_labels = jnp.tile(
                fake_labels[-num_rot_examples:], (3, 1))
            all_labels = jnp.concatenate(
                [real_labels, real_rot_labels, fake_labels,
                 fake_rot_labels], 0)
        return all_features, all_labels

    # -- loss --------------------------------------------------------------

    def create_loss(self, features, labels, is_training=True):
        """GAN + rotation + predictor losses (s3gan.py:195-321)."""
        real_images = features["images"]
        fake_images = features["generated"]
        real_labels = fake_labels = None
        if self.conditional:
            if self._use_soft_labels:
                assert labels.shape[1] == self._dataset.num_classes, (
                    f"Need soft labels of dimension "
                    f"{self._dataset.num_classes} but got dimension "
                    f"{labels.shape[1]}")
                real_labels = labels
            else:
                real_labels = self._get_one_hot_labels(labels)
            fake_labels = self._get_one_hot_labels(
                features["sampled_labels"])

        bs = real_images.shape[0]
        if self._self_supervision != "none":
            assert bs % self._rotated_batch_fraction == 0, (
                f"Rotated batch fraction is invalid: "
                f"{self._rotated_batch_fraction} doesn't divide {bs}")
            rotated_bs = bs // self._rotated_batch_fraction
            num_rot_examples = rotated_bs // NUM_ROTATIONS
            assert num_rot_examples > 0

        if self._self_supervision == "rotation":
            assert num_rot_examples <= bs, (num_rot_examples, bs)
            all_features, all_labels = self.merge_with_rotation_data(
                real_images, fake_images, real_labels, fake_labels,
                num_rot_examples)
        else:
            all_features = jnp.concatenate([real_images, fake_images], 0)
            all_labels = None
            if self.conditional:
                all_labels = jnp.concatenate([real_labels, fake_labels], 0)

        (d_predictions, d_logits, rot_logits, aux_logits,
         is_label_available) = self.discriminator_with_additonal_heads(
            x=all_features, y=all_labels, is_training=is_training)

        expected_batch_size = 2 * bs
        if self._self_supervision == "rotation":
            expected_batch_size += 2 * (NUM_ROTATIONS - 1) * num_rot_examples
        if d_logits.shape[0] != expected_batch_size:
            raise ValueError(
                f"Batch size unexpected: got {d_logits.shape[0]} expected "
                f"{expected_batch_size}")

        prob_real, prob_fake = jnp.split(d_predictions, 2)
        logits_real, logits_fake = jnp.split(d_logits, 2)

        d_loss, _, _, g_loss = loss_lib.get_losses(
            d_real=prob_real[:bs], d_fake=prob_fake[:bs],
            d_real_logits=logits_real[:bs],
            d_fake_logits=logits_fake[:bs])

        # NOTE: unlike SSGAN (reference ssgan.py:191-194), the reference
        # S3GAN.create_loss applies NO gradient penalty (s3gan.py:195-321
        # never calls penalty_lib) — adding one here would change training
        # dynamics vs the reference's recipes.
        metrics = {"penalty_loss": jnp.zeros((), jnp.float32)}

        if self._self_supervision == "rotation":
            rot_real_logits, rot_fake_logits = jnp.split(rot_logits, 2)
            rot_real_logits = rot_real_logits[-rotated_bs:]
            rot_fake_logits = rot_fake_logits[-rotated_bs:]
            labels_rotated = jnp.asarray(np.repeat(
                np.arange(NUM_ROTATIONS, dtype=np.int32),
                num_rot_examples))
            rot_onehot = jax.nn.one_hot(labels_rotated, NUM_ROTATIONS)
            rot_real_logp = jnp.log(jax.nn.softmax(
                rot_real_logits.astype(jnp.float32)) + 1e-10)
            rot_fake_logp = jnp.log(jax.nn.softmax(
                rot_fake_logits.astype(jnp.float32)) + 1e-10)
            real_loss = -jnp.mean(jnp.sum(rot_onehot * rot_real_logp, 1))
            fake_loss = -jnp.mean(jnp.sum(rot_onehot * rot_fake_logp, 1))
            d_loss = d_loss + real_loss * self._weight_rotation_loss_d
            g_loss = g_loss + fake_loss * self._weight_rotation_loss_g
            metrics["rotation_real_loss"] = real_loss
            metrics["rotation_fake_loss"] = fake_loss
            metrics["rotation_accuracy_real"] = jnp.mean(
                (jnp.argmax(rot_real_logits, 1) == labels_rotated
                 ).astype(jnp.float32))

        if self._use_predictor:
            real_aux_logits, _ = jnp.split(aux_logits, 2)
            real_aux_logits = real_aux_logits[:bs]
            avail, _ = jnp.split(is_label_available, 2)
            avail = jnp.squeeze(avail[:bs], -1)
            # Weighted softmax CE on labeled examples only
            # (tf.losses.softmax_cross_entropy weights semantics:
            # sum(w*ce)/sum(w) with 0/1 weights).
            logp = jax.nn.log_softmax(real_aux_logits.astype(jnp.float32))
            ce = -jnp.sum(real_labels * logp, axis=1)
            class_loss_real = jnp.sum(avail * ce) / jnp.maximum(
                jnp.sum(avail), 1e-8)
            d_loss = d_loss + self._weight_class_loss * class_loss_real
            metrics["class_loss_real"] = class_loss_real
            metrics["label_frac"] = jnp.mean(avail)

        return {"d_loss": d_loss, "g_loss": g_loss, **metrics}
