"""ModularGAN: the workhorse GAN trainer, TPU-native.

Rebuild of compare_gan/gans/modular_gan.py (670 LoC, TF1 graph mode). The
reference's design decisions and their JAX translations:

* Graph unrolling (modular_gan.py:78-90,534-584): one TPUEstimator step
  contains `disc_iters` D sub-steps + 1 G sub-step, each on a fresh slice
  of a batch of size `batch_size * (disc_iters+1)`. Here the same structure
  is a statically-unrolled Python loop inside ONE jitted `train_step`; the
  reference's `iterations_per_loop` device loop becomes `lax.scan` over
  pre-staged batches in `make_train_loop`.
* GPU tf.cond fallback (modular_gan.py:568-571) is dropped: the unrolled
  semantics run everywhere (SURVEY.md §7 "pick the unrolled semantics").
* CrossShardOptimizer (modular_gan.py:606-616) is not needed: loss means
  are taken over the global batch, so under pjit with the batch sharded on
  the `data` mesh axis XLA inserts the gradient all-reduces itself.
* Sub-step state semantics: each sub-step's forwards (G-for-fakes and the
  main D forward) commit their BN moving-average and spectral-norm u
  updates, sequenced through the step exactly like the reference's
  UPDATE_OPS-per-sub-step (modular_gan.py:478-479,492-493). Penalty
  forwards never commit (core.no_state_updates; reference lets them race).
* EMA of G weights with delayed start (modular_gan.py:498-510): decay is
  `ema_decay * (step >= ema_start_step)`, so before the start step the EMA
  tracks the raw weights.
* Dual step counters (modular_gan.py:550-566): `step` counts G steps,
  `disc_step` counts D sub-steps.
* TF-Hub export (modular_gan.py:225-306) becomes `sample()` /
  `discriminate()` pure inference fns; the runner snapshots params per
  checkpoint instead of exporting graphs.
* z sampling moves from the input pipeline (modular_gan.py:365-408) onto
  the device: z and sampled labels are drawn per sub-step from the
  deterministic fold_in(seed, step, sub_step) stream (ops/rng.py), saving
  infeed bandwidth while keeping the same determinism contract.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu import utils
from compare_gan_tpu.gans import loss_lib, penalty_lib
from compare_gan_tpu.gans import optimizers
from compare_gan_tpu.gans.abstract_gan import AbstractGAN
from compare_gan_tpu.ops import rng as random

Array = jax.Array

# The tf.random.* / random_* gin aliases used by the reference's configs
# are registered in ops/rng.py so snapshot consumers (export loaders,
# demo, eval shims) resolve them without importing the trainer stack.


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["params", "state", "ema_params", "g_opt", "d_opt", "step",
                 "disc_step", "rng"],
    meta_fields=[])
@dataclasses.dataclass
class TrainState:
    """Everything that persists across train steps (and into checkpoints)."""
    params: Dict[str, Array]        # G + D trainable variables (flat names)
    state: Dict[str, Array]         # BN stats, SN u vectors, accumulators
    ema_params: Dict[str, Array]    # EMA shadows of G params ({} if unused)
    g_opt: Any                      # optax state for G
    d_opt: Any                      # optax state for D
    step: Array                     # int32: G steps (tf global_step)
    disc_step: Array                # int32: D sub-steps (global_step_disc)
    rng: Array                      # base PRNG key (uint32[2])


@gin.configurable("ModularGAN",
                  denylist=["dataset", "parameters", "model_dir"])
class ModularGAN(AbstractGAN):
    """GAN with modular losses/penalties/architectures
    (modular_gan.py:56-670)."""

    def __init__(self, dataset, parameters, model_dir,
                 deprecated_split_disc_calls=False,
                 experimental_joint_gen_for_disc=False,
                 experimental_force_graph_unroll=False,
                 g_use_ema=False, ema_decay=0.9999, ema_start_step=40000,
                 g_optimizer_fn=optimizers.adam_optimizer,
                 d_optimizer_fn=None,
                 g_lr=0.0002, d_lr=None,
                 conditional=False, fit_label_distribution=False,
                 compute_dtype=None,
                 experimental_fake_only_g_loss=False):
        super().__init__(dataset=dataset, parameters=parameters,
                         model_dir=model_dir)
        self._deprecated_split_disc_calls = deprecated_split_disc_calls
        self._experimental_joint_gen_for_disc = experimental_joint_gen_for_disc
        # TPU-native extension: in the G sub-step, run D on the fakes only
        # instead of the reference's concat(real, fake) batch. For every
        # loss in loss_lib the generator loss depends solely on D(fake)
        # (loss_lib.py:54-149), and no gradient flows into D during the G
        # step, so for discriminators WITHOUT batch-coupled ops (no batch
        # norm — e.g. the BigGAN/SNDCGAN recipes) the g_loss, all gradients
        # and all state updates are mathematically identical while the
        # G-step D forward+backward runs at half the batch. The reference's
        # TF graph computes the concat because d_loss summaries live in the
        # same subgraph (reference modular_gan.py:586-588 consumes only
        # loss/g from the G step, but TF cannot dead-code-eliminate half of
        # a concatenated convolution). Exactness is asserted by
        # tests/test_trainer.py::test_fake_only_g_loss_matches_concat.
        self._experimental_fake_only_g_loss = experimental_fake_only_g_loss
        if experimental_fake_only_g_loss:
            import inspect
            if "g_step" not in inspect.signature(
                    self.create_loss).parameters:
                # SSGAN/S3GAN override create_loss without the fast path;
                # the kwarg-filtered dispatch would silently drop g_step
                # and run the full concat graph while claiming the
                # optimization is on.
                raise ValueError(
                    f"{type(self).__name__}.create_loss does not support "
                    "experimental_fake_only_g_loss (no g_step parameter).")
        # Unrolled semantics are the only semantics in this rebuild.
        del experimental_force_graph_unroll
        self._g_use_ema = g_use_ema
        self._ema_decay = ema_decay
        self._ema_start_step = ema_start_step
        self._g_optimizer_fn = g_optimizer_fn
        self._d_optimizer_fn = d_optimizer_fn or g_optimizer_fn
        self._g_lr = g_lr
        self._d_lr = g_lr if d_lr is None else d_lr

        if conditional and not dataset.num_classes:
            raise ValueError(
                f"Option 'conditional' selected but dataset {dataset.name} "
                f"does not have labels.")
        self._conditional = conditional
        self._fit_label_distribution = fit_label_distribution
        # TPU-native extension (no reference counterpart): run G/D forwards
        # in bfloat16 on the MXU. Parameters, optimizer state, BN statistics
        # and losses stay float32 (the op library computes normalizations
        # and loss reductions in f32 regardless of activation dtype).
        self._compute_dtype = (jnp.dtype(compute_dtype)
                               if compute_dtype else None)

        self._architecture = self._parameters["architecture"]
        self._z_dim = self._parameters["z_dim"]
        self._lambda = self._parameters["lambda"]
        self._disc_iters = self._parameters.get("disc_iters", 1)

        self._generator = None
        self._discriminator = None

    # -- properties --------------------------------------------------------

    @property
    def conditional(self):
        return self._conditional

    @property
    def num_sub_steps(self):
        return self._disc_iters + 1

    @property
    def z_dim(self):
        return self._z_dim

    @property
    def generator(self):
        # Imported lazily: architectures modules import gans.consts, so a
        # top-level import here would be circular.
        from compare_gan_tpu.architectures import GENERATORS
        if self._generator is None:
            if self._architecture not in GENERATORS:
                raise NotImplementedError(
                    f"Generator architecture {self._architecture} not "
                    f"implemented.")
            self._generator = GENERATORS[self._architecture](
                image_shape=self._dataset.image_shape)
        return self._generator

    @property
    def discriminator(self):
        from compare_gan_tpu.architectures import DISCRIMINATORS
        if self._discriminator is None:
            if self._architecture not in DISCRIMINATORS:
                raise NotImplementedError(
                    f"Discriminator architecture {self._architecture} not "
                    f"implemented.")
            self._discriminator = DISCRIMINATORS[self._architecture]()
        return self._discriminator

    # -- samplers ----------------------------------------------------------

    @gin.configurable("z", denylist=["shape", "name"])
    def z_generator(self, shape, distribution_fn=random.uniform,
                    minval=-1.0, maxval=1.0, stddev=1.0, name=None):
        """Noise sampler, gin key `z.distribution_fn`
        (modular_gan.py:365-384)."""
        return utils.call_with_accepted_args(
            distribution_fn, shape=shape, minval=minval, maxval=maxval,
            stddev=stddev, name=name)

    def label_generator(self, shape, name=None):
        if not self.conditional:
            raise ValueError("label_generator() called but GAN is not "
                             "conditional.")
        return random.randint(shape, 0, self._dataset.num_classes, name=name)

    def _get_one_hot_labels(self, labels):
        if not self.conditional:
            raise ValueError("_get_one_hot_labels() called but GAN is not "
                             "conditional.")
        if labels.ndim == 2:  # Soft labels pass through (datasets.py:587+).
            return labels.astype(jnp.float32)
        return jax.nn.one_hot(labels, self._dataset.num_classes)

    def _cast_compute(self, x):
        if self._compute_dtype is not None and x is not None and \
                jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(self._compute_dtype)
        return x

    def _draw_sub_step_inputs(self, batch_size, labels):
        """z + sampled labels for one sub-step; caller installs the
        rng_context (reference _preprocess_fn, modular_gan.py:393-408)."""
        features = {"z": self._cast_compute(
            self.z_generator([batch_size, self._z_dim], name="z"))}
        if self.conditional:
            if self._fit_label_distribution:
                features["sampled_labels"] = labels
            else:
                features["sampled_labels"] = self.label_generator(
                    [batch_size], name="sampled_labels")
        return features

    # -- loss --------------------------------------------------------------

    def _penalty_loss(self, images, generated, y, is_training):
        """λ-weighted penalty term (modular_gan.py:664-670). The penalty's
        D forwards never commit state (SURVEY.md §7)."""

        def d_logits_fn(xx):
            with core.no_state_updates():
                return self.discriminator(xx, y=y,
                                          is_training=is_training)[1]

        return penalty_lib.get_penalty_loss(
            x=images, x_fake=generated, y=y, is_training=is_training,
            d_logits_fn=d_logits_fn,
            d_params=self.discriminator.trainable_variables(
                dict(core._ctx().params)))

    def create_loss(self, features, labels, is_training=True, g_step=False):
        """D and G losses + λ·penalty (modular_gan.py:618-670). Runs inside
        a core context; returns a dict of scalars. `g_step` marks the G
        sub-step's invocation (used by experimental_fake_only_g_loss)."""
        images = features["images"]
        generated = features["generated"]
        if self.conditional:
            y = self._get_one_hot_labels(labels)
            sampled_y = self._get_one_hot_labels(features["sampled_labels"])
            all_y = jnp.concatenate([y, sampled_y], axis=0)
        else:
            y = sampled_y = all_y = None

        if g_step and self._experimental_fake_only_g_loss:
            # G-step fast path: D on fakes only (see __init__ docstring).
            # g_loss is identical for every loss_lib loss; d_loss/penalty
            # are not consumed from the G sub-step (reference
            # modular_gan.py:586-588) so they are reported as zeros.
            # Penalties are safely skipped too: their D forwards run under
            # core.no_state_updates() (_penalty_loss) and only feed d_loss.
            # The real precondition is a batch-DECOUPLED discriminator:
            # with batch norm in D, the fake-only batch changes the
            # normalization moments, so we detect the structural
            # "batch_coupled" tag recorded by standardize_batch at trace
            # time and refuse rather than silently diverge. (Tags, not
            # state writes: accumulator-mode BN normalizes by batch
            # moments during training while writing NO state, so write
            # detection alone has a hole — found in round 2's review.)
            # Tags are scope-qualified: G's own BN also tags
            # "batch_coupled", but under the generator scope, and G's
            # forward is identical on both paths — only D-side coupling
            # breaks the fake-only ≡ concat(real, fake) equivalence. A
            # before/after set diff would be defeated by an earlier
            # same-scope tag, so we scan the full set for any coupling
            # tag outside the generator's scope.
            d_fake, d_fake_logits, _ = self.discriminator(
                generated, y=sampled_y, is_training=is_training)
            gen_prefix = self.generator.name + "/"
            if any(t.rsplit("/", 1)[-1] == "batch_coupled"
                   and not t.startswith(gen_prefix) for t in core.tags()):
                raise ValueError(
                    "experimental_fake_only_g_loss requires a discriminator "
                    "without batch-coupled normalization: this D normalizes "
                    "by moments of the current batch (training-mode "
                    "standardize_batch, moving-average or accumulator "
                    "mode), so the fake-only batch this graph substitutes "
                    "for concat(real, fake) changes its output.")
            stop = jax.lax.stop_gradient
            _, _, _, g_loss = loss_lib.get_losses(
                d_real=stop(d_fake), d_fake=d_fake,
                d_real_logits=stop(d_fake_logits),
                d_fake_logits=d_fake_logits)
            zero = jnp.zeros((), jnp.float32)
            return {"d_loss": zero, "g_loss": g_loss, "penalty_loss": zero}

        if self._deprecated_split_disc_calls:
            d_real, d_real_logits, _ = self.discriminator(
                images, y=y, is_training=is_training)
            d_fake, d_fake_logits, _ = self.discriminator(
                generated, y=sampled_y, is_training=is_training)
        else:
            all_images = jnp.concatenate([images, generated], axis=0)
            d_all, d_all_logits, _ = self.discriminator(
                all_images, y=all_y, is_training=is_training)
            d_real, d_fake = jnp.split(d_all, 2)
            d_real_logits, d_fake_logits = jnp.split(d_all_logits, 2)

        d_loss, _, _, g_loss = loss_lib.get_losses(
            d_real=d_real, d_fake=d_fake, d_real_logits=d_real_logits,
            d_fake_logits=d_fake_logits)

        penalty_loss = self._penalty_loss(images, generated, y, is_training)
        d_loss = d_loss + self._lambda * penalty_loss
        return {"d_loss": d_loss, "g_loss": g_loss,
                "penalty_loss": penalty_loss}

    # -- init --------------------------------------------------------------

    def init_state(self, rng, batch_size) -> TrainState:
        """Trace one full forward to create all variables
        (reference: first call of model_fn builds the graph)."""
        init_rng, state_rng = jax.random.split(rng)

        def build():
            with random.rng_context(jax.random.fold_in(state_rng, 0)):
                labels = jnp.zeros((batch_size,), jnp.int32)
                features = self._draw_sub_step_inputs(batch_size, labels)
                sampled_y = (self._get_one_hot_labels(
                    features["sampled_labels"]) if self.conditional else None)
                fake = self.generator(features["z"], y=sampled_y,
                                      is_training=True)
                features["generated"] = fake
                features["images"] = jnp.zeros(
                    (batch_size,) + self._dataset.image_shape, jnp.float32)
                self.create_loss(features, labels, is_training=True)

        _, params, state = core.init(build, init_rng)
        self._check_variables(params)
        g_params = self.generator.trainable_variables(params)
        d_params = self.discriminator.trainable_variables(params)
        g_tx, d_tx = self._make_optimizers()
        return TrainState(
            params=params,
            state=state,
            # Distinct buffers (donation-safe), same values.
            ema_params=(jax.tree_util.tree_map(jnp.copy, g_params)
                        if self._g_use_ema else {}),
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
            disc_step=jnp.zeros((), jnp.int32),
            rng=state_rng)

    def _make_optimizers(self):
        g_tx = self._g_optimizer_fn(self._g_lr)
        d_tx = self._d_optimizer_fn(self._d_lr)
        return g_tx, d_tx

    def _check_variables(self, params):
        """G ∩ D = ∅ and no unused variables (modular_gan.py:345-357)."""
        g = set(self.generator.trainable_variables(params))
        d = set(self.discriminator.trainable_variables(params))
        if g & d:
            raise ValueError(f"Shared trainable variables: {g & d}")
        unused = set(params) - g - d
        if unused:
            raise ValueError(f"Unused trainable variables: {unused}")

    # -- training ----------------------------------------------------------

    def _disc_sub_step(self, params, state, d_opt_state, images, labels,
                       key, d_tx, precomputed_fake=None):
        """One D training sub-step (modular_gan.py:471-485)."""
        d_params = self.discriminator.trainable_variables(params)
        frozen = {k: v for k, v in params.items() if k not in d_params}

        def loss_fn(d_params_):
            all_params = core.merge(frozen, d_params_)

            def fwd():
                with random.rng_context(key):
                    features = self._draw_sub_step_inputs(
                        images.shape[0], labels)
                    if precomputed_fake is None:
                        sampled_y = (self._get_one_hot_labels(
                            features["sampled_labels"])
                            if self.conditional else None)
                        fake = self.generator(features["z"], y=sampled_y,
                                              is_training=True)
                    else:
                        fake = precomputed_fake
                    features["generated"] = jax.lax.stop_gradient(fake)
                    features["images"] = self._cast_compute(images)
                    return self.create_loss(features, labels,
                                            is_training=True)

            losses, new_state = core.apply(fwd, all_params, state)
            return losses["d_loss"], (losses, new_state)

        grads, (losses, new_state) = jax.grad(
            loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        params = core.merge(frozen, d_params)
        return params, new_state, d_opt_state, losses

    def _gen_sub_step(self, params, state, g_opt_state, ema_params, images,
                      labels, key, step, g_tx):
        """The G training sub-step + EMA (modular_gan.py:487-510)."""
        g_params = self.generator.trainable_variables(params)
        frozen = {k: v for k, v in params.items() if k not in g_params}

        def loss_fn(g_params_):
            all_params = core.merge(frozen, g_params_)

            def fwd():
                with random.rng_context(key):
                    features = self._draw_sub_step_inputs(
                        images.shape[0], labels)
                    sampled_y = (self._get_one_hot_labels(
                        features["sampled_labels"])
                        if self.conditional else None)
                    features["generated"] = self.generator(
                        features["z"], y=sampled_y, is_training=True)
                    features["images"] = self._cast_compute(images)
                    return utils.call_with_accepted_args(
                        self.create_loss, features=features, labels=labels,
                        is_training=True, g_step=True)

            losses, new_state = core.apply(fwd, all_params, state)
            return losses["g_loss"], (losses, new_state)

        grads, (losses, new_state) = jax.grad(
            loss_fn, has_aux=True)(g_params)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        if self._g_use_ema:
            decay = self._ema_decay * (
                step >= self._ema_start_step).astype(jnp.float32)
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1.0 - decay),
                ema_params, g_params)
        params = core.merge(frozen, g_params)
        return params, new_state, g_opt_state, ema_params, losses

    def make_train_step(self, batch_size):
        """Build the pure train step: (TrainState, batch) ->
        (TrainState, metrics). `batch` holds images/labels of leading dim
        batch_size * num_sub_steps (modular_gan.py:512-604)."""
        g_tx, d_tx = self._make_optimizers()
        num_sub_steps = self.num_sub_steps

        def train_step(ts: TrainState, batch) -> Tuple[TrainState, Dict]:
            images = batch["images"]
            labels = batch["labels"]
            assert images.shape[0] == batch_size * num_sub_steps, (
                f"Global batch {images.shape[0]} != "
                f"{batch_size}*{num_sub_steps}")
            images_s = jnp.split(images, num_sub_steps)
            labels_s = jnp.split(labels, num_sub_steps)
            sub_keys = [
                random.base_key_from_step(ts.rng, ts.step, sub_step=i)
                for i in range(num_sub_steps)]

            params, state = ts.params, ts.state
            d_opt_state = ts.d_opt
            metrics = {}

            precomputed_fakes = [None] * self._disc_iters
            if self._experimental_joint_gen_for_disc:
                # One big G forward for all D sub-steps
                # (modular_gan.py:444-463). Commits G state once.
                def joint_fwd():
                    fakes = []
                    for i in range(self._disc_iters):
                        with random.rng_context(sub_keys[i]):
                            features = self._draw_sub_step_inputs(
                                batch_size, labels_s[i])
                            sampled_y = (self._get_one_hot_labels(
                                features["sampled_labels"])
                                if self.conditional else None)
                            fakes.append((features["z"], sampled_y))
                    z = jnp.concatenate([f[0] for f in fakes], axis=0)
                    y = (jnp.concatenate([f[1] for f in fakes], axis=0)
                         if self.conditional else None)
                    return self.generator(z, y=y, is_training=True)

                joint, state = core.apply(joint_fwd, params, state)
                precomputed_fakes = jnp.split(joint, self._disc_iters)

            # --- D sub-steps (sequential, like control_dependencies
            # chaining, modular_gan.py:576-579) ---
            for i in range(self._disc_iters):
                params, state, d_opt_state, losses = self._disc_sub_step(
                    params, state, d_opt_state, images_s[i], labels_s[i],
                    sub_keys[i], d_tx,
                    precomputed_fake=precomputed_fakes[i])
                metrics[f"loss/d_{i}"] = losses["d_loss"]
                if i == 0:
                    metrics["loss/penalty"] = losses["penalty_loss"]

            # --- G sub-step ---
            params, state, g_opt_state, ema_params, losses = (
                self._gen_sub_step(
                    params, state, ts.g_opt, ts.ema_params,
                    images_s[-1], labels_s[-1], sub_keys[-1], ts.step, g_tx))
            metrics["loss/g"] = losses["g_loss"]
            # Subclass extras (SSGAN rotation CE/accuracy, S3GAN class
            # loss, ... — reference logs these via TpuSummaries,
            # ssgan.py:222-225, s3gan.py:302-321).
            for k, v in losses.items():
                if k not in ("d_loss", "g_loss", "penalty_loss"):
                    metrics[f"loss/{k}"] = v

            new_ts = TrainState(
                params=params, state=state, ema_params=ema_params,
                g_opt=g_opt_state, d_opt=d_opt_state,
                step=ts.step + 1,
                disc_step=ts.disc_step + self._disc_iters,
                rng=ts.rng)
            return new_ts, metrics

        return train_step

    def make_train_loop(self, batch_size, steps_per_loop):
        """lax.scan over `steps_per_loop` pre-staged batches — the analog
        of iterations_per_loop device looping (main.py:86-88). Metrics are
        the MEAN over the chunk's steps, matching TpuSummaries'
        reduce_fn=mean over its summary window (tpu_summaries.py:66-113) —
        every step's losses contribute to the logged curves, not just the
        chunk's last step."""
        train_step = self.make_train_step(batch_size)

        def loop(ts: TrainState, stacked_batches):
            def body(carry, batch):
                new_ts, metrics = train_step(carry, batch)
                return new_ts, metrics

            ts, metrics_seq = jax.lax.scan(body, ts, stacked_batches,
                                           length=steps_per_loop)
            mean = jax.tree_util.tree_map(
                lambda m: jnp.mean(m, axis=0), metrics_seq)
            return ts, mean

        return loop

    # -- inference (the reference's TF-Hub module surface) -----------------

    def _inference_params(self, ts: TrainState, use_ema=None):
        """EMA-at-export custom_getter semantics (modular_gan.py:266-284):
        G weights swapped for their EMA shadows; u_var/accu_* stay."""
        use_ema = self._g_use_ema if use_ema is None else use_ema
        params = dict(ts.params)
        if use_ema:
            if not ts.ema_params:
                # An explicit EMA request on a non-EMA checkpoint must not
                # silently evaluate raw weights as "EMA results".
                raise ValueError(
                    "use_ema=True but this TrainState has no EMA shadows "
                    "(trained with g_use_ema=False).")
            params.update(ts.ema_params)
        return params

    def sample(self, ts: TrainState, z, labels=None, use_ema=None,
               is_training=False):
        """Generate images from z (the hub "gen" tag,
        modular_gan.py:225-287). Pure; jit/pjit at will."""
        params = self._inference_params(ts, use_ema)

        def fwd():
            y = (self._get_one_hot_labels(labels)
                 if self.conditional else None)
            return self.generator(z, y=y, is_training=is_training)

        images, new_state = core.apply(fwd, params, ts.state)
        return images, new_state

    def discriminate(self, ts: TrainState, images, labels=None):
        """The hub "disc" tag: returns (prediction, logits, features)."""
        def fwd():
            y = (self._get_one_hot_labels(labels)
                 if self.conditional else None)
            return self.discriminator(images, y=y, is_training=False)

        out, _ = core.apply(fwd, ts.params, ts.state)
        return out

    # -- input -------------------------------------------------------------

    def input_batches(self, batch_size, host_id=None, skip_batches=0):
        """Host iterator of {images, labels}. batch_size is the GLOBAL
        per-sub-step batch (as_estimator's train_batch_size =
        batch_size*num_sub_steps, modular_gan.py:215-223); each host
        yields its 1/num_processes share, exactly TPUEstimator's per-host
        input_fn contract (params['batch_size'] = global/num_hosts,
        reference abstract_gan.py:41-47). The host shards are assembled
        into the global device batch by mesh_utils.make_batch_sharder via
        make_array_from_process_local_data. Defaults to this process's
        index so multi-host runs get distinct, deterministic shards
        (reference per-host seeding, datasets.py:147-172)."""
        if host_id is None:
            host_id = jax.process_index()
        total = batch_size * self.num_sub_steps
        num_hosts = jax.process_count()
        if total % num_hosts:
            raise ValueError(
                f"Global per-step batch {total} (= {batch_size} x "
                f"{self.num_sub_steps} sub-steps) must divide over "
                f"{num_hosts} hosts.")
        return self._dataset.train_input_fn(
            total // num_hosts, host_id=host_id,
            skip_batches=skip_batches)
