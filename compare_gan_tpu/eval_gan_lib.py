"""Checkpoint evaluation (rebuild of compare_gan/eval_gan_lib.py).

The reference evaluates TF-Hub exports in a fresh session, on CPU/GPU only
(README.md:113-115: "eval on TPU unsupported"). Here a checkpoint is
restored into the GAN's TrainState and sampling runs wherever JAX runs —
including TPU — with the whole sampling loop jitted (`lax.scan` over
batches). Protocol parity:

* Fixed seeds (np 42 / PRNG key 42) so every checkpoint sees identical
  latents (eval_gan_lib.py:112-118).
* `eval_z` gin scope for the evaluation z distribution (:43-63).
* BN accumulator filling: flip `accu/update_accus` to 1, push
  `num_accu_examples`=204,800 samples through G, flip back, snapshot a
  `model-with-accu` checkpoint (:65-92,156-163).
* `num_averaging_runs` fake sets; images of runs > 0 freed (:165-183).
* NaN anywhere ⇒ NanFoundError ⇒ runner writes sentinel 31337.0
  (:40, runner_lib.py:265-273).
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu import checkpoint as ckpt_lib
from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu import eval_utils
from compare_gan_tpu import utils
from compare_gan_tpu.ops import rng as random

NAN_DETECTED = 31337.0
NanFoundError = eval_utils.NanFoundError


@gin.configurable("eval_z", denylist=["shape", "name"])
def z_generator(shape, distribution_fn=random.uniform, minval=-1.0,
                maxval=1.0, stddev=1.0, name=None):
    """Eval-time z distribution, gin scope `eval_z`
    (eval_gan_lib.py:43-63)."""
    return utils.call_with_accepted_args(
        distribution_fn, shape=shape, minval=minval, maxval=maxval,
        stddev=stddev, name=name)


def _jit_cache(gan) -> dict:
    """Per-GAN cache for jitted eval fns and the init_state template.
    continuous_eval evaluates many checkpoints with one `gan`; fresh
    jitted fn objects per checkpoint would retrace (and re-init) every
    time — BigGAN-size traces cost minutes over the tunnel."""
    cache = getattr(gan, "_eval_jit_cache", None)
    if cache is None:
        cache = {}
        gan._eval_jit_cache = cache
    return cache


def _make_sampler(gan, batch_size):
    """Jitted `(params, state, key) -> (images, new_state)`: draws z (and
    labels for conditional GANs) from the key and runs G in eval mode."""

    def sample(params, state, key):
        with random.rng_context(key):
            z = z_generator([batch_size, gan.z_dim], name="z")
            labels = None
            if gan.conditional:
                labels = random.randint([batch_size], 0,
                                        gan.dataset.num_classes,
                                        name="labels")

        def fwd():
            y = gan._get_one_hot_labels(labels) if gan.conditional else None
            return gan.generator(z, y=y, is_training=False)

        return core.apply(fwd, params, state)

    return jax.jit(sample)


def _update_bn_accumulators(gan, ts, batch_size, num_accu_examples):
    """Fill BN accumulators (eval_gan_lib.py:65-92). Returns (state,
    had_accumulators). The whole filling loop runs on device as one scan."""
    switch_keys = [k for k in ts.state if "accu/update_accus" in k]
    if not switch_keys:
        return ts.state, False
    state = dict(ts.state)
    for k in switch_keys:
        state[k] = jnp.ones_like(state[k])
    num_batches = num_accu_examples // batch_size
    base_key = jax.random.PRNGKey(42)

    def _build_fill():
      @jax.jit
      def fill(params_, state_):
        # Weights enter as jit arguments (closure constants would embed
        # hundreds of MB into the HLO program).
        def body(carry_state, i):
            with random.rng_context(jax.random.fold_in(base_key, i)):
                z = z_generator([batch_size, gan.z_dim], name="z")
                labels = (random.randint(
                    [batch_size], 0, gan.dataset.num_classes, name="labels")
                    if gan.conditional else None)

            def fwd():
                y = (gan._get_one_hot_labels(labels)
                     if gan.conditional else None)
                return gan.generator(z, y=y, is_training=False)

            _, new_state = core.apply(fwd, params_, carry_state)
            return new_state, ()

        out_state, _ = jax.lax.scan(body, state_, jnp.arange(num_batches))
        return out_state

      return fill

    cache = _jit_cache(gan)
    key = ("bn_fill", batch_size, num_batches)
    if key not in cache:
        cache[key] = _build_fill()
    state = cache[key](gan._inference_params(ts), state)
    for k in switch_keys:
        state[k] = jnp.zeros_like(state[k])
    return state, True


def evaluate_tfhub_module(export_dir, eval_tasks, dataset=None,
                          batch_size=64, num_averaging_runs=1,
                          num_accu_examples=204800) -> Dict[str, float]:
    """Evaluate a module export directory (the reference's
    evaluate_tfhub_module surface, eval_gan_lib.py:95). The export carries
    EMA-resolved generator params + state (export.py), so this needs no
    gin config or checkpoint."""
    from compare_gan_tpu import datasets as datasets_lib
    from compare_gan_tpu import export as export_lib

    spec, params, state = export_lib._load(export_dir)
    with export_lib._export_config_scope(spec):
        generator = export_lib._build_arch(spec, "gen")

    class _ScopedModule:
        """Forward proxy that traces every G/D call inside the export's
        gin snapshot. The architecture applies its gin knobs lazily at
        forward time (and eval helpers jit lazily per shape), so without
        the scope a configured model would silently rebuild with the
        process's live/default bindings — the exact clobbering _load
        stopped doing (round-2 advisor finding)."""

        def __init__(self, arch):
            self._arch = arch

        def __call__(self, *a, **kw):
            with export_lib._export_config_scope(spec):
                return self._arch(*a, **kw)

        def __getattr__(self, item):
            return getattr(self._arch, item)

    generator = _ScopedModule(generator)
    if dataset is None:
        if "dataset" not in spec:
            raise ValueError("Pass the dataset used for training.")
        dataset = datasets_lib.get_dataset(spec["dataset"])

    class _ExportShim:
        """Just enough GAN surface for the shared eval helpers AND the
        generator/discriminator-access tasks (GILBO, accuracy, Jacobian
        conditioning): exports carry both G and D params (export.py),
        so `sample`, `z_generator` and `discriminator` are real here —
        without them a gan-task through the tfhub path died mid-eval
        with an obscure AttributeError (round-3 review)."""
        z_dim = spec["z_dim"]
        conditional = spec["conditional"]
        model_dir = export_dir

        def __init__(self):
            self.dataset = dataset
            self.generator = generator
            with export_lib._export_config_scope(spec):
                self.discriminator = _ScopedModule(
                    export_lib._build_arch(spec, "disc"))

        def _inference_params(self, ts=None, use_ema=None):
            # MUST pass through the (possibly traced) ts params: gan
            # tasks jit with ts as an argument, and returning the
            # closed-over concrete dict would bake the full weight set
            # into the HLO as constants (the axon >50 MB program limit;
            # round-3 review verified the traced params were dead).
            return params if ts is None else ts.params

        def _get_one_hot_labels(self, labels):
            return jax.nn.one_hot(labels, dataset.num_classes)

        def z_generator(self, shape, name=None):
            # The export's training prior (`z` gin scope), resolved in
            # the snapshot — mirrors ModularGAN.z_generator.
            return export_lib.snapshot_z(spec, shape, name=name)

        def _require_labels(self, labels, what):
            if self.conditional and labels is None:
                raise ValueError(
                    f"Conditional export: {what} needs labels (the "
                    "legacy gan-tasks — GILBO/accuracy/Jacobian — are "
                    "label-free and only support unconditional models, "
                    "as in the reference).")

        def sample(self, ts, z, labels=None, use_ema=None,
                   is_training=False):
            self._require_labels(labels, "sample()")

            def fwd():
                y = (self._get_one_hot_labels(labels)
                     if self.conditional else None)
                return self.generator(z, y=y, is_training=is_training)

            return core.apply(fwd, self._inference_params(ts), ts.state)

        def discriminate(self, ts, images, labels=None):
            self._require_labels(labels, "discriminate()")

            def fwd():
                y = (self._get_one_hot_labels(labels)
                     if self.conditional else None)
                return self.discriminator(images, y=y, is_training=False)

            out, _ = core.apply(fwd, ts.params, ts.state)
            return out

    shim = _ExportShim()
    ts = _ShimState(params=params, state=state)
    # The WHOLE evaluation runs inside the export's gin snapshot, not
    # just generator forwards: z/label sampling (`eval_z` scope) happens
    # at trace time in _make_sampler / _update_bn_accumulators, and
    # without the scope a fresh process would draw z from the DEFAULT
    # distribution (uniform) instead of the training config's (e.g. the
    # BigGAN recipe's normal) — silently wrong FID/IS (round-3 review).
    # The _ScopedGenerator proxy stays as a second line of defense for
    # any generator call traced outside this block.
    with export_lib._export_config_scope(spec):
        return _evaluate(shim, ts, eval_tasks, batch_size=batch_size,
                         num_averaging_runs=num_averaging_runs,
                         num_accu_examples=num_accu_examples,
                         export_accu_checkpoint=False, checkpoint_path=None)


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["params", "state"], meta_fields=[])
@dataclasses.dataclass
class _ShimState:
    """Pytree: gan-tasks (GILBO, accuracy) jit with ts as an argument."""
    params: dict
    state: dict


def evaluate_checkpoint(gan, checkpoint_path, eval_tasks, batch_size=64,
                        num_averaging_runs=1, num_accu_examples=204800,
                        export_accu_checkpoint=True) -> Dict[str, float]:
    """Evaluate one checkpoint (reference evaluate_tfhub_module,
    eval_gan_lib.py:95-212). Returns {metric_{mean,std,list}: value}."""
    cache = _jit_cache(gan)
    if ("template", batch_size) not in cache:
        cache[("template", batch_size)] = gan.init_state(
            jax.random.PRNGKey(0), batch_size)
    template = cache[("template", batch_size)]
    ts = ckpt_lib.restore_checkpoint(checkpoint_path, template)
    return _evaluate(gan, ts, eval_tasks, batch_size=batch_size,
                     num_averaging_runs=num_averaging_runs,
                     num_accu_examples=num_accu_examples,
                     export_accu_checkpoint=export_accu_checkpoint,
                     checkpoint_path=checkpoint_path)


def _evaluate(gan, ts, eval_tasks, batch_size, num_averaging_runs,
              num_accu_examples, export_accu_checkpoint,
              checkpoint_path) -> Dict[str, float]:
    np.random.seed(42)
    dataset = gan.dataset
    num_test_examples = dataset.eval_test_samples
    num_batches = int(np.ceil(num_test_examples / batch_size))

    # Validate gan-task preconditions BEFORE paying the checkpoint's
    # accu-fill + sampling + Inception cost: a misconfigured task (GILBO
    # on a normal-z recipe, any legacy task on a conditional model)
    # would otherwise abort the eval loop only after the full eval of
    # the first checkpoint (round-3 review).
    gan_tasks = [t for t in eval_tasks
                 if getattr(t, "run_with_gan", None) is not None]
    if gan_tasks and gan.conditional:
        raise ValueError(
            "The generator/discriminator-access tasks "
            f"({[type(t).__name__ for t in gan_tasks]}) are "
            "label-free and only support unconditional models (the "
            "reference's legacy run_in_session metrics predate "
            "conditional BigGAN). Remove them from eval_tasks.")
    for task in gan_tasks:
        validate = getattr(task, "validate_gan", None)
        if validate is not None:
            validate(gan)

    # Each image kwarg is materialized only if some gan task's signature
    # accepts it — the train split stream and the /255 float copies are
    # ~hundreds of MB at ImageNet eval sizes and e.g.
    # GeneratorConditionNumberTask consumes none of them. A **kwargs
    # signature receives EVERY kwarg from call_with_accepted_args, so
    # VAR_KEYWORD must count as accepting all of them (round-3 review).
    _image_kwarg_names = ("train_images", "eval_images", "test_images")
    accepted = set()
    for task in gan_tasks:
        sig = inspect.signature(task.run_with_gan)
        accepted |= set(sig.parameters)
        if any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values()):
            accepted |= set(_image_kwarg_names)
    need_real_images = bool({"eval_images", "test_images"} & accepted)

    state, had_accus = _update_bn_accumulators(
        gan, ts, batch_size, num_accu_examples=num_accu_examples)
    if had_accus:
        ts = _ShimState(params=ts.params, state=state) \
            if isinstance(ts, _ShimState) \
            else type(ts)(**{**ts.__dict__, "state": state})
        if export_accu_checkpoint and checkpoint_path is not None:
            step = ckpt_lib.step_of(checkpoint_path)
            accu_dir = os.path.join(gan.model_dir, "tfhub", str(step))
            os.makedirs(accu_dir, exist_ok=True)
            ckpt_lib.save_checkpoint(accu_dir, ts, step)

    if not eval_tasks:
        return {}

    params = gan._inference_params(ts)
    cache = _jit_cache(gan)
    if ("sampler", batch_size) not in cache:
        cache[("sampler", batch_size)] = _make_sampler(gan, batch_size)
    sampler = cache[("sampler", batch_size)]
    base_key = jax.random.PRNGKey(42)

    fake_dsets: List[eval_utils.EvalDataSample] = []
    for run in range(num_averaging_runs):
        def sample_fn(i, _run=run):
            images, _ = sampler(params, ts.state,
                                jax.random.fold_in(
                                    jax.random.fold_in(base_key, _run), i))
            return images

        fake_dset = eval_utils.EvalDataSample(
            eval_utils.sample_fake_dataset(sample_fn, num_batches,
                                           batch_size))
        fake_dsets.append(fake_dset)
        activations, logits = eval_utils.inception_transform_np(
            fake_dset.images, batch_size)
        fake_dset.set_data(activations, logits)
        fake_dset.set_num_examples(num_test_examples)
        if run != 0:
            # Bound host memory (eval_gan_lib.py:179-183).
            fake_dset.discard_images()

    # Real-data Inception stats are checkpoint-invariant (and batch-size
    # invariant — batch_size only chunks the transform): cache them per
    # gan so continuous_eval doesn't reload the eval split and re-extract
    # features for every checkpoint (~a third of the per-checkpoint eval
    # cost at ImageNet sizes). The reference recomputed them per
    # evaluate_tfhub_module call. Raw [0,255] images (~GBs at
    # ImageNet-128) are kept in the cache only while a gan task's
    # signature wants them; FID/IS/KID/PRD read just activations/logits.
    real_key = ("real_dset", dataset.name, num_test_examples)
    real_cache = _jit_cache(gan)
    real_dset = real_cache.get(real_key)
    if real_dset is None:
        real_dset = eval_utils.EvalDataSample(
            dataset.load_eval_images(num_test_examples))
        real_dset.activations, real_dset.logits = (
            eval_utils.inception_transform_np(real_dset.images, batch_size))
        real_dset.set_num_examples(num_test_examples)
        real_cache[real_key] = real_dset
    elif need_real_images and not len(real_dset.images):
        # A previous eval of this gan cached stats without images; a
        # GILBO/accuracy-style task now needs them — reload images only.
        real_dset.images = dataset.load_eval_images(num_test_examples)
        real_dset.set_num_examples(num_test_examples)
    if not need_real_images:
        real_dset.discard_images()

    result_dict: Dict[str, float] = {}
    for task in eval_tasks:
        if task in gan_tasks:
            continue
        task_results = [task.run_after_session(fd, real_dset)
                        for fd in fake_dsets]
        for key in task_results[0]:
            scores = np.array([d[key] for d in task_results])
            result_dict[key + "_mean"] = float(np.mean(scores))
            result_dict[key + "_std"] = float(np.std(scores))
            result_dict[key + "_list"] = "_".join(str(x) for x in scores)
    if gan_tasks:
        # Generator/discriminator-access tasks (GILBO, accuracy — the
        # reference's legacy run_in_session split, eval_task.py:64). These
        # run once per checkpoint, not per averaging run: they train their
        # own probes with internal seeds. Raw images go in model scale
        # [0, 1] (GILBO) or [0, 255] (accuracy's documented contract).
        # `accepted` (incl. the VAR_KEYWORD widening) was computed up
        # front, before the real cache decided whether to keep images.
        image_kwargs = {}
        if "train_images" in accepted:
            image_kwargs["train_images"] = dataset.load_eval_images(
                num_test_examples, split="train",
                failure_on_insufficient_examples=False) / 255.0
        if "eval_images" in accepted:
            image_kwargs["eval_images"] = real_dset.images / 255.0
        if "test_images" in accepted:
            image_kwargs["test_images"] = real_dset.images
        for task in gan_tasks:
            out = utils.call_with_accepted_args(
                task.run_with_gan, gan=gan, ts=ts,
                batch_size=batch_size, **image_kwargs)
            for key, value in out.items():
                result_dict[key + "_mean"] = float(value)
                result_dict[key + "_std"] = 0.0
                result_dict[key + "_list"] = str(value)
    return result_dict
