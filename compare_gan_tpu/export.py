"""Model export: the TF-Hub-module surface, TPU-native.

The reference exports TF-Hub modules per checkpoint with tags
{gen, disc} × {bs8, bs16, bs32, bs64} (modular_gan.py:289-306,
runner_lib.py:258-264) because TF1 graphs bake in batch sizes. JAX
inference fns are shape-polymorphic, so an export is just: the inference
parameters (EMA-swapped for G per the custom_getter semantics,
modular_gan.py:266-284), the state (BN stats/accumulators, SN u), and a
JSON spec describing the interface. `load_generator`/`load_discriminator`
rebuild pure jittable fns from an export directory without the original
gin config.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import re
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu import config as gin
from compare_gan_tpu import core


def _export_config_scope(spec):
    """Context under which a loaded module's forwards are traced: the
    export's gin snapshot when present (isolated from live bindings),
    else a passthrough for legacy exports without one."""
    text = spec.get("_config_text", "")
    return gin.config_scope(text) if text else contextlib.nullcontext()


def snapshot_z(spec, shape, name=None, prefer_eval_scope=False):
    """Draw z under an export's gin snapshot (must run inside an
    ops.rng rng_context).

    Resolves the distribution INSIDE the snapshot's config scope, so a
    fresh process honors the export's bindings rather than its own live
    config (round-3 review: querying live gin made the demo's
    z-distribution handling a no-op in real CLI use). With
    `prefer_eval_scope`, the `eval_z` scope wins whenever the snapshot
    binds ANY of its knobs (a partial override like `eval_z.stddev`
    still selects it); otherwise the training `z` scope is replicated
    (ModularGAN.z_generator's gin surface, modular_gan.py:365-384)."""
    from compare_gan_tpu import eval_gan_lib
    from compare_gan_tpu import utils
    from compare_gan_tpu.ops import rng as rng_ops

    with _export_config_scope(spec):
        knobs = ("distribution_fn", "minval", "maxval", "stddev")
        if prefer_eval_scope and any(
                gin.query(f"eval_z.{k}", default=None) is not None
                for k in knobs):
            return eval_gan_lib.z_generator(shape, name=name)
        return utils.call_with_accepted_args(
            gin.query("z.distribution_fn", default=rng_ops.uniform),
            shape=shape,
            minval=gin.query("z.minval", default=-1.0),
            maxval=gin.query("z.maxval", default=1.0),
            stddev=gin.query("z.stddev", default=1.0),
            name=name)


def sample_z(spec, n, seed=0, prefer_eval_scope=True):
    """Concrete [n, z_dim] float32 latents per the export's snapshot —
    the demo-facing wrapper over snapshot_z."""
    from compare_gan_tpu.ops import rng as rng_ops

    with rng_ops.rng_context(jax.random.PRNGKey(seed)):
        z = snapshot_z(spec, [int(n), int(spec["z_dim"])], name="demo_z",
                       prefer_eval_scope=prefer_eval_scope)
    return np.asarray(z, np.float32)


def export_module(gan, ts, export_dir: str) -> str:
    """Write <export_dir>/{module.npz, module_spec.json,
    export_config.gin}. The gin snapshot is what makes the export
    self-contained: the architecture code re-runs at load time, and its
    gin knobs (G.batch_norm_fn, G/D.spectral_norm, BigGAN channel/
    attention options, ...) define the network — without them a
    configured model would silently rebuild with defaults."""
    os.makedirs(export_dir, exist_ok=True)
    with open(os.path.join(export_dir, "export_config.gin"), "w") as f:
        f.write(gin.config_str())
    params = gan._inference_params(ts)
    arrays = {}
    for prefix, tree in [("params", params), ("state", ts.state)]:
        for k, v in tree.items():
            arrays[f"{prefix}/{k}"] = np.asarray(v)
    with open(os.path.join(export_dir, "module.npz"), "wb") as f:
        np.savez(f, **arrays)
    spec = {
        "architecture": gan._architecture,
        "dataset": gan.dataset.name,
        "z_dim": gan.z_dim,
        "conditional": gan.conditional,
        "num_classes": gan.dataset.num_classes,
        "image_shape": list(gan.dataset.image_shape),
        "tags": ["gen", "disc"],
        "step": int(ts.step),
    }
    with open(os.path.join(export_dir, "module_spec.json"), "w") as f:
        json.dump(spec, f, indent=2)
    return export_dir


def _load(export_dir: str):
    with open(os.path.join(export_dir, "module_spec.json")) as f:
        spec = json.load(f)
    # Capture (don't apply) the training gin snapshot; the loaders wrap
    # every forward trace in config_scope(snapshot) so the rebuilt
    # architecture sees exactly the exported bindings — the process's
    # live config is neither consulted nor clobbered, and two loaded
    # exports with different configs coexist (round-2 advisor finding).
    cfg = os.path.join(export_dir, "export_config.gin")
    config_text = ""
    if os.path.exists(cfg):
        with open(cfg) as f:
            config_text = f.read()
    spec["_config_text"] = config_text
    params, state = {}, {}
    with np.load(os.path.join(export_dir, "module.npz")) as data:
        for k in data.files:
            kind, name = k.split("/", 1)
            (params if kind == "params" else state)[name] = data[k]
    # Device arrays once at load: NumPy jit arguments would re-upload
    # the full weight set on every generate()/discriminate() call.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = jax.tree_util.tree_map(jnp.asarray, state)
    return spec, params, state


def _build_arch(spec, kind):
    from compare_gan_tpu.architectures import DISCRIMINATORS, GENERATORS
    if kind == "gen":
        return GENERATORS[spec["architecture"]](
            image_shape=tuple(spec["image_shape"]))
    return DISCRIMINATORS[spec["architecture"]]()


def load_generator(export_dir: str) -> Tuple[Callable, dict]:
    """Returns (generate(z, labels=None) -> images, spec). The fn is pure
    and jittable at any batch size (the 'gen' hub tag).

    The returned fn jits internally with params/state as ARGUMENTS: large
    weight pytrees must never be baked into the HLO (on tunneled backends
    programs over ~50 MB are rejected; same fix as metrics/gilbo.py)."""
    spec, params, state = _load(export_dir)
    with _export_config_scope(spec):
        generator = _build_arch(spec, "gen")

    @jax.jit
    def run(params, state, z, labels):
        def fwd():
            y = (jax.nn.one_hot(labels, spec["num_classes"])
                 if spec["conditional"] else None)
            return generator(z, y=y, is_training=False)

        images, _ = core.apply(fwd, params, state)
        return images

    def generate(z, labels=None):
        if spec["conditional"] and labels is None:
            raise ValueError("Conditional generator needs labels.")
        if labels is None:
            labels = np.zeros(len(z), np.int32)
        # jit traces lazily per shape; the scope guarantees every trace
        # sees the export's own bindings, not the process's live config.
        with _export_config_scope(spec):
            return run(params, state, z, labels)

    return generate, spec


# ---------------------------------------------------------------------------
# TF checkpoint import: reference-trained weights -> TrainState
# ---------------------------------------------------------------------------

# Optimizer slot variables the reference's TF Saver checkpoints carry but a
# TrainState import must skip (fresh optax state is created instead):
# "<var>/Adam", "<var>/Adam_1", Momentum/RMSProp slots, and the Adam power
# counters ("beta1_power", sometimes suffixed).
_TF_OPT_SLOT = re.compile(
    r".*/(Adam|Momentum|RMSProp)(_\d+)?$|^beta[12]_power(_\d+)?$")

# Variable-name suffixes that live in TrainState.state, not params
# (reference arch_ops.py: u_var :488-497, moving_* :88-95, accu/* :141-168).
_TF_STATE_SUFFIXES = ("/u_var", "/moving_mean", "/moving_variance",
                      "/accu_mean", "/accu_variance", "/accu_counter",
                      "/update_accus")

_TF_EMA_SUFFIX = "/ExponentialMovingAverage"


def _resolve_tf_checkpoint(path: str) -> str:
    """Accept a Saver prefix, a model_dir with a `checkpoint` pointer, or
    a TF-Hub module dir (variables/variables)."""
    import tensorflow as tf
    if os.path.isdir(path):
        hub_vars = os.path.join(path, "variables", "variables")
        if os.path.exists(hub_vars + ".index"):
            return hub_vars
        latest = tf.train.latest_checkpoint(path)
        if latest:
            return latest
        raise FileNotFoundError(
            f"No TF checkpoint or hub module found under {path}.")
    return path


def classify_tf_variable(name: str):
    """('param'|'state'|'ema'|'step'|'disc_step'|'skip', target_key).

    The name mapping is near-identity because core scope paths replicate
    the reference's variable_scope layout (golden-tested in
    tests/test_resnet_norm_golden.py); what remains is sorting each TF
    variable into the right TrainState tree."""
    if name.startswith("module/"):  # Hub-module instantiation scope.
        name = name[len("module/"):]
    if name in ("global_step", "global_step/ExponentialMovingAverage"):
        return ("step" if name == "global_step" else "skip"), name
    if name == "global_step_disc":
        return "disc_step", name
    if _TF_OPT_SLOT.match(name):
        return "skip", name
    if name.endswith(_TF_EMA_SUFFIX):
        return "ema", name[: -len(_TF_EMA_SUFFIX)]
    if name.endswith(_TF_STATE_SUFFIXES):
        return "state", name
    if name.startswith(("generator/", "discriminator/")):
        return "param", name
    return "skip", name


def import_reference_checkpoint(gan, checkpoint_path: str,
                                batch_size: int = 8, seed: int = 42):
    """Load a reference (google/compare_gan) TF Saver checkpoint or
    TF-Hub module into a TrainState for this framework's `gan`.

    Maps TF variables into the params/state/ema_params trees by name
    (layouts already agree: conv kernels HWIO, deconv kernels HWOI as
    stored by tf.nn.conv2d_transpose, linear [in, out], SN u_var (M,1) or
    (1,N), BN moving_*/accu_* — reference arch_ops.py:66-191,453-535),
    restores the two step counters (reference modular_gan.py:550-566),
    and creates FRESH optimizer state (Adam slots in the checkpoint are
    skipped; they only matter for resuming reference training, not for
    eval/export parity).

    Raises ValueError listing missing/extra variables if the checkpoint
    does not exactly cover the gan's parameter and state trees — a
    silent partial import would produce a subtly wrong model.
    """
    import jax.random as jrandom
    import tensorflow as tf

    reader = tf.train.load_checkpoint(
        _resolve_tf_checkpoint(checkpoint_path))
    names = sorted(reader.get_variable_to_shape_map())

    template = gan.init_state(jrandom.PRNGKey(seed), batch_size)
    params: dict = {}
    state: dict = {}
    ema: dict = {}
    step = None
    disc_step = None
    for name in names:
        kind, key = classify_tf_variable(name)
        if kind == "skip":
            continue
        value = reader.get_tensor(name)
        if kind == "step":
            step = int(value)
        elif kind == "disc_step":
            disc_step = int(value)
        else:
            {"param": params, "state": state, "ema": ema}[kind][key] = value

    def _check(got: dict, want: dict, tree_name: str):
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        if missing or extra:
            raise ValueError(
                f"TF checkpoint does not match the gan's {tree_name} tree."
                f" Missing: {missing[:5]}{'...' if len(missing) > 5 else ''}"
                f" Extra: {extra[:5]}{'...' if len(extra) > 5 else ''}")
        out = {}
        for k, v in want.items():
            arr = np.asarray(got[k])
            if arr.shape != tuple(v.shape):
                raise ValueError(
                    f"Shape mismatch for {k}: checkpoint {arr.shape} vs "
                    f"model {tuple(v.shape)}.")
            out[k] = jnp.asarray(arr, dtype=v.dtype)
        return out

    params = _check(params, template.params, "params")
    state = _check(state, template.state, "state")
    if template.ema_params:
        ema = _check(ema, template.ema_params, "ema_params")
    elif ema:
        raise ValueError(
            "Checkpoint carries EMA shadows but the gan was built with "
            "g_use_ema=False; construct it with g_use_ema=True so the "
            "reference's EMA-at-export semantics apply.")
    else:
        ema = {}

    return dataclasses.replace(
        template, params=params, state=state, ema_params=ema,
        step=jnp.asarray(step if step is not None else 0, jnp.int32),
        disc_step=jnp.asarray(
            disc_step if disc_step is not None else 0, jnp.int32))


def export_reference_checkpoint(gan, ts, prefix: str) -> str:
    """Inverse of import_reference_checkpoint: write this TrainState as a
    TF1 Saver checkpoint with the reference's variable names, so models
    trained here load into google/compare_gan (its eval stack, TF-Hub
    export flow, or as a warm start). Optimizer slots are not written —
    the reference recreates Adam slots on first use."""
    import tensorflow as tf

    graph = tf.Graph()
    with graph.as_default():
        for name, value in {**ts.params, **ts.state}.items():
            tf.compat.v1.get_variable(
                name, initializer=np.asarray(value))
        for name in ts.ema_params:
            tf.compat.v1.get_variable(
                name + _TF_EMA_SUFFIX,
                initializer=np.asarray(ts.ema_params[name]))
        tf.compat.v1.get_variable(
            "global_step", initializer=np.asarray(int(ts.step), np.int64),
            dtype=tf.int64)
        tf.compat.v1.get_variable(
            "global_step_disc",
            initializer=np.asarray(int(ts.disc_step), np.int32),
            dtype=tf.int32)
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, prefix)


def export_saved_model(gan, ts, export_dir: str,
                       batch_sizes=(8, 16, 32, 64)) -> str:
    """TF SavedModel export via jax2tf — the serving-compatible analog of
    the reference's TF-Hub modules with their {bs8..bs64} signatures
    (modular_gan.py:289-306). Needs host TensorFlow; the generator runs
    as converted XLA inside TF."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    params = gan._inference_params(ts)
    state = dict(ts.state)

    # Weights enter the converted fn as ARGUMENTS and live in the
    # SavedModel as shared tf.Variables: a closure would embed a full
    # copy of every weight as graph constants in EACH batch-size
    # concrete function (~4x158M params for BigGAN-128, over protobuf's
    # 2 GB limit).
    def generate(params, state, z, labels):
        def fwd():
            y = (gan._get_one_hot_labels(labels)
                 if gan.conditional else None)
            return gan.generator(z, y=y, is_training=False)

        images, _ = core.apply(fwd, params, state)
        return images

    converted = jax2tf.convert(generate, with_gradient=False)
    module = tf.Module()
    module.params = jax.tree_util.tree_map(
        lambda v: tf.Variable(np.asarray(v), trainable=False), params)
    module.state = jax.tree_util.tree_map(
        lambda v: tf.Variable(np.asarray(v), trainable=False), state)
    signatures = {}
    for bs in batch_sizes:
        def make_fn(bs=bs):
            @tf.function(autograph=False, input_signature=[
                tf.TensorSpec([bs, gan.z_dim], tf.float32, name="z"),
                tf.TensorSpec([bs], tf.int32, name="labels"),
            ])
            def fn(z, labels):
                return converted(module.params, module.state, z, labels)
            return fn

        tf_fn = make_fn()
        setattr(module, f"generate_bs{bs}", tf_fn)
        signatures[f"gen_bs{bs}"] = tf_fn.get_concrete_function()
    tf.saved_model.save(module, export_dir, signatures=signatures)
    return export_dir


def load_discriminator(export_dir: str) -> Tuple[Callable, dict]:
    """Returns (discriminate(images, labels=None) -> (pred, logits,
    features), spec). The 'disc' hub tag. Jits internally with
    params/state as arguments (see load_generator)."""
    spec, params, state = _load(export_dir)
    with _export_config_scope(spec):
        discriminator = _build_arch(spec, "disc")

    @jax.jit
    def run(params, state, images, labels):
        def fwd():
            y = (jax.nn.one_hot(labels, spec["num_classes"])
                 if spec["conditional"] else None)
            return discriminator(images, y=y, is_training=False)

        out, _ = core.apply(fwd, params, state)
        return out

    def discriminate(images, labels=None):
        if spec["conditional"] and labels is None:
            raise ValueError("Conditional discriminator needs labels.")
        if labels is None:
            labels = np.zeros(len(images), np.int32)
        with _export_config_scope(spec):
            return run(params, state, images, labels)

    return discriminate, spec
