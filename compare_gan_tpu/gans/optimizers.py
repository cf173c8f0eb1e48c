"""Optimizers, gin-bindable under the reference's names.

The reference exposes TF optimizers through gin
(`gin.tf.external_configurables`, main.py:39), e.g.
`ModularGAN.g_optimizer_fn = @tf.train.AdamOptimizer` with
`tf.train.AdamOptimizer.beta1 = 0.5` (example_configs/*.gin). These wrappers
keep those binding names but build optax gradient transformations — all
update math stays on device inside the jitted train step.
"""

from __future__ import annotations

import optax

from compare_gan_tpu import config as gin


@gin.configurable("AdamOptimizer")
def adam_optimizer(learning_rate, beta1=0.9, beta2=0.999, epsilon=1e-8,
                   moment_dtype=None, name=None):
    """optax Adam under the reference's binding name.

    moment_dtype: TPU-native opt-in extension — store the FIRST moment in
    a reduced dtype ('bfloat16'). The optimizer's parameter passes are
    HBM-bandwidth-bound (~19 ms of the BigGAN-128 step, CLAUDE.md
    profile); halving m's read+write traffic buys throughput at a small,
    well-understood numerics deviation from the f32 reference recipe.
    Default None keeps exact f32 parity (update math is f32 either way —
    optax casts m to the compute dtype inside the update)."""
    del name
    return optax.adam(learning_rate, b1=beta1, b2=beta2, eps=epsilon,
                      mu_dtype=moment_dtype)


@gin.configurable("GradientDescentOptimizer")
def sgd_optimizer(learning_rate, name=None):
    del name
    return optax.sgd(learning_rate)


@gin.configurable("MomentumOptimizer")
def momentum_optimizer(learning_rate, momentum=0.9, use_nesterov=False,
                       name=None):
    del name
    return optax.sgd(learning_rate, momentum=momentum, nesterov=use_nesterov)


@gin.configurable("RMSPropOptimizer")
def rmsprop_optimizer(learning_rate, decay=0.9, momentum=0.0, epsilon=1e-10,
                      name=None):
    del name
    # initial_scale=1.0: TF1's RMSProp initializes the ms accumulator to
    # ONES (optax defaults to zeros, which ~3x-amplifies the first
    # updates vs the reference recipe).
    return optax.rmsprop(learning_rate, decay=decay, momentum=momentum,
                         eps=epsilon, initial_scale=1.0)


# The reference's gin configs reference TF names directly; alias both the
# @references and the parameter-binding scopes.
for _tf_name, _fn, _canonical in [
        ("tf.train.AdamOptimizer", adam_optimizer, "AdamOptimizer"),
        ("tf.train.GradientDescentOptimizer", sgd_optimizer,
         "GradientDescentOptimizer"),
        ("tf.train.MomentumOptimizer", momentum_optimizer,
         "MomentumOptimizer"),
        ("tf.train.RMSPropOptimizer", rmsprop_optimizer, "RMSPropOptimizer"),
]:
    gin.register(_tf_name, _fn)
    gin.add_scope_alias(_tf_name, _canonical)
