"""Whole-network TF2 forward oracles.

The importer tests prove name/shape parity and individual ops are
TF-oracle-tested (deconv, SAME conv, unpool), but nothing composed them:
network-level numeric parity was inferred, never measured. Here the full
sndcgan G, sndcgan D (spectral norm) and resnet_cifar G (BN, train+eval
modes) are re-implemented in plain TF2 ops from the reference's layer
semantics (reference architectures/sndcgan.py:36-127,
resnet_cifar.py:34-112, arch_ops.py:327-367,453-535) and fed the exact
same weights/state as the JAX networks; forward outputs must agree to
float32 tolerance. This is the strongest zero-egress proxy for the
"reference-trained checkpoint evaluates identically" claim.
"""

import numpy as np
import pytest

import jax

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu.architectures import DISCRIMINATORS, GENERATORS

tf = pytest.importorskip("tensorflow")


# ---------------------------------------------------------------------------
# TF2 re-implementations (independent of compare_gan_tpu.ops on purpose).
# ---------------------------------------------------------------------------


def _l2n(x, eps=1e-12):
    return x * tf.math.rsqrt(tf.maximum(tf.reduce_sum(tf.square(x)), eps))


def _sn_sigma(w, u):
    """One persisted power iteration, left singular vector (reference
    arch_ops.py:453-535): v = l2n(W^T u); u' = l2n(W v); sigma = u'^T W v.
    `u` is the persisted state; the forward uses the UPDATED u'."""
    wf = tf.reshape(w, (-1, w.shape[-1]))
    v = _l2n(tf.matmul(wf, u, transpose_a=True))
    t = tf.matmul(wf, v)
    u_new = _l2n(t)
    return tf.reduce_sum(t * u_new)


def _sn(v, scope):
    return _sn_sigma(tf.constant(v[scope + "/kernel"]),
                     tf.constant(v[scope + "/kernel/u_var"]))


def _linear(v, scope, x, use_sn=False, use_bias=True):
    out = tf.matmul(x, v[scope + "/kernel"])
    if use_sn:
        out = out / _sn(v, scope)
    if use_bias:
        out = out + v[scope + "/bias"]
    return out


def _conv(v, scope, x, stride, use_sn=False):
    out = tf.nn.conv2d(x, v[scope + "/kernel"],
                       strides=[1, stride, stride, 1], padding="SAME")
    if use_sn:
        out = out / _sn(v, scope)
    return out + v[scope + "/bias"]


def _deconv(v, scope, x, output_shape, stride, use_sn=False):
    # Kernel stored HWOI = tf.nn.conv2d_transpose's native layout.
    out = tf.nn.conv2d_transpose(
        x, v[scope + "/kernel"], output_shape=output_shape,
        strides=[1, stride, stride, 1], padding="SAME")
    if use_sn:
        out = out / _sn(v, scope)
    return out + v[scope + "/bias"]


def _bn(v, scope, x, training):
    """batch_norm: standardize by batch moments (train) or moving stats
    (eval), eps 1e-3, then gamma/beta (reference arch_ops.py:194-367)."""
    shape = x.shape
    if len(shape) == 2:
        x = tf.reshape(x, (-1, 1, 1, shape[-1]))
    if training:
        mean = tf.reduce_mean(x, axis=[0, 1, 2])
        var = tf.reduce_mean(tf.square(x), axis=[0, 1, 2]) - tf.square(mean)
    else:
        mean = tf.constant(v[scope + "/moving_mean"])
        var = tf.constant(v[scope + "/moving_variance"])
    out = (x - mean) * tf.math.rsqrt(var + 1e-3)
    out = out * v[scope + "/gamma"] + v[scope + "/beta"]
    if len(shape) == 2:
        out = tf.reshape(out, (-1, shape[-1]))
    return out


def _unpool(x):
    """Zero-interleaved 2x upsample: value at the top-left of each 2x2
    cell (reference resnet_ops.py:35-56)."""
    b, h, w, c = x.shape
    row = tf.reshape(tf.stack([x, tf.zeros_like(x)], axis=3),
                     (b, h, 2 * w, c))
    return tf.reshape(tf.stack([row, tf.zeros_like(row)], axis=2),
                      (b, 2 * h, 2 * w, c))


def tf_sndcgan_g(v, z, training):
    """Reference sndcgan.py:36-81 for 32x32x3."""
    bs = z.shape[0]
    net = _linear(v, "generator/g_fc1", z)
    net = tf.nn.relu(_bn(v, "generator/g_bn1", net, training))
    net = tf.reshape(net, (bs, 4, 4, 512))
    net = _deconv(v, "generator/g_dc2", net, (bs, 8, 8, 256), 2)
    net = tf.nn.relu(_bn(v, "generator/g_bn2", net, training))
    net = _deconv(v, "generator/g_dc3", net, (bs, 16, 16, 128), 2)
    net = tf.nn.relu(_bn(v, "generator/g_bn3", net, training))
    net = _deconv(v, "generator/g_dc4", net, (bs, 32, 32, 64), 2)
    net = tf.nn.relu(_bn(v, "generator/g_bn4", net, training))
    net = _deconv(v, "generator/g_dc5", net, (bs, 32, 32, 3), 1)
    return (tf.tanh(net) + 1.0) / 2.0


def tf_sndcgan_d(v, x, return_features=False):
    """Reference sndcgan.py:84-127: 7 SN convs, leak 0.1, SN final fc.
    With return_features, also yields the flattened penultimate features
    (the reference D's third return, which the SSGAN/S3GAN heads
    consume)."""
    net = x * 2.0 - 1.0
    for scope, stride in [("d_conv1", 1), ("d_conv2", 2), ("d_conv3", 1),
                          ("d_conv4", 2), ("d_conv5", 1), ("d_conv6", 2),
                          ("d_conv7", 1)]:
        net = _conv(v, "discriminator/" + scope, net, stride, use_sn=True)
        net = tf.nn.leaky_relu(net, alpha=0.1)
    net = tf.reshape(net, (x.shape[0], -1))
    logit = _linear(v, "discriminator/d_fc1", net, use_sn=True)
    if return_features:
        return logit, net
    return logit


def tf_resnet_cifar_g_block(v, name, x, training):
    """G up-block, SN-paper layout (reference resnet_ops.py:70-182):
    unpool feeds conv1 AND the 3x3 shortcut conv; BN before each conv."""
    shortcut = _conv(v, f"{name}/up_conv_shortcut", _unpool(x), 1)
    out = tf.nn.relu(_bn(v, f"{name}/bn1", x, training))
    out = _conv(v, f"{name}/up_conv1", _unpool(out), 1)
    out = tf.nn.relu(_bn(v, f"{name}/bn2", out, training))
    out = _conv(v, f"{name}/same_conv2", out, 1)
    return out + shortcut


def tf_resnet_cifar_g(v, z, training):
    """Reference resnet_cifar.py:34-112 (non-hierarchical z, no y)."""
    out = _linear(v, "generator/fc_noise", z)
    out = tf.reshape(out, (-1, 4, 4, 256))
    for i in (1, 2, 3):
        out = tf_resnet_cifar_g_block(v, f"generator/B{i}", out, training)
    out = tf.nn.relu(_bn(v, "generator/final_norm", out, training))
    out = _conv(v, "generator/final_conv", out, 1)
    return tf.sigmoid(out)


# ---------------------------------------------------------------------------
# Harness: randomize one weight set, run both frameworks, compare.
# ---------------------------------------------------------------------------


def _randomized(tree, rng, scale=0.05):
    out = {}
    for k, val in tree.items():
        arr = rng.standard_normal(np.shape(val)).astype(np.float32)
        if k.endswith("gamma"):
            arr = 1.0 + 0.1 * arr
        elif k.endswith(("beta", "bias")):
            arr = 0.1 * arr
        elif k.endswith("moving_variance"):
            arr = np.abs(arr) * 0.5 + 0.5
        elif k.endswith("moving_mean"):
            arr = 0.1 * arr
        elif k.endswith("u_var"):
            pass  # any direction; both sides run the same power iteration
        else:
            arr = scale * arr
        out[k] = arr
    return out


def _init_and_randomize(fn, *args, seed=0):
    _, params, state = core.init(fn, jax.random.PRNGKey(0), *args)
    rng = np.random.default_rng(seed)
    vars_ = _randomized(params, rng)
    vars_.update(_randomized(state, rng))
    params = {k: vars_[k] for k in params}
    state = {k: vars_[k] for k in state}
    return vars_, params, state


@pytest.mark.parametrize("training", [True, False])
def test_sndcgan_generator_forward_oracle(training):
    gin.parse_config("G.batch_norm_fn = @batch_norm")
    gen = GENERATORS["sndcgan_arch"](image_shape=(32, 32, 3))

    def g_fn(z):
        return gen(z, None, is_training=training)

    z = np.random.default_rng(1).standard_normal((4, 128)).astype(np.float32)
    vars_, params, state = _init_and_randomize(g_fn, z)
    got, _ = core.apply(g_fn, params, state, z)
    want = tf_sndcgan_g(vars_, tf.constant(z), training).numpy()
    assert want.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sndcgan_discriminator_sn_forward_oracle():
    gin.parse_config("D.spectral_norm = True")
    disc = DISCRIMINATORS["sndcgan_arch"]()

    def d_fn(x):
        return disc(x, None, is_training=False)

    x = np.random.default_rng(2).random((4, 32, 32, 3)).astype(np.float32)
    vars_, params, state = _init_and_randomize(d_fn, x)
    (pred, logit, _), _ = core.apply(d_fn, params, state, x)
    want_logit = tf_sndcgan_d(vars_, tf.constant(x)).numpy()
    np.testing.assert_allclose(np.asarray(logit), want_logit,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred),
                               1.0 / (1.0 + np.exp(-want_logit)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("training", [True, False])
def test_resnet_cifar_generator_forward_oracle(training):
    """Composes fused up-convs, the zero-interleave unpool, residual adds
    and four BN layers — both BN modes."""
    gin.parse_config("G.batch_norm_fn = @batch_norm")
    gen = GENERATORS["resnet_cifar_arch"](image_shape=(32, 32, 3))

    def g_fn(z):
        return gen(z, None, is_training=training)

    z = np.random.default_rng(3).standard_normal((4, 128)).astype(np.float32)
    vars_, params, state = _init_and_randomize(g_fn, z)
    got, _ = core.apply(g_fn, params, state, z)
    want = tf_resnet_cifar_g(vars_, tf.constant(z), training).numpy()
    assert want.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_resnet_cifar_generator_oracle_unfused_path(monkeypatch):
    """The fused and unfused scale-conv paths must BOTH match the TF
    oracle (the oracle always uses the reference's unfused unpool+conv)."""
    gin.parse_config("G.batch_norm_fn = @batch_norm\n"
                     "resnet_ops.fused_scale_convs = False")
    gen = GENERATORS["resnet_cifar_arch"](image_shape=(32, 32, 3))

    def g_fn(z):
        return gen(z, None, is_training=True)

    z = np.random.default_rng(4).standard_normal((2, 128)).astype(np.float32)
    vars_, params, state = _init_and_randomize(g_fn, z)
    got, _ = core.apply(g_fn, params, state, z)
    want = tf_resnet_cifar_g(vars_, tf.constant(z), True).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# BigGAN generator oracle: the flagship family's G semantics — SN via
# persisted power iteration on every layer, accumulator conditional BN,
# hierarchical z + embedded y, the SAGAN non-local block, fused up-convs
# — re-derived in TF2 from the reference (resnet_biggan.py:154-302,
# arch_ops.py:122-191,423-445,709-758).
# ---------------------------------------------------------------------------

_BIGGAN_EPS = 1e-5  # The recipe's standardize_batch.epsilon.


def _sn_auto(v, scope):
    """singular_value='left' (u persisted along rows); mirrors
    spectral_norm_sigma's 2-read rewrite: sigma = u'^T (W v)."""
    return _sn(v, scope)


def _std_accu(v, scope, x, training):
    """standardize_batch, accumulator mode (use_moving_averages=False):
    train normalizes by batch moments; eval by accu/counter (with
    update_accus=0 the accumulators are read-only)."""
    if training:
        mean = tf.reduce_mean(x, axis=[0, 1, 2])
        var = tf.reduce_mean(tf.square(x), axis=[0, 1, 2]) - tf.square(mean)
    else:
        counter = v[f"{scope}/accu/accu_counter"]
        mean = tf.constant(v[f"{scope}/accu/accu_mean"]) / counter
        var = tf.constant(v[f"{scope}/accu/accu_variance"]) / counter
    return (x - mean) * tf.math.rsqrt(var + _BIGGAN_EPS)


def _cbn(v, scope, x, zy, training):
    """Conditional BN: gamma/beta = SN-linear(zy), no bias
    (arch_ops.py:423-445)."""
    out = _std_accu(v, scope, x, training)
    gamma = _linear(v, f"{scope}/condition/gamma", zy, use_sn=True,
                    use_bias=False)
    beta = _linear(v, f"{scope}/condition/beta", zy, use_sn=True,
                   use_bias=False)
    return out * gamma[:, None, None, :] + beta[:, None, None, :]


def _plain_bn_accu(v, scope, x, training):
    out = _std_accu(v, scope, x, training)
    return out * v[f"{scope}/gamma"] + v[f"{scope}/beta"]


def _conv_nobias_sn(v, scope, x):
    out = tf.nn.conv2d(x, v[scope + "/kernel"], strides=[1, 1, 1, 1],
                       padding="SAME")
    return out / _sn_auto(v, scope)


def _non_local(v, scope, x):
    """SAGAN self-attention: theta/phi/g 1x1 SN convs (no bias), 2x2
    max-pool on phi/g, plain softmax attention, sigma-gated residual."""
    b, h, w, c = x.shape
    theta = tf.reshape(_conv_nobias_sn(v, f"{scope}/conv2d_theta", x),
                       (b, h * w, c // 8))
    phi = _conv_nobias_sn(v, f"{scope}/conv2d_phi", x)
    phi = tf.nn.max_pool2d(phi, 2, 2, "VALID")
    phi = tf.reshape(phi, (b, (h // 2) * (w // 2), c // 8))
    g = _conv_nobias_sn(v, f"{scope}/conv2d_g", x)
    g = tf.nn.max_pool2d(g, 2, 2, "VALID")
    g = tf.reshape(g, (b, (h // 2) * (w // 2), c // 2))
    attn = tf.nn.softmax(tf.einsum("bnc,bmc->bnm", theta, phi), axis=-1)
    attn_g = tf.reshape(tf.einsum("bnm,bmc->bnc", attn, g),
                        (b, h, w, c // 2))
    attn_g = _conv_nobias_sn(v, f"{scope}/conv2d_attn_g", attn_g)
    return x + v[f"{scope}/sigma"] * attn_g


def _biggan_g_block(v, name, x, zy, training):
    """BigGAN up-block: cBN -> relu -> unpool+conv1 -> cBN -> relu ->
    conv2, 1x1 shortcut conv on the unpooled input
    (resnet_biggan.py:81-151)."""
    out = _cbn(v, f"{name}/bn1", x, zy, training)
    out = _conv(v, f"{name}/up_conv1", _unpool(tf.nn.relu(out)), 1,
                use_sn=True)
    out = _cbn(v, f"{name}/bn2", out, zy, training)
    out = _conv(v, f"{name}/same_conv2", tf.nn.relu(out), 1, use_sn=True)
    shortcut = _conv(v, f"{name}/up_conv_shortcut", _unpool(x), 1,
                     use_sn=True)
    return out + shortcut


def tf_biggan32_g(v, z, y, training):
    """resnet_biggan G at 32px (ch table [4,4,4,4], 3 blocks), attention
    after B2, hierarchical z (4 chunks) + embed_y concat conditioning."""
    y_emb = _linear(v, "generator/embed_y", y, use_bias=False)
    z_chunks = tf.split(z, 4, axis=1)
    z0, z_per_block = z_chunks[0], z_chunks[1:]
    net = _linear(v, "generator/fc_noise", z0, use_sn=True)
    net = tf.reshape(net, (-1, 4, 4, 384))
    for i in (1, 2, 3):
        zy = tf.concat([z_per_block[i - 1], y_emb], axis=1)
        net = _biggan_g_block(v, f"generator/B{i}", net, zy, training)
        if i == 2:
            net = _non_local(v, "generator/non_local_block", net)
    net = _plain_bn_accu(v, "generator/final_norm", net, training)
    net = tf.nn.relu(net)
    net = _conv(v, "generator/final_conv", net, 1, use_sn=True)
    return (tf.tanh(net) + 1.0) / 2.0


@pytest.mark.parametrize("training", [True, False])
def test_biggan32_generator_forward_oracle(training):
    gin.parse_config(
        "G.batch_norm_fn = @conditional_batch_norm\n"
        "G.spectral_norm = True\n"
        "resnet_biggan.Generator.blocks_with_attention = 'B2'\n"
        "standardize_batch.decay = 0.9\n"
        "standardize_batch.epsilon = 1e-5\n"
        "standardize_batch.use_moving_averages = False\n")
    gen = GENERATORS["resnet_biggan_arch"](image_shape=(32, 32, 3))

    rng = np.random.default_rng(5)
    z = rng.standard_normal((4, 120)).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[[0, 1, 2, 3]]

    def g_fn(z_, y_):
        return gen(z_, y_, is_training=training)

    vars_, params, state = _init_and_randomize(g_fn, z, y, seed=5)
    # Integer accumulator switch must stay an int (eval: no updates).
    for k in state:
        if k.endswith("update_accus"):
            vars_[k] = state[k] = np.zeros((), np.int32)
        elif k.endswith("accu_counter"):
            vars_[k] = state[k] = np.float32(np.abs(vars_[k]) + 1.0)
    got, _ = core.apply(g_fn, params, state, z, y)
    want = tf_biggan32_g(vars_, tf.constant(z), tf.constant(y),
                         training).numpy()
    assert want.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def _avgpool2(x):
    return tf.nn.avg_pool2d(x, 2, 2, "VALID")


def _biggan_d_block(v, name, x, down, shortcut):
    """BigGAN D block: no BN (batch_norm_fn=None passes through), relu
    on the input, conv1 same, conv2 downsampled (conv then 2x2 avg-pool
    — the fused path is bit-exact to this), 1x1 down shortcut only when
    channels change (resnet_biggan.py:81-151,305-425)."""
    out = _conv(v, f"{name}/same_conv1", tf.nn.relu(x), 1, use_sn=True)
    out = tf.nn.relu(out)
    if down:
        out = _avgpool2(_conv(v, f"{name}/down_conv2", out, 1, use_sn=True))
    else:
        out = _conv(v, f"{name}/same_conv2", out, 1, use_sn=True)
    if shortcut:
        # add_shortcut=False means NO skip connection at all (the
        # reference's BigGanResNetBlock only adds the 1x1-conv shortcut,
        # resnet_biggan.py:141-147; D blocks with equal in/out channels
        # are purely feed-forward).
        sc = _avgpool2(_conv(v, f"{name}/down_conv_shortcut", x, 1,
                             use_sn=True))
        out = out + sc
    return out


def tf_biggan32_d(v, x, y):
    """resnet_biggan D at 32px: B1-B3 downsample, B4 same; attention
    after B1; relu -> SUM pool -> SN final_fc + projection
    <SN(embed) y, h> (resnet_biggan.py:305-425)."""
    net = _biggan_d_block(v, "discriminator/B1", x, down=True,
                          shortcut=True)
    net = _non_local(v, "discriminator/non_local_block", net)
    net = _biggan_d_block(v, "discriminator/B2", net, down=True,
                          shortcut=False)
    net = _biggan_d_block(v, "discriminator/B3", net, down=True,
                          shortcut=False)
    net = _biggan_d_block(v, "discriminator/B4", net, down=False,
                          shortcut=False)
    h = tf.reduce_sum(tf.nn.relu(net), axis=[1, 2])
    logit = _linear(v, "discriminator/final_fc", h, use_sn=True)
    k = tf.constant(v["discriminator/embedding_fc/kernel"])
    k = k / _sn_sigma(k, tf.constant(
        v["discriminator/embedding_fc/kernel/u_var"]))
    logit += tf.reduce_sum(tf.matmul(y, k) * h, axis=1, keepdims=True)
    return logit


def test_biggan32_discriminator_forward_oracle():
    gin.parse_config("D.spectral_norm = True")
    disc = DISCRIMINATORS["resnet_biggan_arch"](project_y=True)

    rng = np.random.default_rng(6)
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[[3, 0, 2, 1]]

    def d_fn(x_, y_):
        return disc(x_, y_, is_training=False)

    vars_, params, state = _init_and_randomize(d_fn, x, y, seed=6)
    (pred, logit, h), _ = core.apply(d_fn, params, state, x, y)
    want = tf_biggan32_d(vars_, tf.constant(x), tf.constant(y)).numpy()
    np.testing.assert_allclose(np.asarray(logit), want, rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred),
                               1.0 / (1.0 + np.exp(-want)),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# BigGAN-DEEP oracles: the deep family's distinctive semantics — 1x1->
# 3x3->3x3->1x1 bottleneck blocks, identity-PRESERVING skips (channel
# slice in G's up blocks, conv-concat channel add in D's down blocks),
# z never chunked (z concat embed_y conditions every cBN), attention
# hard-wired at 64px — re-derived in TF2 from the reference
# (resnet_biggan_deep.py:60-180,183-310,313-433). ch=16 keeps the 64px
# networks CPU-sized while hitting every skip variant.
# ---------------------------------------------------------------------------


def _deep_g_block(v, name, x, zy, training, up, out_ch):
    """G bottleneck block: 4 cBN+relu+conv stages; the skip drops
    channels by SLICING (identity-preserving) and unpools — no conv."""
    out = _cbn(v, f"{name}/conv1/bn", x, zy, training)
    out = _conv(v, f"{name}/conv1/1x1_conv", tf.nn.relu(out), 1,
                use_sn=True)
    out = _cbn(v, f"{name}/conv2/bn", out, zy, training)
    out = tf.nn.relu(out)
    if up:
        out = _unpool(out)
    out = _conv(v, f"{name}/conv2/3x3_conv", out, 1, use_sn=True)
    out = _cbn(v, f"{name}/conv3/bn", out, zy, training)
    out = _conv(v, f"{name}/conv3/3x3_conv", tf.nn.relu(out), 1,
                use_sn=True)
    out = _cbn(v, f"{name}/conv4/bn", out, zy, training)
    out = _conv(v, f"{name}/conv4/1x1_conv", tf.nn.relu(out), 1,
                use_sn=True)
    assert out.shape[-1] == out_ch
    shortcut = x[:, :, :, :out_ch]
    if up:
        shortcut = _unpool(shortcut)
    return out + shortcut


def tf_biggan_deep64_g(v, z, y, training):
    """Deep G at 64px (ch=16): blocks alternate none/up; channel drops
    at B4/B6/B8; attention after the up-block that reaches 64px."""
    y_emb = _linear(v, "generator/embed_y", y, use_bias=False)
    zy = tf.concat([z, y_emb], axis=1)
    net = _linear(v, "generator/fc_noise", zy, use_sn=True)
    net = tf.reshape(net, (-1, 4, 4, 256))
    out_channels = [256, 256, 256, 128, 128, 64, 64, 32]
    for i, out_ch in enumerate(out_channels):
        up = i % 2 == 1
        net = _deep_g_block(v, f"generator/B{i + 1}", net, zy, training,
                            up=up, out_ch=out_ch)
        if up and net.shape[1] == 64:
            net = _non_local(v, "generator/non_local_block", net)
    net = _plain_bn_accu(v, "generator/final_norm", net, training)
    net = _conv(v, "generator/final_conv", tf.nn.relu(net), 1, use_sn=True)
    return (tf.tanh(net) + 1.0) / 2.0


def _deep_d_block(v, name, x, down, out_ch):
    """D bottleneck block (no BN): relu+conv stages; the skip pools and
    ADDS channels by concatenating a 1x1-conv's output."""
    out = _conv(v, f"{name}/conv1/1x1_conv", tf.nn.relu(x), 1, use_sn=True)
    out = _conv(v, f"{name}/conv2/3x3_conv", tf.nn.relu(out), 1,
                use_sn=True)
    out = _conv(v, f"{name}/conv3/3x3_conv", tf.nn.relu(out), 1,
                use_sn=True)
    out = tf.nn.relu(out)
    if down:
        out = _avgpool2(out)
    out = _conv(v, f"{name}/conv4/1x1_conv", out, 1, use_sn=True)
    shortcut = _avgpool2(x) if down else x
    if x.shape[-1] < out_ch:
        added = _conv(v, f"{name}/shortcut/add_channels", shortcut, 1,
                      use_sn=True)
        shortcut = tf.concat([shortcut, added], axis=-1)
    return out + shortcut


def tf_biggan_deep64_d(v, x, y):
    """Deep D at 64px (ch=16): initial 3x3 conv, blocks alternate
    down/none with concat channel-adds, sum pool + SN projection."""
    net = _conv(v, "discriminator/initial_conv", x, 1, use_sn=True)
    out_channels = [64, 64, 128, 128, 256, 256, 256, 256]
    for i, out_ch in enumerate(out_channels):
        net = _deep_d_block(v, f"discriminator/B{i + 1}", net,
                            down=i % 2 == 0, out_ch=out_ch)
    h = tf.reduce_sum(tf.nn.relu(net), axis=[1, 2])
    logit = _linear(v, "discriminator/final_fc", h, use_sn=True)
    k = tf.constant(v["discriminator/embedding_fc/kernel"])
    k = k / _sn_sigma(k, tf.constant(
        v["discriminator/embedding_fc/kernel/u_var"]))
    return logit + tf.reduce_sum(tf.matmul(y, k) * h, axis=1,
                                 keepdims=True)


@pytest.mark.parametrize("training", [True, False])
def test_biggan_deep64_generator_forward_oracle(training):
    gin.parse_config(
        "G.batch_norm_fn = @conditional_batch_norm\n"
        "G.spectral_norm = True\n"
        "resnet_biggan_deep.Generator.ch = 16\n"
        "standardize_batch.decay = 0.9\n"
        "standardize_batch.epsilon = 1e-5\n"
        "standardize_batch.use_moving_averages = False\n")
    gen = GENERATORS["resnet_biggan_deep_arch"](image_shape=(64, 64, 3))

    rng = np.random.default_rng(8)
    z = rng.standard_normal((2, 20)).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[[1, 7]]

    def g_fn(z_, y_):
        return gen(z_, y_, is_training=training)

    vars_, params, state = _init_and_randomize(g_fn, z, y, seed=8)
    for k in state:
        if k.endswith("update_accus"):
            vars_[k] = state[k] = np.zeros((), np.int32)
        elif k.endswith("accu_counter"):
            vars_[k] = state[k] = np.float32(np.abs(vars_[k]) + 1.0)
    got, _ = core.apply(g_fn, params, state, z, y)
    want = tf_biggan_deep64_g(vars_, tf.constant(z), tf.constant(y),
                              training).numpy()
    assert want.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_biggan_deep64_discriminator_forward_oracle():
    gin.parse_config("D.spectral_norm = True\n"
                     "resnet_biggan_deep.Discriminator.ch = 16\n")
    disc = DISCRIMINATORS["resnet_biggan_deep_arch"](project_y=True)

    rng = np.random.default_rng(9)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[[4, 2]]

    def d_fn(x_, y_):
        return disc(x_, y_, is_training=False)

    vars_, params, state = _init_and_randomize(d_fn, x, y, seed=9)
    (pred, logit, _), _ = core.apply(d_fn, params, state, x, y)
    want = tf_biggan_deep64_d(vars_, tf.constant(x), tf.constant(y)).numpy()
    np.testing.assert_allclose(np.asarray(logit), want, rtol=1e-4,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# SSGAN / S3GAN HEAD oracles: the GAN-subclass heads on top of the
# (already-oracled) sndcgan D, on shared weights — the last
# network-level parity surface behind the importer. Re-derived in TF2
# from the reference: rotation head = SN linear
# 'discriminator_rotation/score_classify' on the flattened penultimate
# features (ssgan.py:80-102); S3GAN adds the predictor head, the
# imputed-label blend gated by is_label_available, and the SN
# glorot-init projection embedding (s3gan.py:96-172).
# ---------------------------------------------------------------------------


def test_ssgan_rotation_head_forward_oracle():
    from compare_gan_tpu import datasets
    from compare_gan_tpu.gans.ssgan import SSGAN

    datasets.set_fake_dataset(True)
    try:
        gin.parse_config("D.spectral_norm = True")
        ds = datasets.get_dataset("cifar10")
        gan = SSGAN(dataset=ds, model_dir="/tmp/ssgan_oracle",
                    parameters={"architecture": "sndcgan_arch",
                                "z_dim": 128, "lambda": 1,
                                "disc_iters": 1},
                    self_supervision="rotation_gan", rotated_batch_size=8)

        def head_fn(x_):
            return gan.discriminator_with_rotation_head(
                x_, None, is_training=False)

        x = np.random.default_rng(11).random((4, 32, 32, 3)) \
            .astype(np.float32)
        vars_, params, state = _init_and_randomize(head_fn, x, seed=11)
        (probs, logits, rot), _ = core.apply(head_fn, params, state, x)

        want_logit, flat = tf_sndcgan_d(vars_, tf.constant(x),
                                        return_features=True)
        want_rot = _linear(vars_, "discriminator_rotation/score_classify",
                           flat, use_sn=True)
        assert rot.shape == (4, 4)
        np.testing.assert_allclose(np.asarray(logits), want_logit.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rot), want_rot.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(probs),
            1.0 / (1.0 + np.exp(-want_logit.numpy())),
            rtol=1e-4, atol=1e-5)
    finally:
        datasets.set_fake_dataset(False)


@pytest.mark.parametrize("use_soft_pred", [True, False])
def test_s3gan_additional_heads_forward_oracle(use_soft_pred):
    """Predictor + projection + rotation heads with a PARTIALLY-labeled
    batch (two all-zero label rows): the projection must consume the
    predictor-imputed labels exactly where is_label_available is 0
    (reference s3gan.py:118-146)."""
    from compare_gan_tpu import datasets
    from compare_gan_tpu.gans.s3gan import S3GAN

    datasets.set_fake_dataset(True)
    try:
        gin.parse_config("D.spectral_norm = True")
        ds = datasets.get_dataset("cifar10")
        gan = S3GAN(dataset=ds, model_dir="/tmp/s3gan_oracle",
                    parameters={"architecture": "sndcgan_arch",
                                "z_dim": 128, "lambda": 1,
                                "disc_iters": 1},
                    conditional=True, self_supervision="rotation",
                    rotated_batch_fraction=4, project_y=True,
                    use_predictor=True, use_soft_pred=use_soft_pred)

        rng = np.random.default_rng(12)
        x = rng.random((4, 32, 32, 3)).astype(np.float32)
        y = np.zeros((4, 10), np.float32)
        y[0, 3] = 1.0
        y[2, 7] = 1.0  # Rows 1 and 3 carry NO label (the -1 contract).

        def head_fn(x_, y_):
            return gan.discriminator_with_additonal_heads(
                x_, y_, is_training=False)

        vars_, params, state = _init_and_randomize(head_fn, x, y, seed=12)
        (probs, logits, rot, aux, avail), _ = core.apply(
            head_fn, params, state, x, y)

        base_logit, flat = tf_sndcgan_d(vars_, tf.constant(x),
                                        return_features=True)
        want_rot = _linear(vars_, "discriminator_rotation/score_classify",
                           flat, use_sn=True)
        want_aux = _linear(
            vars_, "discriminator_predictor/predictor_linear", flat,
            use_sn=True)
        want_avail = tf.cast(
            tf.reduce_sum(y, axis=1, keepdims=True) > 0.5, tf.float32)
        if use_soft_pred:
            y_pred = tf.nn.softmax(want_aux)
        else:
            y_pred = tf.one_hot(tf.argmax(want_aux, 1), 10)
        y_merged = (1.0 - want_avail) * y_pred + want_avail * y
        k = tf.constant(vars_["discriminator_projection/kernel"])
        k = k / _sn_sigma(k, tf.constant(
            vars_["discriminator_projection/kernel/u_var"]))
        want_logit = base_logit + tf.reduce_sum(
            tf.matmul(y_merged, k) * flat, axis=1, keepdims=True)

        np.testing.assert_allclose(np.asarray(avail), want_avail.numpy())
        np.testing.assert_allclose(np.asarray(aux), want_aux.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rot), want_rot.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(logits), want_logit.numpy(),
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(probs),
            1.0 / (1.0 + np.exp(-want_logit.numpy())),
            rtol=1e-4, atol=1e-5)
    finally:
        datasets.set_fake_dataset(False)
