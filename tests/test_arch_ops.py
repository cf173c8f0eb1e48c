"""Tests for the op library — ports of the reference's arch_ops tests
(architectures/arch_ops_test.py, arch_ops_tpu_test.py) plus SN/BN state
semantics specific to the explicit-state design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core
from compare_gan_tpu import ops
from compare_gan_tpu.architectures import resnet_ops


class TestLayers:
    def test_linear_names_and_shape(self):
        def net(x):
            return ops.linear(x, 16, scope="fc")
        out, params, state = core.init(net, jax.random.PRNGKey(0),
                                       jnp.ones((2, 8)))
        assert out.shape == (2, 16)
        assert set(params) == {"fc/kernel", "fc/bias"}
        assert params["fc/kernel"].shape == (8, 16)

    def test_conv2d_shape(self):
        def net(x):
            return ops.conv2d(x, 32, 3, 3, 2, 2, name="c")
        out, params, _ = core.init(net, jax.random.PRNGKey(0),
                                   jnp.ones((2, 16, 16, 3)))
        assert out.shape == (2, 8, 8, 32)
        assert params["c/kernel"].shape == (3, 3, 3, 32)

    def test_deconv2d_shape(self):
        def net(x):
            return ops.deconv2d(x, [2, 8, 8, 16], 4, 4, 2, 2, name="d")
        out, params, _ = core.init(net, jax.random.PRNGKey(0),
                                   jnp.ones((2, 4, 4, 3)))
        assert out.shape == (2, 8, 8, 16)
        assert params["d/kernel"].shape == (4, 4, 16, 3)

    @pytest.mark.parametrize("k,s", [(5, 2), (4, 2), (3, 1)])
    def test_conv2d_matches_tf_same_padding(self, k, s):
        """lax SAME == tf.nn.conv2d SAME bit-exactly, incl. the
        asymmetric padding of even/strided kernels (every D uses strided
        SAME convs — reference arch_ops.py:559-574)."""
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(0)
        x = rng.randn(2, 7, 7, 3).astype(np.float32)

        def net(x_):
            return ops.conv2d(x_, 4, k, k, s, s, name="c", use_bias=False)

        _, params, state = core.init(net, jax.random.PRNGKey(0), x)
        params = dict(params)
        params["c/kernel"] = rng.randn(k, k, 3, 4).astype(np.float32)
        got, _ = core.apply(net, params, state, x)
        want = tf.nn.conv2d(x, params["c/kernel"], strides=[1, s, s, 1],
                            padding="SAME").numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-6)

    def test_unpool_matches_reference_tf_sequence(self):
        """Zero-interleaved upsample == the reference's TF concat/reshape
        trick (resnet_ops.py:35-56), bit-exact."""
        tf = pytest.importorskip("tensorflow")
        x = np.random.RandomState(0).randn(2, 3, 5, 4).astype(np.float32)

        sh = list(x.shape)
        out = tf.reshape(x, [-1] + sh[-2:])
        for i in range(2, 0, -1):
            out = tf.concat([out, tf.zeros_like(out)], i)
        want = tf.reshape(out, [-1, sh[1] * 2, sh[2] * 2, sh[3]]).numpy()
        got = np.asarray(resnet_ops.unpool(jnp.asarray(x)))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("k,s,size,out_size", [
        (4, 2, 5, 10), (5, 2, 5, 10), (3, 1, 5, 5),
        # Odd/ceil-div output_shape preimages (tf.nn.conv2d_transpose
        # honors any out with ceil(out/s) == in): the 28 px DCGAN
        # schedule 4->7 and 14->28 (reference dcgan.py:55-76).
        (5, 2, 4, 7), (5, 2, 14, 28), (4, 2, 4, 7), (3, 2, 5, 9),
    ])
    def test_deconv2d_matches_tf_conv2d_transpose(self, k, s, size,
                                                  out_size):
        """deconv2d must reproduce tf.nn.conv2d_transpose exactly for the
        reference's (k, k, C_out, C_in) kernel layout — spatial flip, I/O
        swap, and SAME pad alignment (reference arch_ops.py:579-592)."""
        tf = pytest.importorskip("tensorflow")
        rng = np.random.RandomState(0)
        x = rng.randn(2, size, size, 3).astype(np.float32)
        out_shape = [2, out_size, out_size, 6]

        def net(x_):
            return ops.deconv2d(x_, out_shape, k, k, s, s, name="d")

        _, params, state = core.init(net, jax.random.PRNGKey(0), x)
        params = dict(params)
        params["d/kernel"] = rng.randn(k, k, 6, 3).astype(np.float32)
        params["d/bias"] = np.zeros(6, np.float32)
        got, _ = core.apply(net, params, state, x)
        want = tf.nn.conv2d_transpose(
            x, params["d/kernel"], output_shape=out_shape,
            strides=[1, s, s, 1], padding="SAME").numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-5)

    def test_weight_initializer_gin(self):
        gin.parse_config("weights.initializer = 'orthogonal'")

        def net(x):
            return ops.linear(x, 8, scope="fc", use_bias=False)
        _, params, _ = core.init(net, jax.random.PRNGKey(0),
                                 jnp.ones((2, 8)))
        w = np.asarray(params["fc/kernel"])
        np.testing.assert_allclose(w.T @ w, np.eye(8), atol=1e-5)

    def test_lrelu(self):
        x = jnp.array([-1.0, 2.0])
        np.testing.assert_allclose(ops.lrelu(x), [-0.2, 2.0])

    def test_weight_norm_layers_build(self):
        def net(x):
            h = ops.weight_norm_linear(x.reshape(2, -1), 8, init=True)
            return h
        out, params, _ = core.init(net, jax.random.PRNGKey(0),
                                   jnp.ones((2, 4, 4, 3)))
        assert out.shape == (2, 8)
        assert {"wn_linear/V", "wn_linear/g", "wn_linear/b"} <= set(params)


class TestSpectralNorm:
    def _net(self, x):
        return ops.linear(x, 8, scope="fc", use_sn=True, use_bias=False)

    def test_u_var_created(self):
        _, params, state = core.init(self._net, jax.random.PRNGKey(0),
                                     jnp.ones((2, 16)))
        # left singular vector for (16, 8) matrix => u shape (16, 1)
        assert set(state) == {"fc/kernel/u_var"}
        assert state["fc/kernel/u_var"].shape == (16, 1)

    def test_power_iteration_converges_to_sigma(self):
        # After many committed forwards, ||W|| of the normalized kernel -> 1.
        x = jnp.ones((2, 16))
        _, params, state = core.init(self._net, jax.random.PRNGKey(0), x)
        for _ in range(50):
            _, state = core.apply(self._net, params, state, x)

        def normalized_kernel(params, state):
            def f():
                with core.scope("fc"):
                    return ops.spectral_norm(core.param(
                        "kernel", (16, 8), lambda k, s, d: jnp.zeros(s, d)))
            return core.apply(f, params, state)[0]

        w_sn = normalized_kernel(params, state)
        sigma = np.linalg.svd(np.asarray(w_sn), compute_uv=False)[0]
        np.testing.assert_allclose(sigma, 1.0, rtol=1e-4)

    def test_uncommitted_forward_leaves_state(self):
        x = jnp.ones((2, 16))
        _, params, state = core.init(self._net, jax.random.PRNGKey(0), x)
        _, new_state = core.apply(self._net, params, state, x)
        # Caller may discard new_state: original is untouched.
        np.testing.assert_array_equal(state["fc/kernel/u_var"],
                                      state["fc/kernel/u_var"])
        assert not np.allclose(new_state["fc/kernel/u_var"],
                               state["fc/kernel/u_var"])

    def test_singular_value_right(self):
        def net(x):
            with core.scope("fc"):
                w = core.param("kernel", (4, 32),
                               lambda k, s, d: jax.random.normal(k, s, d))
                return ops.spectral_norm(w, singular_value="right")
        _, _, state = core.init(net, jax.random.PRNGKey(0), jnp.ones((1, 4)))
        assert state["fc/kernel/u_var"].shape == (1, 32)

    def test_gradient_flows_through_sigma(self):
        x = jnp.ones((2, 16))
        _, params, state = core.init(self._net, jax.random.PRNGKey(0), x)

        def loss(p):
            out, _ = core.apply(self._net, p, state, x)
            return jnp.sum(out)
        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g["fc/kernel"])).all()
        assert np.abs(np.asarray(g["fc/kernel"])).sum() > 0

    @pytest.mark.parametrize("singular_value", ["left", "right"])
    def test_two_read_sigma_matches_three_matmul_reference(
            self, singular_value):
        """The HBM-optimized sigma (u'.t, reusing t = W v) must equal the
        reference's explicit third matmul u'^T W v (arch_ops.py:516-521) in
        value, gradient, AND the persisted u update."""
        key = jax.random.PRNGKey(7)
        w0 = jax.random.normal(key, (24, 10))
        u0 = jax.random.normal(jax.random.PRNGKey(8),
                               (24, 1) if singular_value == "left" else (1, 10))

        def sigma_repo(w):
            def f():
                with core.scope("fc"):
                    return ops.spectral_norm_sigma(
                        core.param("kernel", w.shape,
                                   lambda k, s, d: jnp.zeros(s, d)),
                        singular_value=singular_value)
            out, new_state = core.apply(f, {"fc/kernel": w},
                                        {"fc/kernel/u_var": u0})
            return out, new_state["fc/kernel/u_var"]

        def sigma_ref(w):
            # Reference formulation: one power iteration + explicit
            # sigma = u'^T W v (left) / v W u'^T (right).
            def l2n(v):
                return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v), 1e-12))
            if singular_value == "left":
                v = jax.lax.stop_gradient(l2n(w.T @ u0))
                u = jax.lax.stop_gradient(l2n(w @ v))
                return (u.T @ w @ v)[0, 0], u
            v = jax.lax.stop_gradient(l2n(u0 @ w.T))
            u = jax.lax.stop_gradient(l2n(v @ w))
            return (v @ w @ u.T)[0, 0], u

        (s_repo, u_repo) = sigma_repo(w0)
        (s_ref, u_ref) = sigma_ref(w0)
        np.testing.assert_allclose(np.asarray(s_repo), np.asarray(s_ref),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u_repo), np.asarray(u_ref),
                                   rtol=1e-6)
        g_repo = jax.grad(lambda w: sigma_repo(w)[0])(w0)
        g_ref = jax.grad(lambda w: sigma_ref(w)[0])(w0)
        np.testing.assert_allclose(np.asarray(g_repo), np.asarray(g_ref),
                                   rtol=1e-6, atol=1e-7)

    def test_bf16_power_iteration_sigma_accuracy(self):
        """compute_dtype=bfloat16 (the TPU training path) must track the
        f32 sigma to ~1e-3 relative after convergence: sigma is a Rayleigh
        quotient, so iterate rounding perturbs it only at second order."""
        w = jax.random.normal(jax.random.PRNGKey(3), (9 * 64, 128)) * 0.1

        def run(compute_dtype, steps=100):
            def f():
                with core.scope("fc"):
                    return ops.spectral_norm_sigma(
                        core.param("kernel", w.shape,
                                   lambda k, s, d: jnp.zeros(s, d)),
                        compute_dtype=compute_dtype)
            params = {"fc/kernel": w}
            _, _, state = core.init(f, jax.random.PRNGKey(0))
            for _ in range(steps):
                sigma, state = core.apply(f, params, state)
            return float(sigma)

        s_f32 = run(None)
        s_bf16 = run(jnp.bfloat16)
        s_svd = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
        # Both estimates share the iteration's convergence error; the bf16
        # rounding itself must stay at the 1e-3 level relative to f32.
        assert abs(s_bf16 - s_f32) / s_f32 < 2e-3, (s_bf16, s_f32)
        # And both remain sane sigma estimates.
        assert abs(s_bf16 - s_svd) / s_svd < 5e-2, (s_bf16, s_svd)


class TestBatchNorms:
    def test_standardize_batch_normalizes(self):
        def net(x):
            with core.scope("bn"):
                return ops.standardize_batch(x, is_training=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 4, 8)) * 3 + 5
        out, _, state = core.init(net, jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(np.asarray(out).mean((0, 1, 2)),
                                   np.zeros(8), atol=1e-2)
        np.testing.assert_allclose(np.asarray(out).std((0, 1, 2)),
                                   np.ones(8), atol=5e-2)
        assert set(state) == {"bn/moving_mean", "bn/moving_variance"}

    def test_moving_averages_updated_in_training(self):
        def net(x, is_training):
            with core.scope("bn"):
                return ops.standardize_batch(x, is_training=is_training)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 4, 8)) + 2.0
        _, _, state = core.init(net, jax.random.PRNGKey(0), x, True)
        assert np.allclose(state["bn/moving_mean"], 0)
        _, state = core.apply(net, {}, state, x, True)
        # decay=0.999 => mean moves by (1-decay) * batch_mean
        assert np.all(np.asarray(state["bn/moving_mean"]) > 0)
        # Inference uses moving stats, doesn't update them.
        _, state2 = core.apply(net, {}, state, x, False)
        np.testing.assert_array_equal(state["bn/moving_mean"],
                                      state2["bn/moving_mean"])

    def test_accumulator_protocol(self):
        """The BN-accumulator eval protocol (arch_ops.py:122-191,
        eval_gan_lib.py:65-92): accumulate while update_accus == 1."""
        def net(x, is_training):
            with core.scope("bn"):
                return ops.standardize_batch(x, is_training=is_training,
                                             use_moving_averages=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 4, 4, 8)) + 3.0
        _, _, state = core.init(net, jax.random.PRNGKey(0), x, True)
        assert state["bn/accu/update_accus"].dtype == jnp.int32
        # Switch accumulation on; run inference-mode forwards.
        state["bn/accu/update_accus"] = jnp.ones((), jnp.int32)
        for _ in range(4):
            _, state = core.apply(net, {}, state, x, False)
        assert np.asarray(state["bn/accu/accu_counter"]) == 4.0
        # Freeze and verify the accumulated mean matches the batch mean.
        state["bn/accu/update_accus"] = jnp.zeros((), jnp.int32)
        out, state2 = core.apply(net, {}, state, x, False)
        assert np.asarray(state2["bn/accu/accu_counter"]) == 4.0
        accu_mean = np.asarray(state["bn/accu/accu_mean"]) / 4.0
        np.testing.assert_allclose(accu_mean,
                                   np.asarray(x).mean((0, 1, 2)), rtol=1e-4)

    def test_batch_norm_gamma_beta(self):
        def net(x):
            return ops.batch_norm(x, is_training=True, name="bn")
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 8))
        _, params, state = core.init(net, jax.random.PRNGKey(0), x)
        assert set(params) == {"bn/gamma", "bn/beta"}
        assert set(state) == {"bn/moving_mean", "bn/moving_variance"}

    def test_conditional_batch_norm_names(self):
        def net(x, y):
            return ops.conditional_batch_norm(x, y, is_training=True,
                                              use_sn=False, name="bn")
        x = jnp.ones((8, 4, 4, 16))
        y = jax.nn.one_hot(jnp.arange(8) % 4, 4)
        _, params, _ = core.init(net, jax.random.PRNGKey(0), x, y)
        assert set(params) == {"bn/condition/gamma/kernel",
                               "bn/condition/beta/kernel"}

    def test_self_modulated_batch_norm_names(self):
        def net(x, z):
            return ops.self_modulated_batch_norm(
                x, z, is_training=True, use_sn=False, name="bn")
        x = jnp.ones((8, 4, 4, 16))
        z = jnp.ones((8, 12))
        _, params, _ = core.init(net, jax.random.PRNGKey(0), x, z)
        assert set(params) == {
            "bn/sbn/hidden/kernel", "bn/sbn/hidden/bias",
            "bn/sbn/gamma/kernel", "bn/sbn/gamma/bias",
            "bn/sbn/beta/kernel", "bn/sbn/beta/bias"}

    def test_rank2_inputs(self):
        def net(x):
            with core.scope("bn"):
                return ops.standardize_batch(x, is_training=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 10))
        out, _, _ = core.init(net, jax.random.PRNGKey(0), x)
        assert out.shape == (32, 10)

    def test_layer_norm(self):
        def net(x):
            return ops.layer_norm(x, is_training=True, scope="ln")
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 16)) * 2 + 1
        out, params, _ = core.init(net, jax.random.PRNGKey(0), x)
        assert set(params) == {"ln/gamma", "ln/beta"}
        np.testing.assert_allclose(
            np.asarray(out).mean((1, 2, 3)), np.zeros(4), atol=1e-4)

    def test_group_bn(self):
        def net(x):
            with core.scope("bn"):
                return ops.standardize_batch(x, is_training=True,
                                             num_batch_groups=4)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 4, 4, 8))
        out, _, _ = core.init(net, jax.random.PRNGKey(0), x)
        out = np.asarray(out)
        # Each group of 8 is normalized independently.
        for g in range(4):
            grp = out[g * 8:(g + 1) * 8]
            np.testing.assert_allclose(grp.mean((0, 1, 2)), np.zeros(8),
                                       atol=1e-2)


class TestNonLocalBlock:
    def test_shapes_and_params(self):
        def net(x):
            return ops.non_local_block(x, name="attn", use_sn=True)
        x = jnp.ones((2, 8, 8, 64))
        out, params, state = core.init(net, jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert "attn/sigma" in params
        assert params["attn/conv2d_theta/kernel"].shape == (1, 1, 64, 8)
        assert params["attn/conv2d_g/kernel"].shape == (1, 1, 64, 32)
        assert params["attn/conv2d_attn_g/kernel"].shape == (1, 1, 32, 64)
        # SN state for each of the 4 convs
        assert sum("u_var" in k for k in state) == 4

    def test_sigma_zero_at_init_is_identity(self):
        def net(x):
            return ops.non_local_block(x, name="attn", use_sn=False)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
        out, params, state = core.init(net, jax.random.PRNGKey(0), x)
        out2, _ = core.apply(net, params, state, x)
        np.testing.assert_allclose(np.asarray(out2), np.asarray(x), atol=1e-6)


class TestResnetOps:
    def test_unpool_exact_placement(self):
        x = jnp.arange(1 * 2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 3)
        out = resnet_ops.unpool(x)
        assert out.shape == (1, 4, 4, 3)
        out = np.asarray(out)
        np.testing.assert_array_equal(out[0, ::2, ::2], np.asarray(x)[0])
        assert out[0, 1::2].sum() == 0 and out[0, :, 1::2].sum() == 0

    def test_avg_pool(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        out = resnet_ops.avg_pool_2x2(x)
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0],
                                   [[2.5, 4.5], [10.5, 12.5]])

    def test_resnet_block_g_and_d(self):
        from compare_gan_tpu.ops import arch_ops

        def g_net(x, z):
            block = resnet_ops.ResNetBlock(
                "B1", in_channels=8, out_channels=16, scale="up",
                is_gen_block=True, spectral_norm=True,
                batch_norm=lambda x, z, y, is_training, name:
                    arch_ops.batch_norm(x, is_training=is_training,
                                        name=name))
            return block(x, z=z, y=None, is_training=True)

        x = jnp.ones((2, 4, 4, 8))
        out, params, _ = core.init(g_net, jax.random.PRNGKey(0), x,
                                   jnp.ones((2, 3)))
        assert out.shape == (2, 8, 8, 16)
        # G: upscale in conv1 (SN-paper layout, resnet_ops.py:103-106)
        assert "B1/up_conv1/kernel" in params
        assert "B1/same_conv2/kernel" in params
        assert "B1/up_conv_shortcut/kernel" in params

        def d_net(x):
            block = resnet_ops.ResNetBlock(
                "B1", in_channels=8, out_channels=16, scale="down",
                is_gen_block=False, spectral_norm=True,
                batch_norm=lambda x, z, y, is_training, name: x)
            return block(x, z=None, y=None, is_training=True)
        out, params, _ = core.init(d_net, jax.random.PRNGKey(0), x)
        assert out.shape == (2, 2, 2, 16)
        # D: downscale in conv2
        assert "B1/same_conv1/kernel" in params
        assert "B1/down_conv2/kernel" in params


class TestEvoNormS0:
    def test_matches_numpy_oracle(self):
        """EvoNorm-S0 (Liu et al. 2020): y = x*sigmoid(v*x)/group_std(x)
        * gamma + beta, groups of channels, batch-independent."""
        x = np.random.RandomState(0).randn(2, 4, 4, 64).astype(np.float32)

        def net(x_):
            return ops.evonorm_s0(x_, name="ev")

        out, params, state = core.init(net, jax.random.PRNGKey(0), x)
        assert set(params) == {"ev/gamma", "ev/beta", "ev/v"}
        assert state == {}
        # Oracle with init params (gamma=v=1, beta=0), groups=min(32, 64).
        xg = x.reshape(2, 4, 4, 32, 2)
        std = np.sqrt(xg.var(axis=(1, 2, 4), keepdims=True) + 1e-5)
        std = np.broadcast_to(std, xg.shape).reshape(x.shape)
        expected = x * (1.0 / (1.0 + np.exp(-x))) / std
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                                   atol=1e-6)

    def test_batch_independent(self):
        """Per-sample normalization: example 0's output must not depend on
        example 1 (this is what makes it collective-free under DP)."""
        x = np.random.RandomState(1).randn(2, 4, 4, 8).astype(np.float32)

        def net(x_):
            return ops.evonorm_s0(x_, name="ev")

        out2, params, _ = core.init(net, jax.random.PRNGKey(0), x)
        out1, _ = core.apply(net, params, {}, x[:1])
        np.testing.assert_allclose(np.asarray(out2)[:1], np.asarray(out1),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_gin_hook_trains_modular_gan(self):
        """`G.batch_norm_fn = @evonorm_s0` wires through the architecture
        batch_norm dispatch; one ModularGAN step stays finite."""
        from compare_gan_tpu import datasets
        from compare_gan_tpu.gans.modular_gan import ModularGAN
        gin.parse_config("G.batch_norm_fn = @evonorm_s0")
        datasets.set_fake_dataset(True)
        gan = ModularGAN(
            dataset=datasets.get_dataset("cifar10"),
            model_dir="/tmp/evonorm_test",
            parameters={"architecture": "resnet_cifar_arch", "z_dim": 8,
                        "lambda": 1, "disc_iters": 1})
        ts = gan.init_state(jax.random.PRNGKey(0), 4)
        # evonorm's learned `v` gate is unique to it among the norms.
        assert any(k.endswith("/v") for k in ts.params), \
            sorted(ts.params)[:40]
        step = jax.jit(gan.make_train_step(4))
        rng = np.random.RandomState(0)
        total = 4 * gan.num_sub_steps
        batch = {"images": rng.rand(total, 32, 32, 3).astype(np.float32),
                 "labels": rng.randint(0, 10, total).astype(np.int32)}
        _, metrics = step(ts, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        gin.clear_config()
        datasets.set_fake_dataset(False)
