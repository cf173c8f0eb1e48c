"""Tests for the functional core and the gin-style config system."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compare_gan_tpu import config as gin
from compare_gan_tpu import core


def _mlp(x):
    with core.scope("net"):
        w1 = core.param("l1/kernel", (x.shape[-1], 8),
                        lambda k, s, d: jax.random.normal(k, s, d))
        h = jnp.tanh(x @ w1)
        w2 = core.param("l2/kernel", (8, 1),
                        lambda k, s, d: jax.random.normal(k, s, d))
        counter = core.get_state("counter", (),
                                 lambda k, s, d: jnp.zeros(s, d))
        core.set_state("counter", counter + 1.0)
        return h @ w2


class TestCore:
    def test_init_creates_named_params(self):
        x = jnp.ones((4, 3))
        out, params, state = core.init(_mlp, jax.random.PRNGKey(0), x)
        assert set(params) == {"net/l1/kernel", "net/l2/kernel"}
        assert set(state) == {"net/counter"}
        assert out.shape == (4, 1)

    def test_apply_pure_and_state_threading(self):
        x = jnp.ones((4, 3))
        _, params, state = core.init(_mlp, jax.random.PRNGKey(0), x)
        assert state["net/counter"] == 0.0  # init keeps initial value
        out1, state1 = core.apply(_mlp, params, state, x)
        out2, state2 = core.apply(_mlp, params, state1, x)
        assert state1["net/counter"] == 1.0
        assert state2["net/counter"] == 2.0
        np.testing.assert_allclose(out1, out2)  # params unchanged => same out

    def test_apply_under_jit_and_grad(self):
        x = jnp.ones((4, 3))
        _, params, state = core.init(_mlp, jax.random.PRNGKey(0), x)

        @jax.jit
        def loss_fn(params, state, x):
            out, new_state = core.apply(_mlp, params, state, x)
            return jnp.mean(out ** 2), new_state

        grads = jax.grad(lambda p: loss_fn(p, state, x)[0])(params)
        assert set(grads) == set(params)
        assert np.isfinite(jax.tree.leaves(grads)[0]).all()

    def test_missing_param_error(self):
        x = jnp.ones((4, 3))
        _, params, state = core.init(_mlp, jax.random.PRNGKey(0), x)
        bad = {k: v for k, v in params.items() if "l2" not in k}
        with pytest.raises(KeyError, match="net/l2/kernel"):
            core.apply(_mlp, bad, state, x)

    def test_filter_prefix(self):
        tree = {"generator/a": 1, "generator/b": 2, "discriminator/a": 3}
        assert core.filter_prefix(tree, "generator") == {
            "generator/a": 1, "generator/b": 2}

    def test_deterministic_init(self):
        x = jnp.ones((2, 3))
        _, p1, _ = core.init(_mlp, jax.random.PRNGKey(7), x)
        _, p2, _ = core.init(_mlp, jax.random.PRNGKey(7), x)
        for k in p1:
            np.testing.assert_array_equal(p1[k], p2[k])


@gin.configurable("test_fn")
def _test_fn(a=1, b=2, c="x"):
    return a, b, c


@gin.configurable("other_fn")
def _other_fn(fn=None):
    return fn


class TestConfig:
    def test_bind_and_call(self):
        gin.parse_config("test_fn.a = 10\ntest_fn.c = 'hello'")
        assert _test_fn() == (10, 2, "hello")

    def test_explicit_overrides_binding(self):
        gin.parse_config("test_fn.a = 10")
        assert _test_fn(a=5) == (5, 2, "x")

    def test_reference(self):
        gin.parse_config("other_fn.fn = @test_fn")
        fn = _other_fn()
        assert fn() == (1, 2, "x")

    def test_evaluated_reference(self):
        gin.parse_config("test_fn.a = 42\nother_fn.fn = @test_fn()")
        assert _other_fn() == (42, 2, "x")

    def test_macro(self):
        gin.parse_config("lr = 0.001\ntest_fn.a = %lr")
        assert _test_fn()[0] == 0.001

    def test_bad_param_raises(self):
        gin.parse_config("test_fn.nonexistent = 3")
        with pytest.raises(gin.ConfigError):
            _test_fn()

    def test_complex_values(self):
        gin.parse_config(
            "test_fn.a = [1, 2, 3]\ntest_fn.b = (4, 'y')\n"
            "test_fn.c = {'k': 1e-4}")
        a, b, c = _test_fn()
        assert a == [1, 2, 3] and b == (4, "y") and c == {"k": 1e-4}

    def test_multiline_value(self):
        gin.parse_config("test_fn.a = [1,\n  2,\n  3]")
        assert _test_fn()[0] == [1, 2, 3]

    def test_comments_and_imports(self):
        gin.parse_config(
            "# comment\nimport compare_gan.gans\ntest_fn.a = 3  # inline")
        assert _test_fn()[0] == 3

    def test_operative_config_str(self):
        gin.parse_config("test_fn.a = 10")
        _test_fn()
        assert "test_fn.a = 10" in gin.operative_config_str()

    def test_query(self):
        gin.parse_config("test_fn.a = 10")
        assert gin.query("test_fn.a") == 10
        assert gin.query("test_fn.zz", default=3) == 3


def test_parse_string_literals_with_special_chars():
    """'#', '(' and '@' inside quoted values must not truncate the line,
    derail bracket continuation, or get token-substituted."""
    gin.parse_config('a = "run #1"')
    assert gin._MACROS["a"] == "run #1"
    gin.parse_config('b = "foo (bar"\nc = 3')
    assert gin._MACROS["b"] == "foo (bar" and gin._MACROS["c"] == 3
    gin.parse_config('d = ["x@y.com", %c]')
    assert gin._MACROS["d"][0] == "x@y.com"


def test_include_parses_base_config(tmp_path):
    (tmp_path / "base.gin").write_text("foo = 7\n")
    (tmp_path / "main.gin").write_text("include 'base.gin'\nbar = 8\n")
    gin.parse_config_files_and_bindings([str(tmp_path / "main.gin")])
    assert gin._MACROS["foo"] == 7 and gin._MACROS["bar"] == 8


def test_query_applies_scope_aliases():
    import compare_gan_tpu.gans.optimizers  # noqa: F401 (registers aliases)
    gin.parse_config("tf.train.AdamOptimizer.beta1 = 0.5")
    assert gin.query("tf.train.AdamOptimizer.beta1") == 0.5
    assert gin.query("AdamOptimizer.beta1") == 0.5


def test_keyword_only_binding_survives_positional_args():
    @gin.configurable("kwonly_fn_test")
    def f(a, *xs, opt=1):
        return opt
    gin.parse_config("kwonly_fn_test.opt = 5")
    assert f(1, 2, 3) == 5


def test_include_cycle_raises_config_error(tmp_path):
    """Self- and mutual-includes must raise ConfigError, not
    RecursionError (round-2 advisor); diamond includes stay legal."""
    (tmp_path / "self.gin").write_text("include 'self.gin'\n")
    with pytest.raises(gin.ConfigError, match="cycle"):
        gin.parse_config_files_and_bindings([str(tmp_path / "self.gin")])

    (tmp_path / "a.gin").write_text("include 'b.gin'\n")
    (tmp_path / "b.gin").write_text("include 'a.gin'\n")
    with pytest.raises(gin.ConfigError, match="cycle"):
        gin.parse_config_files_and_bindings([str(tmp_path / "a.gin")])

    # Diamond: main includes l and r, both include base — legal.
    (tmp_path / "base.gin").write_text("foo = 1\n")
    (tmp_path / "l.gin").write_text("include 'base.gin'\n")
    (tmp_path / "r.gin").write_text("include 'base.gin'\n")
    (tmp_path / "main.gin").write_text("include 'l.gin'\ninclude 'r.gin'\n")
    gin.parse_config_files_and_bindings([str(tmp_path / "main.gin")])
    assert gin._MACROS["foo"] == 1


def test_placeholder_shaped_string_content_survives_parsing():
    """A quoted value whose content looks like the parser's own string
    mask token must round-trip intact (round-2 advisor: sequential
    str.replace unmasking corrupted it)."""
    gin.parse_config('weird.vals = ["__str_0__", "__str_1__", @hinge]')
    vals = gin._BINDINGS["weird"]["vals"]
    assert vals[0] == "__str_0__" and vals[1] == "__str_1__"


def test_stray_placeholder_token_is_config_error():
    """An UNQUOTED placeholder-shaped token (typo / generated config with
    no string literals) must surface as ConfigError, not IndexError from
    the unmasker or NameError from eval (round-3 review)."""
    with pytest.raises(gin.ConfigError, match="placeholder"):
        gin.parse_config("x.y = __str_9__")


def test_stray_in_range_placeholder_token_is_config_error():
    """A stray token whose index IS in range of the masked strings must
    also raise — not silently substitute another value's string literal
    (round-3 review: ['__str_0__', 'real'] became ['real', 'real'])."""
    with pytest.raises(gin.ConfigError, match="placeholder"):
        gin.parse_config('x.y = [__str_0__, "real"]')


def test_config_scope_isolates_and_restores():
    gin.parse_config("scopetest.x = 1")
    with gin.config_scope("scopetest.y = 2"):
        # replace=True: clean slate + scoped text only.
        assert gin.query("scopetest.x", default=None) is None
        assert gin.query("scopetest.y") == 2
    assert gin.query("scopetest.x") == 1
    assert gin.query("scopetest.y", default=None) is None


def test_enable_persistent_compile_cache_no_clobber():
    """Entry points default the XLA compile cache on; an explicit prior
    jax.config setting must win (no silent clobber)."""
    import jax
    from compare_gan_tpu.utils import misc
    prior = jax.config.jax_compilation_cache_dir
    try:
        misc.enable_persistent_compile_cache("/tmp/cache_a")
        first = jax.config.jax_compilation_cache_dir
        misc.enable_persistent_compile_cache("/tmp/cache_b")
        assert jax.config.jax_compilation_cache_dir == first
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
