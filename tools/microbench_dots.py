"""TPU microbenchmark: can shifted-GEMM conv beat XLA's conv lowering?

microbench_conv.py showed jax.lax.conv_general_dilated reaching only
~60 TFLOPs (~32% of v5e bf16 peak) at BigGAN-128 layer shapes. This
measures (a) raw dot_general throughput at the equivalent GEMM shapes and
(b) a conv3x3 built as 9 shifted [BHW, Cin] x [Cin, Cout] dots with f32
accumulation, fwd and fwd+bwd, against the native conv.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from tools.microbench_conv import timed  # noqa: E402


def bench_dot(rows, k, n, dtype=jnp.bfloat16):
    a = jax.random.normal(jax.random.PRNGKey(0), (rows, k), dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), dtype)

    def f(a, b):
        return jnp.dot(a, b)

    t = timed(f, a, b, iters=50)
    print(json.dumps({"bench": "dot", "shape": [rows, k, n],
                      "ms": round(t * 1e3, 3),
                      "tflops": round(2 * rows * k * n / t / 1e12, 2)}),
          flush=True)


def conv3x3_dots(x, w):
    """3x3 SAME conv as 9 shifted GEMMs, f32 accumulation."""
    b, h, ww, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, ww, co), jnp.float32)
    for kr in range(3):
        for kc in range(3):
            tap = jax.lax.dynamic_slice(xp, (0, kr, kc, 0), (b, h, ww, ci))
            acc = acc + jnp.dot(tap.reshape(-1, ci), w[kr, kc],
                                preferred_element_type=jnp.float32
                                ).reshape(b, h, ww, co)
    return acc.astype(x.dtype)


def conv3x3_native(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench_conv_pair(b, h, ci, co, dtype=jnp.bfloat16):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, ci), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co), dtype)

    r_ref = np.asarray(conv3x3_native(x, w), np.float32)
    r_dots = np.asarray(conv3x3_dots(x, w), np.float32)
    err = np.abs(r_ref - r_dots).max() / (np.abs(r_ref).max() + 1e-6)
    assert err < 2e-2, err

    macs = 9 * ci * co * h * h * b
    for name, f in [("native", conv3x3_native), ("dots", conv3x3_dots)]:
        t_f = timed(f, x, w, iters=30)

        def loss(x, w, f=f):
            return jnp.sum(f(x, w).astype(jnp.float32))
        # Force BOTH dx and dw to be computed (sum taps them together).
        g = jax.grad(loss, argnums=(0, 1))

        def both(x, w, g=g):
            dx, dw = g(x, w)
            return dx.reshape(-1)[:1] + dw.reshape(-1)[:1]
        t_fb = timed(both, x, w, iters=15)
        print(json.dumps({
            "bench": "conv3x3_pair", "variant": name,
            "shape": [b, h, ci, co],
            "fwd_ms": round(t_f * 1e3, 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3),
            "fwd_tflops": round(2 * macs / t_f / 1e12, 2),
        }), flush=True)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    # GEMM shapes equivalent to the BigGAN convs (rows = B*H*W).
    bench_dot(8192, 6912, 768)      # im2col GEMM of [32,16,768->768]
    bench_dot(8192, 768, 768)       # one shifted-tap dot at that layer
    bench_dot(32768, 384, 384)
    bench_dot(2048, 1536, 1536)
    for shape in [(32, 8, 1536, 1536), (32, 16, 768, 768),
                  (32, 32, 384, 384), (32, 64, 192, 192),
                  (32, 128, 96, 96)]:
        bench_conv_pair(*shape)


if __name__ == "__main__":
    main()
