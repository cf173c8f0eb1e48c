"""TPU microbenchmark: up-conv strategies + SN read cost.

Times, per BigGAN-128 G/D layer shape, the candidate lowerings of the
scale-convs to decide which one bench.py's recipe should use:

  a) unpool+conv   — materialize the 2x zero-stuffed tensor, 3x3 SAME conv.
  b) lhs_dilation  — fused dilated conv (current up_conv2d).
  c) phase_d2s     — 2x2 conv producing 4*C_out phase channels on the LOW
                     resolution grid, then depth-to-space. Denser MXU
                     shapes (contraction 4*C_in, output 4*C_out) at the
                     cost of 16/9 of the minimal MAC count.

Also times the spectral-norm power iteration (2-read vs 3-read) on the
largest BigGAN kernel. Prints one JSON line per measurement.

Run ON TPU (the axon tunnel): python tools/microbench_conv.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def timed(fn, *args, iters=30):
    """Time per iteration of fn chained serially inside ONE jit.

    The axon tunnel adds ~30 ms of fixed dispatch+fetch overhead per
    program execution, so a single chained run overstates small ops by
    ~30/iters ms. Run the SAME program at two trip counts (n and 4n,
    fori_loop with a traced bound) and difference: the constant cancels.
    """

    def body(i, carry):
        c, out = carry
        res = fn(*[a + c.astype(a.dtype) if a.dtype != jnp.int32 else a
                   for a in args])
        tap = res.reshape(-1)[0].astype(jnp.float32)
        # 1e-38 keeps the serial data dependency without XLA folding it
        # away (x*0 is simplifiable; a denormal scale is not).
        return tap * 1e-38, res

    @jax.jit
    def run(n):
        first = fn(*args)
        _, out = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), first))
        return out.reshape(-1)[0]

    def wall(n):
        t0 = time.perf_counter()
        float(run(n))
        return time.perf_counter() - t0

    float(run(iters))  # warmup/compile
    t1 = min(wall(iters) for _ in range(2))
    t4 = min(wall(4 * iters) for _ in range(2))
    return max(t4 - t1, 1e-9) / (3 * iters)


def upconv_variants(b, h, c_in, c_out, dtype=jnp.bfloat16):
    k = 3
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, h, c_in), dtype)
    w = jax.random.normal(key, (k, k, c_in, c_out), jnp.float32)

    def unpool_conv(x, w):
        bsz, hh, ww, c = x.shape
        y = jnp.pad(x[:, :, None, :, None, :],
                    ((0, 0), (0, 0), (0, 1), (0, 0), (0, 1), (0, 0)))
        y = y.reshape(bsz, hh * 2, ww * 2, c)
        return jax.lax.conv_general_dilated(
            y, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def lhs_dil(x, w):
        pl = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            padding=((pl, k - 1 - pl + 1), (pl, k - 1 - pl + 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def phase_d2s(x, w):
        # W_all[s,t,ci,(p*2+q)*C+co]: output phase (p,q) reads x[i+s,j+t].
        # Tap (kr,kc) of the 3x3 kernel lands at phase ((kr+1)%2,(kc+1)%2)
        # and x offset (kr//2, kc//2). Built by concat (one fused pass).
        z = jnp.zeros_like(w[0, 0])
        wa = jnp.stack([
            jnp.stack([
                jnp.concatenate([w[1, 1], w[1, 0], w[0, 1], w[0, 0]], -1),
                jnp.concatenate([z, w[1, 2], z, w[0, 2]], -1),
            ]),
            jnp.stack([
                jnp.concatenate([z, z, w[2, 1], w[2, 0]], -1),
                jnp.concatenate([z, z, z, w[2, 2]], -1),
            ]),
        ])
        out4 = jax.lax.conv_general_dilated(
            x, wa.astype(x.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bsz, hh, ww, _ = out4.shape
        co = w.shape[3]
        out = out4.reshape(bsz, hh, ww, 2, 2, co)
        out = out.transpose(0, 1, 3, 2, 4, 5)
        return out.reshape(bsz, hh * 2, ww * 2, co)

    # Correctness cross-check (small dtype noise allowed in bf16).
    r_ref = np.asarray(unpool_conv(x, w), np.float32)
    for name, f in [("lhs_dil", lhs_dil), ("phase_d2s", phase_d2s)]:
        r = np.asarray(f(x, w), np.float32)
        err = np.abs(r - r_ref).max() / (np.abs(r_ref).max() + 1e-6)
        assert err < 2e-2, (name, err)

    macs = 9 * c_in * c_out * (2 * h) * (2 * h) / 4 * b  # zero-skipping MACs
    out = {}
    for name, f in [("unpool_conv", unpool_conv), ("lhs_dil", lhs_dil),
                    ("phase_d2s", phase_d2s)]:
        # fwd only
        t_f = timed(f, x, w)
        # fwd+bwd
        def loss(x, w, f=f):
            return jnp.sum(f(x, w).astype(jnp.float32))
        g = jax.grad(loss, argnums=(0, 1))
        t_fb = timed(lambda x, w, g=g: g(x, w)[1], x, w)
        out[name] = (t_f, t_fb)
        print(json.dumps({
            "bench": "upconv", "variant": name,
            "shape": [b, h, c_in, c_out],
            "fwd_ms": round(t_f * 1e3, 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3),
            "fwd_tflops_useful": round(2 * macs / t_f / 1e12, 2),
        }), flush=True)
    return out


def plain_conv(b, h, c_in, c_out, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, h, c_in), dtype)
    w = jax.random.normal(key, (3, 3, c_in, c_out), dtype)

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timed(f, x, w)
    macs = 9 * c_in * c_out * h * h * b
    print(json.dumps({
        "bench": "conv3x3", "shape": [b, h, c_in, c_out],
        "fwd_ms": round(t * 1e3, 3),
        "tflops": round(2 * macs / t / 1e12, 2),
    }), flush=True)


def sn_variants():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 1536, 1536), jnp.float32)
    u0 = jax.random.normal(key, (3 * 3 * 1536, 1))
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def l2n(v):
        return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v), 1e-12))

    def three_read(w, u):
        wm = w.reshape(-1, w.shape[-1])
        v = l2n(mm(wm.T, u))
        u2 = l2n(mm(wm, v))
        return mm(mm(u2.T, wm), v).reshape(())

    def two_read(w, u):
        wm = w.reshape(-1, w.shape[-1])
        v = l2n(mm(wm.T, u))
        t = mm(wm, v)
        u2 = l2n(t)
        return jnp.sum(t * u2)

    for name, f in [("three_read", three_read), ("two_read", two_read)]:
        t = timed(f, w, u0, iters=50)
        print(json.dumps({"bench": "sn", "variant": name,
                          "ms": round(t * 1e3, 3)}), flush=True)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    # BigGAN-128 G up-conv layer shapes (joint fwd batch 32; ch=96 recipe).
    shapes = [(32, 4, 1536, 1536), (32, 8, 1536, 768), (32, 16, 768, 384),
              (32, 32, 384, 192), (32, 64, 192, 96)]
    for s in shapes:
        upconv_variants(*s)
    # Plain conv util reference at the conv2 shapes (post-upsample res).
    for b, h, ci, co in shapes:
        plain_conv(b, 2 * h, co, co)
    sn_variants()


if __name__ == "__main__":
    main()
