"""Pallas TPU kernel: fused attention for the SAGAN non-local block.

XLA executes `softmax(theta @ phi^T) @ g` as two matmuls with the [B, N, M]
attention matrix materialized to HBM between them (twice more for the
softmax normalizer). For the non-local block (arch_ops.py:709-758) at
BigGAN scale — N = h*w up to 16k, M = N/4 — that is hundreds of MB of HBM
traffic per forward. This kernel tiles over N and keeps each row-tile's
scores entirely in VMEM: one HBM read of theta/phi/g, one write of out.

Backward recomputes the attention per tile (flash-attention style) and
accumulates dphi/dg across row tiles inside the sequential TPU grid.

Numerics: scores and softmax in f32 regardless of input dtype; exact match
with the einsum reference path is covered by
tests/test_pallas_attention.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec

_INTERPRET = False  # Flipped by tests on the CPU backend.


# ---------------------------------------------------------------------------
# Partitioning: pallas_call is a custom call that GSPMD/Shardy cannot see
# into — without a rule, jit-over-mesh all-gathers the operands and runs
# the FULL global-batch attention replicated on every chip. Every operand
# and result carries the batch on dim 0 and the kernel is independent per
# example, so we declare batch-dim partitioning (everything else
# replicated) and lower to the same pallas call on the local shard.
# ---------------------------------------------------------------------------


def _batch_axis(arg_infos):
    """The mesh axis (or None) that shards dim 0 of the operands."""
    for info in arg_infos:
        sharding = getattr(info, "sharding", None)
        if sharding is not None and len(sharding.spec) and sharding.spec[0]:
            return sharding.spec[0]
    return None


def _batch_sharded(mesh, arg_infos, n):
    axis = _batch_axis(arg_infos)
    return tuple(NamedSharding(mesh, PartitionSpec(axis)) for _ in range(n))


def _def_batch_partition(fn, num_results, rule, need_replication,
                         **factor_sizes):
    cp = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        del result_infos
        shardings = _batch_sharded(mesh, arg_infos, num_results)
        return shardings if num_results > 1 else shardings[0]

    def partition(mesh, arg_infos, result_infos):
        res = _batch_sharded(mesh, arg_infos, num_results)
        args = _batch_sharded(mesh, arg_infos, len(arg_infos))
        return mesh, fn, (res if num_results > 1 else res[0]), args

    cp.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=need_replication,
                     **factor_sizes)
    return cp


def _row_tile(n):
    for tile in (512, 256, 128, 64, 32, 16, 8):
        if n % tile == 0:
            return tile
    return n


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(theta_ref, phi_ref, g_ref, out_ref, mx_ref, den_ref):
    theta = theta_ref[0].astype(jnp.float32)     # [TN, C]
    phi = phi_ref[0].astype(jnp.float32)         # [M, C]
    g = g_ref[0].astype(jnp.float32)             # [M, Cg]
    scores = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [TN, M]
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    den = jnp.sum(e, axis=-1, keepdims=True)
    # Normalize AFTER the PV matmul: divides [TN, Cg] instead of [TN, M].
    out = jnp.dot(e, g, preferred_element_type=jnp.float32) / den
    out_ref[0] = out.astype(out_ref.dtype)
    # Stats saved for the backward pass (skips its max/sum recompute).
    mx_ref[0] = mx
    den_ref[0] = den


def _attention_fwd_pallas(theta, phi, g):
    b, n, c = theta.shape
    m, cg = phi.shape[1], g.shape[2]
    tn = _row_tile(n)
    grid = (b, n // tn)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cg), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, cg), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, cg), theta.dtype),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(theta, phi, g)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_kernel(theta_ref, phi_ref, g_ref, dout_ref, mx_ref, den_ref,
                dtheta_ref, dphi_ref, dg_ref):
    j = pl.program_id(1)
    theta = theta_ref[0].astype(jnp.float32)
    phi = phi_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)       # [TN, Cg]

    scores = jax.lax.dot_general(
        theta, phi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # Row max/denominator come from the forward: one exp pass here, no
    # max/sum reductions over the [TN, M] scores.
    attn = jnp.exp(scores - mx_ref[0]) / den_ref[0]    # [TN, M]

    # dattn = dout @ g^T ; dscores = attn * (dattn - rowsum(dattn*attn))
    dattn = jax.lax.dot_general(
        dout, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, M]
    row = jnp.sum(dattn * attn, axis=-1, keepdims=True)
    dscores = attn * (dattn - row)

    dtheta_ref[0] = jnp.dot(dscores, phi,
                            preferred_element_type=jnp.float32
                            ).astype(dtheta_ref.dtype)

    dphi_tile = jax.lax.dot_general(
        dscores, theta, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [M, C]
    dg_tile = jax.lax.dot_general(
        attn, dout, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [M, Cg]

    # Accumulate across row tiles (TPU grids run sequentially; the last
    # grid axis iterates fastest, so j==0 is the first visit per batch).
    @pl.when(j == 0)
    def _():
        dphi_ref[0] = jnp.zeros_like(dphi_ref[0])
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dphi_ref[0] += dphi_tile.astype(dphi_ref.dtype)
    dg_ref[0] += dg_tile.astype(dg_ref.dtype)


def _attention_bwd_pallas(theta, phi, g, dout, mx, den):
    b, n, c = theta.shape
    m, cg = phi.shape[1], g.shape[2]
    tn = _row_tile(n)
    grid = (b, n // tn)
    # Accumulators in f32 so bf16 inputs don't lose gradient mass.
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cg), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, cg), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cg), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), theta.dtype),
            jax.ShapeDtypeStruct((b, m, c), jnp.float32),
            jax.ShapeDtypeStruct((b, m, cg), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(theta, phi, g, dout, mx, den)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

# Batch-partitionable entry points (see the partitioning note above). The
# `s` factor is the size-1 softmax-stats dim, present only in results.
_fwd_partitioned = _def_batch_partition(
    _attention_fwd_pallas, 3,
    "b n c, b m c, b m k -> b n k, b n s, b n s",
    need_replication=("n", "c", "m", "k", "s"))
_bwd_partitioned = _def_batch_partition(
    _attention_bwd_pallas, 3,
    "b n c, b m c, b m k, b n k, b n s, b n s -> b n c, b m c, b m k",
    need_replication=("n", "c", "m", "k", "s"))


@jax.custom_vjp
def fused_attention(theta, phi, g):
    """softmax(theta @ phi^T) @ g, attention matrix never leaves VMEM.

    theta: [B, N, C]; phi: [B, M, C]; g: [B, M, Cg] -> [B, N, Cg].
    """
    return _fwd_partitioned(theta, phi, g)[0]


def _fused_fwd(theta, phi, g):
    out, mx, den = _fwd_partitioned(theta, phi, g)
    # mx/den are [B, N, 1] f32 — negligible HBM vs recomputing the row
    # reductions over the [B, N, M] scores in the backward kernel.
    return out, (theta, phi, g, mx, den)


def _fused_bwd(residuals, dout):
    theta, phi, g, mx, den = residuals
    dtheta, dphi, dg = _bwd_partitioned(theta, phi, g, dout, mx, den)
    return dtheta, dphi.astype(phi.dtype), dg.astype(g.dtype)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def reference_attention(theta, phi, g):
    """The unfused einsum path (for tests and non-TPU backends)."""
    scores = jnp.einsum("bnc,bmc->bnm", theta.astype(jnp.float32),
                        phi.astype(jnp.float32))
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnm,bmc->bnc", attn,
                      g.astype(jnp.float32)).astype(theta.dtype)
