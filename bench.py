"""Benchmark: BigGAN-128 training throughput per chip.

Runs the full BigGAN ImageNet-128 recipe step (disc_iters=2, hinge, SN,
conditional BN, EMA — example_configs/biggan_imagenet128.gin) on the local
accelerator and prints ONE JSON line:
  {"metric": "biggan128_steps_per_sec_per_chip", "value": N,
   "unit": "steps/sec", "vs_baseline": R}

Per-chip batch matches the reference recipe's per-core load on a v3-128
pod: global batch 2048 / 128 cores = 16 per sub-step.

vs_baseline: the reference publishes no TF-TPU steps/sec (BASELINE.md §top);
R is computed against REFERENCE_STEPS_PER_SEC below, an estimate of the TF1
compare_gan per-core throughput for the same recipe (TPUEstimator, v3).

Statistics (r3 VERDICT Weak #1): the tunnel TPU is time-shared, with
±25% wall-clock noise across occasions, so `value` is the MEDIAN of
per-chunk steps/s over TIMED_CHUNKS chunks and the line also carries
`p25`/`p75` plus `device_ms_per_step` — the xprof-derived sum of device
op self-times per step, which is immune to host/tunnel scheduling and is
the number perf claims should cite. BENCH_XPROF=0 skips the capture.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# Persistent compile cache: BigGAN-128 XLA compilation is minutes; cache it
# across bench invocations.
from compare_gan_tpu.utils import misc  # noqa: E402

misc.enable_persistent_compile_cache()

# Estimated reference (TF-TPU compare_gan) per-core steps/sec for the
# biggan_imagenet128 recipe at per-core batch 16. No number is published;
# the recipe (250k steps on a TPU v3-128, example_configs/
# biggan_imagenet128.gin) corresponds to roughly ~2 global steps/sec in
# era-typical multi-day runs. This anchor makes vs_baseline a stable
# ratio across rounds.
REFERENCE_STEPS_PER_SEC = 2.0

BATCH_PER_CHIP = 16
# Steps per jitted lax.scan chunk. Training always runs the device-side
# loop (the reference's iterations_per_loop=1000 TPUEstimator semantics;
# runner_lib.train uses the same make_train_loop scan) — benchmarking the
# chunked loop measures the production path and keeps host dispatch off
# the measurement. BENCH_CHUNK=1 falls back to per-step dispatch timing.
CHUNK_STEPS = int(os.environ.get("BENCH_CHUNK", "10"))
WARMUP_CHUNKS = 1
TIMED_CHUNKS = int(os.environ.get("BENCH_TIMED_CHUNKS", "6"))


def _device_ms_per_step(loop, ts, chunk):
    """Sum of device op self-times per step from one traced chunk.
    Scheduler-noise-immune: the op self-time total counts TPU busy time
    only, so it is stable across occasions where wall-clock steps/s
    swings with tunnel time-sharing (capture/parse recipe: CLAUDE.md
    profile notes; returns None if xprof tooling is unavailable)."""
    import csv
    import glob
    import io
    import shutil
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="bench_xprof_")
    try:
        from xprof.convert import raw_to_tool_data

        with jax.profiler.trace(trace_dir):
            ts, metrics = loop(ts, chunk)
            float(metrics["loss/g"])
        paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                         recursive=True)
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            paths, "framework_op_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        # xprof emits either a gviz-JSON DataTable or (older versions)
        # CSV; normalize both to a row-dict list.
        rows = []
        stripped = data.lstrip()
        if stripped.startswith(("[", "{")):
            import json as _json

            obj = _json.loads(stripped)
            table = obj[0] if isinstance(obj, list) else obj
            ids = [c["id"] for c in table["cols"]]
            for r in table.get("rows", []):
                rows.append({k: (c or {}).get("v")
                             for k, c in zip(ids, r["c"])})
        else:
            rows = list(csv.DictReader(io.StringIO(data)))
        # Busy time only: the Device rows include an explicit IDLE row
        # covering the gaps; excluding it leaves per-op self time.
        total_us = sum(
            float(r.get("total_self_time")
                  or r.get("total_self_time_us")
                  or r.get("self_time_us") or 0)
            for r in rows
            if r.get("host_or_device") == "Device"
            and r.get("type") != "IDLE" and r.get("operation") != "IDLE")
        if not total_us:
            return None
        return total_us / 1e3 / CHUNK_STEPS
    except Exception:
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def main():
    from __graft_entry__ import _make_biggan

    # bfloat16 activations on the MXU; params/losses/BN stats stay f32.
    # joint_gen_for_disc batches the G forwards for both D sub-steps into
    # one batch-32 forward (the reference's experimental_joint_gen_for_disc
    # option, modular_gan.py:444-463) — better MXU utilization at the
    # recipe's small per-core batch. BENCH_JOINT_GEN=0 opts out.
    joint = os.environ.get("BENCH_JOINT_GEN", "1") == "1"
    # fake_only_g_loss: the G sub-step's D forward runs on fakes only —
    # mathematically identical g_loss/gradients/state for BigGAN's
    # batch-decoupled D (no batch norm), at half the G-step D cost
    # (exactness: tests/test_trainer.py::test_fake_only_g_loss_matches_concat;
    # rationale: modular_gan.py __init__ docstring). BENCH_FAKE_ONLY=0 opts
    # out to measure the reference's concat graph shape.
    fake_only = os.environ.get("BENCH_FAKE_ONLY", "1") == "1"
    gan = _make_biggan(resolution=128, batch_size=BATCH_PER_CHIP,
                       compute_dtype="bfloat16", joint_gen_for_disc=joint,
                       fake_only_g_loss=fake_only)
    # BENCH_BF16_MOMENTS=1: opt-in extension, Adam's first moment stored
    # in bf16 (AdamOptimizer.moment_dtype gin knob) — halves the m
    # read+write share of the bandwidth-bound parameter passes. OFF by
    # default: the official number keeps the reference's f32 optimizer
    # numerics.
    if os.environ.get("BENCH_BF16_MOMENTS", "0") == "1":
        from compare_gan_tpu import config as gin
        gin.parse_config("AdamOptimizer.moment_dtype = 'bfloat16'")
    ts = gan.init_state(jax.random.PRNGKey(0), BATCH_PER_CHIP)
    loop = jax.jit(gan.make_train_loop(BATCH_PER_CHIP, CHUNK_STEPS),
                   donate_argnums=0)

    total = BATCH_PER_CHIP * gan.num_sub_steps
    rng = np.random.RandomState(0)
    # Stage one chunk of batches on device (training overlaps staging with
    # the previous chunk's compute; the bench measures the device loop).
    chunk = jax.device_put({
        "images": rng.rand(CHUNK_STEPS, total, 128, 128, 3
                           ).astype(np.float32),
        "labels": rng.randint(0, 1000, size=(CHUNK_STEPS, total)
                              ).astype(np.int32),
    })

    # BENCH_COMPILER_OPTIONS="k=v,k2=v2": forward TPU compiler options
    # (e.g. xla_tpu_scoped_vmem_limit_kib=65536) for flag experiments.
    # Client-side XLA_FLAGS cannot carry --xla_tpu_* flags on tunneled
    # backends (the client parser rejects them; libtpu lives server-side)
    # but jit compiler_options reach the server compiler. Unset = the
    # measured production default (copy-insertion region analysis, +1.9%;
    # mesh_utils.default_tpu_compiler_options, README perf notes).
    opts_env = os.environ.get("BENCH_COMPILER_OPTIONS")
    if opts_env:
        opts = dict(kv.split("=", 1) for kv in opts_env.split(","))
    else:
        from compare_gan_tpu.parallel import mesh_utils
        opts = mesh_utils.default_tpu_compiler_options()
    if opts:
        loop = loop.lower(ts, chunk).compile(compiler_options=opts)

    for _ in range(WARMUP_CHUNKS):
        ts, metrics = loop(ts, chunk)
    float(metrics["loss/g"])  # Materialize: block_until_ready alone can
    # return early on tunneled backends.

    # Per-chunk samples: each chunk's timing is closed by its own D2H
    # round trip (~8 ms against ~600 ms of device loop), so the samples
    # are independent and a robust median/IQR can be reported.
    samples = []
    for _ in range(TIMED_CHUNKS):
        t0 = time.perf_counter()
        ts, metrics = loop(ts, chunk)
        float(metrics["loss/g"])
        samples.append(CHUNK_STEPS / (time.perf_counter() - t0))
    p25, median, p75 = np.percentile(samples, [25, 50, 75])

    device_ms = (None if os.environ.get("BENCH_XPROF", "1") != "1"
                 else _device_ms_per_step(loop, ts, chunk))
    print(json.dumps({
        "metric": "biggan128_steps_per_sec_per_chip",
        "value": round(float(median), 4),
        "unit": "steps/sec",
        "vs_baseline": round(float(median) / REFERENCE_STEPS_PER_SEC, 4),
        "p25": round(float(p25), 4),
        "p75": round(float(p75), 4),
        "chunks": TIMED_CHUNKS,
        "chunk_steps": CHUNK_STEPS,
        "device_ms_per_step": (None if device_ms is None
                               else round(device_ms, 2)),
    }))


if __name__ == "__main__":
    main()
