"""Live multi-host launch: two REAL processes form the global mesh via
jax.distributed.initialize and train through the full CLI (main.py
--multihost), the TPUEstimator multi-host bootstrap (reference
abstract_gan.py:41-47, datasets.py:147-172).

This is the only test that actually exercises the cross-process path:
the in-process unit tests (test_datasets host sharding, test_parallel
mesh invariance) can't catch multi-controller bugs — round 3 found that
device_put same-value-asserts across processes, so per-host batches must
be assembled with make_array_from_process_local_data instead
(mesh_utils.make_batch_sharder), and that a chief-only jit over global
arrays would be a collective the other process never joins
(runner_lib._write_image_summaries).
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LAUNCHER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port, model_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.argv = ["main",
        f"--model_dir={model_dir}", "--schedule=train",
        "--data_fake_dataset", "--multihost",
        f"--coordinator_address=127.0.0.1:{port}",
        "--num_processes=2", f"--process_id={pid}",
        "--gin_bindings=dataset.name = 'cifar10'",
        "--gin_bindings=options.architecture = 'dummy_arch'",
        "--gin_bindings=options.batch_size = 8",
        "--gin_bindings=options.gan_class = @ModularGAN",
        "--gin_bindings=options.training_steps = 4",
        "--gin_bindings=options.z_dim = 16",
        "--gin_bindings=run_config.iterations_per_loop = 2",
        "--gin_bindings=run_config.save_checkpoints_steps = 2",
    ]
    from absl import app
    from compare_gan_tpu import main
    app.run(main.main)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Real conv arch with cross-replica BN (standardize_batch global-batch
# moments), spectral-norm state in D and grad psums — the collectives the
# dummy_arch launch above never exercises across a process boundary.
_COLLECTIVE_LAUNCHER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    num, pid, port, model_dir = sys.argv[1:5]
    sys.argv = ["main",
        f"--model_dir={model_dir}", "--schedule=train",
        "--gin_bindings=dataset.name = 'cifar10'",
        "--gin_bindings=options.architecture = 'resnet_cifar_arch'",
        "--gin_bindings=options.batch_size = 8",
        "--gin_bindings=options.gan_class = @ModularGAN",
        "--gin_bindings=options.disc_iters = 1",
        "--gin_bindings=options.training_steps = 2",
        "--gin_bindings=options.z_dim = 32",
        "--gin_bindings=G.batch_norm_fn = @batch_norm",
        "--gin_bindings=D.spectral_norm = True",
        "--gin_bindings=run_config.iterations_per_loop = 1",
        "--gin_bindings=run_config.save_checkpoints_steps = 2",
    ]
    if int(num) > 1:
        sys.argv[1:1] = ["--multihost",
            f"--coordinator_address=127.0.0.1:{port}",
            f"--num_processes={num}", f"--process_id={pid}"]
    from absl import app
    from compare_gan_tpu import main
    app.run(main.main)
""")


def _write_constant_dataset(data_dir, n=64):
    """cifar10-shaped npz whose records are ALL IDENTICAL. Per-host epoch
    shards interleave records differently across topologies (host h takes
    order[h::num_hosts]), so the global-batch position->record pairing is
    only topology-invariant when every record is the same image; with that
    pinned, a 2-process and a 1-process run see bitwise-identical global
    batches and must produce bitwise-identical checkpoints."""
    img = np.zeros((32, 32, 3), np.uint8)
    grid = np.indices((32, 32)).sum(axis=0)
    img[..., 0] = (grid * 4) % 256
    img[..., 1] = 128
    img[..., 2] = np.linspace(0, 255, 32, dtype=np.uint8)[None, :]
    out = data_dir / "cifar10"
    out.mkdir(parents=True)
    np.savez(out / "train.npz",
             images=np.broadcast_to(img, (n, 32, 32, 3)).copy(),
             labels=np.full(n, 3, np.int64))


def _run_collective_case(tmp_path, tag, num_processes, devices_per_proc):
    launcher = tmp_path / "launch.py"
    if not launcher.exists():
        launcher.write_text(_COLLECTIVE_LAUNCHER)
    model_dir = tmp_path / f"model_{tag}"
    port = _free_port()
    env = dict(
        os.environ, PYTHONPATH=REPO,
        COMPARE_GAN_DATA_DIR=str(tmp_path / "data"),
        XLA_FLAGS=("--xla_force_host_platform_device_count="
                   f"{devices_per_proc}"))
    logs = [tmp_path / f"{tag}{i}.log" for i in range(num_processes)]
    files = [log.open("w") for log in logs]
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, str(launcher), str(num_processes), str(i),
                 str(port), str(model_dir)],
                cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT)
            for i, f in enumerate(files)
        ]
        try:
            for p in procs:
                p.wait(timeout=900)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
    finally:
        for f in files:
            f.close()
    for i, (proc, log) in enumerate(zip(procs, logs)):
        assert proc.returncode == 0, (
            f"{tag} process {i} failed:\n{log.read_text()[-4000:]}")
    ckpt = np.load(model_dir / "model.ckpt-2.npz")
    return {k: ckpt[k] for k in ckpt.files}


@pytest.mark.slow
def test_cross_process_collectives(tmp_path):
    """2-process x 2-device resnet_cifar train: cross-replica BN + SN +
    grad psums over a REAL process boundary (reference
    arch_ops.py:258-263, tpu/tpu_ops_test.py:44-128) ends within
    collective-reduction roundoff of the single-process 4-device run —
    the mesh-invariance golden (test_parallel.py) extended across a
    process boundary.

    Why tolerance, not bitwise: the cross-process all-reduce sums
    partials in a runtime-dependent order — measured here, even two
    IDENTICAL 2-process launches differ (params up to ~3e-4), the same
    scale as the 2-process-vs-1-process gap, so bitwise equality is
    unattainable on this path (the in-process 8-device mesh and the
    single-process TPU path stay bitwise-deterministic; see
    test_parallel.py / test_resume_determinism.py). Measured divergence
    after 2 steps: Adam second moments ~8e-10, first moments (≡ psum'd
    grads) ~4e-6, BN moments / SN u ~7e-6, params ~4e-4 (near-zero bias
    grads are roundoff-dominated, so Adam's m/sqrt(v) normalization
    amplifies their sign flip to full lr scale). Asserted bounds leave
    ~10x headroom; a REAL divergence (wrong moment psum, missed
    collective, desynced RNG) exceeds them by orders of magnitude.
    """
    _write_constant_dataset(tmp_path / "data")
    multi = _run_collective_case(tmp_path, "multi", 2, 2)
    single = _run_collective_case(tmp_path, "single", 1, 4)
    assert set(multi) == set(single)
    assert int(multi[".step"]) == 2

    for k, v in multi.items():
        ref = single[k]
        if v.dtype.kind != "f":
            np.testing.assert_array_equal(v, ref, err_msg=k)
            continue
        assert np.isfinite(v).all(), k
        if ".nu[" in k:
            atol = 1e-8
        elif ".mu[" in k:
            atol = 5e-5   # psum'd gradients: reduction roundoff.
        elif k.startswith(".params") or k.startswith(".ema"):
            atol = 4e-3   # Adam sign-amplification of ~0 bias grads.
        else:
            atol = 1e-4   # BN moments / SN u state.
        np.testing.assert_allclose(v, ref, rtol=1e-3, atol=atol,
                                   err_msg=k)


def test_two_process_cli_train_launch(tmp_path):
    launcher = tmp_path / "launch.py"
    launcher.write_text(_LAUNCHER)
    model_dir = tmp_path / "model"
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    # The subprocesses must NOT inherit this test process's virtual-device
    # XLA flags: each process is one "host" with its own local device(s).
    env.pop("XLA_FLAGS", None)
    # Subprocess stdout goes to FILES, not pipes: the two processes are
    # interdependent (distributed collectives), so waiting on one while
    # the other blocks on a full pipe buffer would deadlock until the
    # timeout and leak both children.
    logs = [tmp_path / f"proc{i}.log" for i in range(2)]
    with logs[0].open("w") as f0, logs[1].open("w") as f1:
        procs = [
            subprocess.Popen(
                [sys.executable, str(launcher), str(i), str(port),
                 str(model_dir)],
                cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT)
            for i, f in enumerate((f0, f1))
        ]
        try:
            for p in procs:
                p.wait(timeout=300)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
    outs = [log.read_text() for log in logs]
    for i, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    # Both processes saw the 2-process global mesh.
    for out in outs:
        assert "of 2." in out
    # Chief wrote the full artifact set; training reached max_steps.
    assert (model_dir / "TRAIN_DONE").exists()
    for step in (0, 2, 4):
        assert (model_dir / f"model.ckpt-{step}.npz").exists()
    ckpt = np.load(model_dir / "model.ckpt-4.npz")
    assert int(ckpt[".step"]) == 4
    for key in ckpt.files:
        if ckpt[key].dtype.kind == "f":
            assert np.isfinite(ckpt[key]).all(), key
    # The chief-only image-summary path must not have fallen back to the
    # logged-failure branch (it fetches a host copy of the params).
    for out in outs:
        assert "Image summary" not in out
