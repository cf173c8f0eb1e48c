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
