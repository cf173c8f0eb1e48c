"""Secondary benchmark: FID-eval throughput on TPU.

Measures generator sampling + InceptionV3 feature extraction images/sec —
the pipeline the reference could only run on CPU/GPU (README.md:113-115).
Prints ONE JSON line (not the driver's primary bench; see bench.py).
Uses randomly initialized Inception weights: throughput is weight-agnostic.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from compare_gan_tpu.utils import misc  # noqa: E402

misc.enable_persistent_compile_cache()

BATCH = 64
BATCHES = 16


def main():
    from compare_gan_tpu.metrics import inception_net
    from __graft_entry__ import _make_biggan
    from compare_gan_tpu import core

    gan = _make_biggan(resolution=128, batch_size=BATCH,
                       compute_dtype="bfloat16")
    inception = inception_net.init_random(jax.random.PRNGKey(1))

    z = jnp.asarray(np.random.RandomState(0).uniform(
        -1, 1, (BATCH, 120)).astype(np.float32))
    labels = jnp.arange(BATCH) % 1000

    def g_fwd(z_in, labels_in):
        y = jax.nn.one_hot(labels_in, 1000)
        return gan.generator(z_in, y=y, is_training=False)

    _, params, state = core.init(g_fwd, jax.random.PRNGKey(0), z, labels)
    # Pass all weights as arguments: closures would bake ~100 MB of
    # constants into the HLO.
    params, state, inception = jax.device_put((params, state, inception))

    @jax.jit
    def sample_and_extract(params_, state_, inception_, key):
        z_i = jax.random.uniform(key, (BATCH, 120), minval=-1.0, maxval=1.0)
        images, _ = core.apply(g_fwd, params_, state_, z_i, labels)
        pool, logits = inception_net.inception_features(
            inception_,
            (jax.image.resize(images, (BATCH, 299, 299, 3), "bilinear")
             * 2.0 - 1.0).astype(jnp.float32))
        return pool.sum(), logits.sum()

    s, _ = sample_and_extract(params, state, inception,
                              jax.random.PRNGKey(0))
    float(s)  # Materialize (block_until_ready can return early on axon).

    # Robust statistic like bench.py: median of per-group images/sec
    # over 4 independently-timed groups (time-shared tunnel TPU).
    group = max(1, BATCHES // 4)
    samples = []
    for g in range(4):
        t0 = time.perf_counter()
        for i in range(group):
            s, _ = sample_and_extract(params, state, inception,
                                      jax.random.PRNGKey(g * group + i))
        float(s)
        samples.append(BATCH * group / (time.perf_counter() - t0))
    p25, median, p75 = np.percentile(samples, [25, 50, 75])
    print(json.dumps({
        "metric": "fid_eval_images_per_sec_on_tpu",
        "value": round(float(median), 2),
        "unit": "images/sec",
        "vs_baseline": None,
        "p25": round(float(p25), 2),
        "p75": round(float(p75), 2),
    }))


if __name__ == "__main__":
    main()
