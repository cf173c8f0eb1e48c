"""Convex-polygons synthetic dataset (reference
colabs/Convex_Polygons_Dataset.ipynb; compare_gan_tpu/polygons.py)."""

import numpy as np
import pytest

from compare_gan_tpu import datasets, polygons


def test_polygon_geometry():
    rng = np.random.RandomState(0)
    img = polygons.generate_convex_polygon(
        rng, n_vertices=3, min_segment_angle=20.0, scale=0.75,
        raster_dim=28, subpixel_res=8)
    assert img.shape == (28, 28)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Dark polygon on light background: corners are background (the
    # polygon lives on a scale*dim/2 circle about the center).
    assert img[0, 0] == 1.0 and img[-1, -1] == 1.0
    # Interior exists: some fully-covered pixels.
    assert (img == 0.0).sum() > 10
    # Antialiased edges: fractional values present.
    assert ((img > 0.0) & (img < 1.0)).sum() > 0
    # Triangle area (1 - mean) is bounded by the circumscribing circle's
    # and is at least the smallest min-angle triangle's.
    area_frac = (1.0 - img).sum() / img.size
    circle_frac = np.pi * (0.75 / 2) ** 2
    assert 0.02 < area_frac < circle_frac


def test_dataset_surface_and_determinism():
    a_imgs, a_labels = polygons.generate_dataset(8, seed=3)
    b_imgs, b_labels = polygons.generate_dataset(8, seed=3)
    np.testing.assert_array_equal(a_imgs, b_imgs)
    assert a_imgs.shape == (8, 28, 28, 1) and a_imgs.dtype == np.float32
    assert list(a_labels) == [3] * 8
    c_imgs, _ = polygons.generate_dataset(8, seed=4)
    assert not np.array_equal(a_imgs, c_imgs)


def test_parallel_rasterization_is_bit_identical():
    """`n_workers > 0` moves only the rng-free rasterization into worker
    processes; the RandomState stream is consumed sequentially by
    _draw_vertex_angles beforehand, so worker scheduling cannot reorder
    it — outputs must be BIT-identical to the serial path (this is what
    lets the 128px flagship dataset generate in parallel without
    changing the committed convergence data)."""
    for gen, kwargs in [
            (polygons.generate_multiclass_dataset, {"raster_dim": 32}),
            (polygons.generate_oriented_dataset, {})]:
        serial = gen(24, seed=7, n_workers=0, **kwargs)
        par = gen(24, seed=7, n_workers=2, **kwargs)
        np.testing.assert_array_equal(serial[0], par[0])
        np.testing.assert_array_equal(serial[1], par[1])


@pytest.mark.parametrize("kwargs", [
    {"n_vertices": 2}, {"min_segment_angle": 200.0}, {"scale": 1.5},
    {"raster_dim": 1}])
def test_infeasible_args_raise(kwargs):
    with pytest.raises(ValueError):
        polygons.generate_dataset(1, **{"n_vertices": 3, **kwargs})


def test_npz_roundtrip_through_registry(tmp_path, monkeypatch):
    polygons.write_npz_dataset(str(tmp_path), n_train=32, n_test=8,
                               n_holdout=8)
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("convex_polygons")
    batch = next(ds.train_input_fn(batch_size=4))
    assert batch["images"].shape == (4, 28, 28, 1)
    assert batch["images"].min() >= 0.0 and batch["images"].max() <= 1.0
    ev = next(ds.eval_input_fn(batch_size=4))
    assert ev["images"].shape == (4, 28, 28, 1)


def test_multiclass_dataset_surface():
    imgs, labels = polygons.generate_multiclass_dataset(
        32, classes=(3, 4, 5, 6), seed=1)
    assert imgs.shape == (32, 32, 32, 1) and imgs.dtype == np.float32
    assert labels.shape == (32,)
    assert set(labels) <= {0, 1, 2, 3}
    assert len(set(labels)) > 1  # All classes drawn uniformly at random.
    # Determinism.
    imgs2, labels2 = polygons.generate_multiclass_dataset(
        32, classes=(3, 4, 5, 6), seed=1)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labels, labels2)
    # More vertices => closer to the circumscribing circle => larger
    # mean area (dark = polygon), making the class visually decidable.
    area = lambda c: np.mean([  # noqa: E731
        (1.0 - im).mean() for im, y in zip(imgs[..., 0], labels) if y == c])
    areas = [area(c) for c in range(4) if np.any(labels == c)]
    assert areas == sorted(areas)


def test_multiclass_npz_roundtrip_through_registry(tmp_path, monkeypatch):
    polygons.write_multiclass_npz_dataset(str(tmp_path), n_train=32,
                                          n_test=8, n_holdout=8)
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("convex_polygons_multiclass")
    assert ds.num_classes == 4
    batch = next(ds.train_input_fn(batch_size=4))
    assert batch["images"].shape == (4, 32, 32, 1)
    assert batch["labels"].shape == (4,)
    assert batch["labels"].max() < 4


def test_oriented_dataset_rotation_is_detectable():
    """The oriented variant exists to make SSGAN's 4-way rotation task
    learnable: the vertical shading ramp must give every image a global
    orientation cue (top rows brighter than bottom rows), and a rot90
    must move that cue to the columns — the signal the rotation head
    classifies. Plain polygons are uniformly rotated (rotation-invariant
    distribution), which would leave the head at chance by symmetry."""
    imgs, labels = polygons.generate_oriented_dataset(32, seed=3)
    assert imgs.shape == (32, 32, 32, 1)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    assert labels.shape == (32,) and set(np.unique(labels)) <= {0, 1, 2, 3}
    for im in imgs[..., 0]:
        top, bottom = im[:8].mean(), im[-8:].mean()
        assert top > bottom + 0.05, (top, bottom)
        rot = np.rot90(im)
        assert abs(rot[:8].mean() - rot[-8:].mean()) < (top - bottom) / 2
    # Determinism: same seed, same data.
    imgs2, labels2 = polygons.generate_oriented_dataset(32, seed=3)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(labels, labels2)


def test_partial_dataset_writer_semantics(tmp_path):
    """write_partial_npz_dataset: only labeled_frac of TRAIN labels
    survive (rest -1 = the reference's "no label" contract,
    s3gan.py:105,118-122); test/holdout keep every label; images are
    bitwise the multiclass set's (same seed) so FID anchors transfer."""
    polygons.write_partial_npz_dataset(str(tmp_path), labeled_frac=0.25,
                                       n_train=256, n_test=32, n_holdout=32)
    polygons.write_multiclass_npz_dataset(str(tmp_path), n_train=256,
                                          n_test=32, n_holdout=32)
    for split in ("train", "test", "holdout"):
        part = np.load(tmp_path / "convex_polygons_partial" / f"{split}.npz")
        full = np.load(
            tmp_path / "convex_polygons_multiclass" / f"{split}.npz")
        np.testing.assert_array_equal(part["images"], full["images"])
        if split == "train":
            frac = (part["labels"] >= 0).mean()
            assert 0.15 < frac < 0.35, frac
            kept = part["labels"] >= 0
            np.testing.assert_array_equal(part["labels"][kept],
                                          full["labels"][kept])
            assert set(part["labels"][~kept]) == {-1}
        else:
            np.testing.assert_array_equal(part["labels"], full["labels"])
    with pytest.raises(ValueError):
        polygons.write_partial_npz_dataset(str(tmp_path), labeled_frac=0.0)


def test_partial_npz_s3gan_step(tmp_path, monkeypatch):
    """End-to-end: -1 labels ride the real npz pipeline into an S3GAN
    train step — one-hot(-1) rows are all-zero, is_label_available sees
    them, and the predictor's label_frac metric reports the batch's
    labeled fraction (not 1.0)."""
    import jax
    from compare_gan_tpu.gans.s3gan import S3GAN

    polygons.write_partial_npz_dataset(str(tmp_path), labeled_frac=0.25,
                                       n_train=256, n_test=32, n_holdout=32)
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("convex_polygons_partial")
    assert ds.num_classes == 4
    gan = S3GAN(dataset=ds, model_dir=str(tmp_path / "model"),
                parameters={"architecture": "dummy_arch", "z_dim": 8,
                            "lambda": 1, "disc_iters": 1},
                conditional=True, self_supervision="none",
                rotated_batch_fraction=2, project_y=True,
                use_predictor=True, use_soft_pred=True)
    bs = 16
    batch = next(ds.train_input_fn(batch_size=bs * gan.num_sub_steps))
    labels = np.asarray(batch["labels"])
    assert (labels == -1).any(), "partial train split must mix in -1s"
    onehot = np.asarray(jax.nn.one_hot(labels, 4))
    np.testing.assert_array_equal(onehot.sum(1), (labels >= 0))
    ts = gan.init_state(jax.random.PRNGKey(0), bs)
    step = jax.jit(gan.make_train_step(bs))
    _, metrics = step(ts, {k: np.asarray(v) for k, v in batch.items()})
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # The extras come from the G sub-step, which sees the LAST sub-batch
    # (labels_s[-1]); label_frac must report ITS labeled fraction.
    g_labels = labels[-bs:]
    assert (labels == -1).any()
    np.testing.assert_allclose(float(metrics["loss/label_frac"]),
                               (g_labels >= 0).mean(), atol=1e-6)


def test_oriented_npz_roundtrip_through_registry(tmp_path, monkeypatch):
    polygons.write_oriented_npz_dataset(str(tmp_path), n_train=32,
                                        n_test=8, n_holdout=8)
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("convex_polygons_oriented")
    assert ds.num_classes is None
    batch = next(ds.train_input_fn(batch_size=4))
    assert batch["images"].shape == (4, 32, 32, 1)


def test_multiclass128_dataset_writer(tmp_path, monkeypatch):
    """write_multiclass128_npz_dataset: flagship-resolution splits ride
    the registry at 128px with 4 decidable classes."""
    polygons.write_multiclass128_npz_dataset(str(tmp_path), n_train=24,
                                             n_test=8, n_holdout=8)
    arr = np.load(tmp_path / "convex_polygons_multiclass_128" / "train.npz")
    assert arr["images"].shape == (24, 128, 128, 1)
    assert arr["images"].dtype == np.uint8
    assert set(np.unique(arr["labels"])) <= {0, 1, 2, 3}
    monkeypatch.setattr(datasets, "DATA_DIR", str(tmp_path))
    datasets.set_fake_dataset(False)
    ds = datasets.get_dataset("convex_polygons_multiclass_128")
    assert ds.num_classes == 4
    batch = next(ds.train_input_fn(batch_size=4))
    assert batch["images"].shape == (4, 128, 128, 1)
    assert float(np.asarray(batch["images"]).max()) <= 1.0


def test_partial_oriented_dataset_writer(tmp_path):
    """write_partial_oriented_npz_dataset: oriented (ramp-shaded) images
    with the partial-label contract — BOTH S3GAN auxiliary signals
    live."""
    polygons.write_partial_oriented_npz_dataset(
        str(tmp_path), labeled_frac=0.25, n_train=256, n_test=32,
        n_holdout=32)
    polygons.write_oriented_npz_dataset(str(tmp_path), n_train=256,
                                        n_test=32, n_holdout=32)
    for split in ("train", "test", "holdout"):
        part = np.load(tmp_path / "convex_polygons_partial_oriented"
                       / f"{split}.npz")
        full = np.load(tmp_path / "convex_polygons_oriented"
                       / f"{split}.npz")
        # Same images as the SSGAN-proof oriented set (same seed) —
        # its rotation-learnability evidence transfers.
        np.testing.assert_array_equal(part["images"], full["images"])
        if split == "train":
            frac = (part["labels"] >= 0).mean()
            assert 0.15 < frac < 0.35, frac
            assert set(part["labels"][part["labels"] < 0]) == {-1}
        else:
            assert (part["labels"] >= 0).all()
