"""Torch-paired goldens for the deterministic vision transforms (VERDICT r2
items 8/9): the val transform (resize not_smaller -> center crop, reference
datasets_dali.py:209-223) and the optional train rotation (:260-272) are
checked against independent pure-torch computations, so a silent porting
bug in the numpy/PIL path can't survive."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from apps.trainer_vision import datasets_image as di

torch.set_num_threads(1)


def _torch_resize_bilinear_aa(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    t = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    out = torch.nn.functional.interpolate(
        t, size=(nh, nw), mode="bilinear", align_corners=False, antialias=True
    )
    return out[0].permute(1, 2, 0).numpy()


def test_val_transform_matches_torch_resize_center_crop():
    rng = np.random.RandomState(0)
    # non-square source, typical ImageNet-ish aspect
    img = (rng.rand(300, 500, 3) * 255).astype(np.uint8)
    out = di._center_crop_resize(img, (224, 224))
    assert out.shape == (224, 224, 3)

    # mirror the documented rule: shorter side -> crop/0.875 (256 for 224),
    # bilinear+antialias resize, then center crop
    h, w = img.shape[:2]
    target = int(round(224 / 0.875))
    scale = target / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    ref = _torch_resize_bilinear_aa(img, nh, nw)
    y = (nh - 224) // 2
    x = (nw - 224) // 2
    ref = ref[y : y + 224, x : x + 224]

    # PIL's filtered resize and torch's antialiased bilinear agree to
    # sub-quantization error on uint8 inputs
    diff = np.abs(out.astype(np.float32) - ref)
    assert diff.mean() < 0.5 and np.percentile(diff, 99) < 2.0, (
        diff.mean(),
        diff.max(),
    )


def test_val_transform_larger_than_256_input_size():
    # >256 crops used to crash with negative offsets; rule scales to
    # crop/0.875
    img = (np.random.RandomState(1).rand(500, 640, 3) * 255).astype(np.uint8)
    out = di._center_crop_resize(img, (384, 384))
    assert out.shape == (384, 384, 3)


@pytest.mark.parametrize("angle", [-30.0, -7.3, 0.0, 12.5, 30.0])
def test_rotation_matches_torch_grid_sample(angle):
    rng = np.random.RandomState(2)
    img = rng.randn(64, 80, 3).astype(np.float32)
    out = di._rotate_keep_size(img, angle)
    assert out.shape == img.shape and out.dtype == np.float32

    # independent torch mirror: inverse-rotation affine grid, bilinear,
    # zero padding, align_corners=True (pixel-center convention matching
    # the numpy implementation's (h-1)/2 center)
    h, w = img.shape[:2]
    theta = np.deg2rad(angle)
    c, s = np.cos(theta), np.sin(theta)
    # grid_sample normalized coords: x_src = c*x + s*y*(h-1)/(w-1)...
    # build the affine in pixel space then normalize
    mat = torch.tensor(
        [
            [c, s * (h - 1) / (w - 1), 0.0],
            [-s * (w - 1) / (h - 1), c, 0.0],
        ],
        dtype=torch.float64,
    )[None]
    grid = torch.nn.functional.affine_grid(
        mat, (1, 3, h, w), align_corners=True
    )
    t = torch.from_numpy(img).double().permute(2, 0, 1)[None]
    ref = torch.nn.functional.grid_sample(
        t, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    ref = ref[0].permute(1, 2, 0).numpy()

    assert np.allclose(out, ref, atol=1e-4), np.abs(out - ref).max()


def test_rotation_zero_angle_is_identity():
    img = np.random.RandomState(3).randn(32, 32, 3).astype(np.float32)
    out = di._rotate_keep_size(img, 0.0)
    assert np.allclose(out, img, atol=1e-6)


def test_pipeline_rotation_knob_changes_train_output_only():
    import pathlib
    import tempfile

    from PIL import Image

    with tempfile.TemporaryDirectory() as d:
        root = pathlib.Path(d)
        rng = np.random.RandomState(4)
        for i in range(4):
            arr = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / f"img{i}.jpg")
        classes = root / "classes.txt"
        classes.write_text(
            "".join(f"img{i}.jpg {i % 2}\n" for i in range(4))
        )
        kw = dict(
            root_dir=str(root),
            classes_fname=str(classes),
            batch_size=4,
            normalization="imagenet",
            input_h_w=(64, 64),
            num_classes=2,
            seed=7,
            num_workers=1,
        )
        plain = next(iter(di.ImageNetPipeline(training=True, **kw)))
        rot = next(
            iter(di.ImageNetPipeline(training=True, use_rotation=True, **kw))
        )
        # same seed => identical crops/flips; the coin-flipped rotation must
        # change at least one image and leave the labels untouched
        assert not np.allclose(plain["inputs"], rot["inputs"])
        assert np.array_equal(plain["targets"], rot["targets"])
        # val path ignores the knob
        val_a = next(iter(di.ImageNetPipeline(training=False, **kw)))
        val_b = next(
            iter(di.ImageNetPipeline(training=False, use_rotation=True, **kw))
        )
        assert np.allclose(val_a["inputs"], val_b["inputs"])
