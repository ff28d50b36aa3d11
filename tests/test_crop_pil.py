"""PIL-exact per-person crop parity (PARITY.md #6, VERDICT r2 #3).

The reference resamples every person crop through torchvision
``transforms.Resize`` on a PIL image (SimpleHRNet.py:167-172), i.e.
Pillow's two-pass antialiased bilinear resize with uint8 fixed-point
arithmetic. ``ops.image.crop_resize_pil`` reproduces that pipeline on
device from TRACED boxes; under x64 it is bit-exact (every intermediate
is exactly representable in f64), in f32 an occasional round-half case
may flip by one 8-bit count.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from simple_hrnet_tpu.ops import image as I


def reference_crop(image_bgr, box, resolution):
    """The reference's exact crop arithmetic (SimpleHRNet.py:237-279):
    int box -> np.pad to aspect -> PIL bilinear (antialiased) resize."""
    x1, y1, x2, y2 = (int(v) for v in box)
    rh, rw = resolution
    correction = rh / rw * (x2 - x1) / (y2 - y1)
    crop = image_bgr[y1:y2, x1:x2, ::-1]
    if correction > 1:
        cy = y1 + (y2 - y1) // 2
        ln = int(round((y2 - y1) * correction))
        y1n, y2n = int(cy - ln // 2), int(cy + ln // 2)
        x1n, x2n = x1, x2
        crop = np.pad(crop, ((abs(y1n - y1), abs(y2n - y2)), (0, 0), (0, 0)))
    elif correction < 1:
        cx = x1 + (x2 - x1) // 2
        ln = int(round((x2 - x1) / correction))
        x1n, x2n = int(cx - ln // 2), int(cx + ln // 2)
        y1n, y2n = y1, y2
        crop = np.pad(crop, ((0, 0), (abs(x1n - x1), abs(x2n - x2)), (0, 0)))
    else:
        x1n, y1n, x2n, y2n = x1, y1, x2, y2
    pil = Image.fromarray(crop).resize((rw, rh), Image.BILINEAR)
    return np.asarray(pil), (x1n, y1n, x2n, y2n)


FRAME_HW = (240, 320)
RES = (128, 96)
# tall/wide/edge-overflow/tiny-upscale/large boxes (ints, inside the frame)
BOXES = [
    (40, 30, 120, 200),     # tall -> grow x
    (150, 60, 300, 130),    # wide -> grow y
    (2, 5, 60, 235),        # near edges; padding leaves the frame
    (200, 100, 240, 150),   # small -> upscale
    (10, 10, 310, 230),     # large downscale both axes
    (100, 40, 196, 168),    # exact 4:3 aspect (correction == 1)
]


def _ours(image_bgr, box, resolution):
    rgb = jnp.asarray(image_bgr[..., ::-1].copy())
    bx = jnp.asarray(box, jnp.float32)[None]
    padded = I.pad_to_aspect(bx, resolution[0] / resolution[1])[0]
    out = I.crop_resize_pil(rgb, padded, resolution,
                            valid_box=jnp.asarray(box, jnp.float32))
    return np.asarray(out), np.asarray(padded)


@pytest.fixture(scope='module')
def frame(rng):
    return rng.integers(0, 256, (*FRAME_HW, 3)).astype(np.uint8)


def test_crop_pil_bitexact_x64(frame):
    """Under f64 the on-device crop matches PIL BIT-EXACTLY (<= 1e-3 by
    a huge margin — the gate VERDICT r2 #3 asks for)."""
    with jax.enable_x64(True):
        for box in BOXES:
            ref, ref_box = reference_crop(frame, box, RES)
            got, padded = _ours(frame, box, RES)
            np.testing.assert_array_equal(padded, np.asarray(ref_box))
            diff = np.abs(got - ref.astype(np.float32))
            assert diff.max() == 0.0, (box, diff.max(),
                                       (diff > 0).mean())
            # and in the reference's normalized units: identically zero
            norm_diff = diff / 255.0 / np.asarray(I.IMAGENET_STD)
            assert norm_diff.max() <= 1e-3


def test_crop_pil_f32_production(frame):
    """In f32 (TPU production dtype) occasional round-half flips are the
    only deviation: <= 1 uint8 count, on a vanishing pixel fraction."""
    for box in BOXES:
        ref, _ = reference_crop(frame, box, RES)
        got, _ = _ours(frame, box, RES)
        diff = np.abs(got - ref.astype(np.float32))
        assert diff.max() <= 1.0, box
        assert (diff > 0).mean() < 0.02, box


OVERHANG_BOXES = [
    # boxes clamped at min=0 only (YOLOv3.py scale_coords), so x2/y2 can
    # exceed the frame; the reference's numpy slice truncates the crop at
    # the edge BEFORE np.pad, shrinking the PIL source geometry
    (250, 100, 340, 200),   # x2 > W on the y-padded axis' partner
    (40, 150, 120, 260),    # y2 > H, correction < 1 (x gets the padding)
    (100, 180, 200, 260),   # y2 > H on the padded axis itself
    (280, 180, 360, 270),   # both axes overhang
]


def test_crop_pil_edge_overhang_matches_reference(frame):
    """Detections overhanging the frame's bottom/right: the reference
    truncates the crop at the edge (SimpleHRNet.py:274-277), changing the
    resize geometry — the device crop must reproduce that, not model the
    overhang as zero padding."""
    with jax.enable_x64(True):
        for box in OVERHANG_BOXES:
            ref, ref_box = reference_crop(frame, box, RES)
            got, padded = _ours(frame, box, RES)
            np.testing.assert_array_equal(padded, np.asarray(ref_box))
            diff = np.abs(got - ref.astype(np.float32))
            assert diff.max() == 0.0, (box, diff.max(), (diff > 0).mean())


def test_crop_pil_unpadded_clamped_box(frame):
    """valid_box=None: the batch path's clamped-box crop (real pixels,
    no zero padding — SimpleHRNet.py:393-410)."""
    box = (30, 20, 160, 220)
    with jax.enable_x64(True):
        crop = frame[box[1]:box[3], box[0]:box[2], ::-1]
        ref = np.asarray(Image.fromarray(crop).resize(
            (RES[1], RES[0]), Image.BILINEAR))
        got = I.crop_resize_pil(
            jnp.asarray(frame[..., ::-1].copy()),
            jnp.asarray(box, jnp.float64), RES)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_crop_pil_under_jit_vmap(frame):
    """The production usage: vmapped over boxes inside jit (f32)."""
    rgb = jnp.asarray(frame[..., ::-1].copy())
    boxes = jnp.asarray(BOXES[:3], jnp.float32)
    padded = I.pad_to_aspect(boxes, RES[0] / RES[1])

    @jax.jit
    def run(im, pb, ob):
        return jax.vmap(
            lambda p, o: I.crop_resize_pil(im, p, RES, valid_box=o))(pb, ob)

    out = np.asarray(run(rgb, padded, boxes))
    assert out.shape == (3, *RES, 3)
    for i, box in enumerate(BOXES[:3]):
        ref, _ = reference_crop(frame, box, RES)
        assert np.abs(out[i] - ref).max() <= 1.0
