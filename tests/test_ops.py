"""Parity of decode / affine / image ops vs the reference implementations."""

import sys
import types

import numpy as np
import pytest

import conftest


def _import_ref_utils():
    """Import reference misc.utils with a munkres stub (not installed)."""
    conftest.reference_on_path()
    if 'munkres' not in sys.modules:
        stub = types.ModuleType('munkres')
        stub.Munkres = object
        sys.modules['munkres'] = stub
    import misc.utils as ref_utils
    return ref_utils


# ---------------------------------------------------------------------------
# Affine matrices
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('rot', [0.0, 30.0, -45.0])
@pytest.mark.parametrize('inv', [0, 1])
def test_affine_matrix_matches_cv2(rot, inv, rng):
    ref_utils = _import_ref_utils()
    from simple_hrnet_tpu.ops import affine

    for _ in range(5):
        center = rng.uniform(50, 400, 2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, 2).astype(np.float32)
        out_size = [192, 256]
        ref = ref_utils.get_affine_transform(center, scale, 200, rot, out_size,
                                             inv=inv)
        ours = affine.affine_matrix(center, scale, rot, out_size, 200,
                                    inv=bool(inv))
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize('rot', [0.0, 30.0])
@pytest.mark.parametrize('inv', [False, True])
def test_affine_matrix_jax_closed_form(rot, inv, rng):
    from simple_hrnet_tpu.ops import affine

    for _ in range(5):
        center = rng.uniform(50, 400, 2).astype(np.float32)
        scale = rng.uniform(0.5, 3.0, 2).astype(np.float32)
        out_size = [192, 256]
        np_mat = affine.affine_matrix(center, scale, rot, out_size, 200, inv=inv)
        jx_mat = np.asarray(affine.affine_matrix_jax(center, scale, rot,
                                                     out_size, 200, inv=inv))
        np.testing.assert_allclose(jx_mat, np_mat, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _rand_heatmaps(rng, n=3, j=17, h=64, w=48):
    hm = rng.standard_normal((n, j, h, w)).astype(np.float32)
    return hm


def test_get_max_preds_parity(rng):
    import torch
    ref_utils = _import_ref_utils()
    from simple_hrnet_tpu.ops import decode

    hm = _rand_heatmaps(rng)
    ref_preds, ref_maxvals = ref_utils.get_max_preds(torch.from_numpy(hm))
    preds, maxvals = decode.get_max_preds(np.transpose(hm, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(preds), ref_preds.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(maxvals), ref_maxvals.numpy(), atol=1e-6)


def test_get_final_preds_parity(rng):
    import torch
    ref_utils = _import_ref_utils()
    from simple_hrnet_tpu.ops import decode

    hm = _rand_heatmaps(rng)
    center = rng.uniform(100, 300, (3, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (3, 2)).astype(np.float32)

    ref_preds, ref_maxvals = ref_utils.get_final_preds(
        True, torch.from_numpy(hm), center, scale, 200)
    preds, maxvals = decode.get_final_preds(
        np.transpose(hm, (0, 2, 3, 1)), center, scale, 200)
    np.testing.assert_allclose(np.asarray(preds), ref_preds.numpy(),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(maxvals), ref_maxvals.numpy(), atol=1e-6)


def test_argmax_decode_matches_reference_loop(rng):
    """Reproduce SimpleHRNet.py:299-308 decode arithmetic exactly."""
    from simple_hrnet_tpu.ops import decode

    hm = _rand_heatmaps(rng, n=4)
    boxes = np.stack([
        rng.uniform(0, 100, 4),
        rng.uniform(0, 100, 4),
        rng.uniform(150, 300, 4),
        rng.uniform(150, 300, 4),
    ], axis=1).astype(np.float32)  # columns x1,y1,x2,y2

    n, j, h, w = hm.shape
    expected = np.empty((n, j, 3), np.float32)
    for i, human in enumerate(hm):
        for jj, joint in enumerate(human):
            pt = np.unravel_index(np.argmax(joint), (h, w))
            expected[i, jj, 0] = pt[0] / h * (boxes[i][3] - boxes[i][1]) + boxes[i][1]
            expected[i, jj, 1] = pt[1] / w * (boxes[i][2] - boxes[i][0]) + boxes[i][0]
            expected[i, jj, 2] = joint[pt]

    got = np.asarray(decode.argmax_decode(np.transpose(hm, (0, 2, 3, 1)), boxes))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_flip_back_parity(rng):
    import torch
    ref_utils = _import_ref_utils()
    from simple_hrnet_tpu.ops import decode

    pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]
    hm = _rand_heatmaps(rng)
    ref = ref_utils.flip_back(torch.from_numpy(hm.copy()), pairs).numpy()
    got = np.asarray(decode.flip_back(np.transpose(hm, (0, 2, 3, 1)), pairs))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-6)


# ---------------------------------------------------------------------------
# Image ops
# ---------------------------------------------------------------------------

def test_crop_resize_matches_cv2(rng):
    import cv2
    from simple_hrnet_tpu.ops import image as I

    img = (rng.uniform(0, 255, (240, 320, 3))).astype(np.float32)
    box = np.array([40.0, 30.0, 200.0, 180.0], np.float32)
    out_hw = (96, 72)

    crop = img[30:180, 40:200]
    ref = cv2.resize(crop, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(I.crop_resize(img, box, out_hw))
    # interior pixels match cv2 bilinear to float tolerance
    np.testing.assert_allclose(got[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-2)


def test_resize_bilinear_aa_matches_pil(rng):
    """resize_bilinear_aa == PIL Image.resize(BILINEAR) (the reference's
    transforms.Resize resampler, SimpleHRNet.py:167-172) on float images,
    both downscale (antialiased) and upscale."""
    from PIL import Image

    from simple_hrnet_tpu.ops import image as I

    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    for out_hw in [(20, 28), (96, 128), (30, 100)]:
        got = np.asarray(I.resize_bilinear_aa(img, out_hw))
        for ch in range(3):
            ref = np.asarray(Image.fromarray(img[..., ch], mode='F').resize(
                (out_hw[1], out_hw[0]), Image.BILINEAR))
            np.testing.assert_allclose(got[..., ch], ref, atol=1e-3)
    # batch (NHWC) path agrees with per-image
    batch = rng.uniform(0, 255, (2, 48, 64, 3)).astype(np.float32)
    gb = np.asarray(I.resize_bilinear_aa(batch, (20, 28)))
    g0 = np.asarray(I.resize_bilinear_aa(batch[0], (20, 28)))
    np.testing.assert_allclose(gb[0], g0, atol=1e-4)


def test_crop_resize_out_of_bounds_zero_fill(rng):
    from simple_hrnet_tpu.ops import image as I

    img = np.ones((100, 100, 3), np.float32) * 200.0
    box = np.array([-50.0, -50.0, 50.0, 50.0], np.float32)
    got = np.asarray(I.crop_resize(img, box, (100, 100)))
    assert got[:48, :48].max() == 0.0          # padded region is zero
    assert got[52:, 52:].min() > 199.0         # in-image region preserved


def test_warp_affine_matches_cv2(rng):
    import cv2
    from simple_hrnet_tpu.ops import affine
    from simple_hrnet_tpu.ops import image as I

    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    center = np.array([160.0, 120.0], np.float32)
    scale = np.array([1.0, 1.3], np.float32)
    rot = 25.0
    out_size = (192, 256)  # (w, h)

    fwd = affine.affine_matrix(center, scale, rot, out_size, 200)
    inv = affine.affine_matrix(center, scale, rot, out_size, 200, inv=True)
    ref = cv2.warpAffine(img, fwd, out_size, flags=cv2.INTER_LINEAR)
    got = np.asarray(I.warp_affine(img, inv, (out_size[1], out_size[0])))
    # tolerate boundary rows where cv2's border handling differs
    diff = np.abs(got - ref)
    assert np.quantile(diff, 0.99) < 1.0
    assert diff.mean() < 0.2


def test_pad_to_aspect_matches_reference_int_arithmetic(rng):
    from simple_hrnet_tpu.ops import image as I

    res_h, res_w = 384, 288
    aspect = res_h / res_w
    boxes = []
    expected = []
    for _ in range(50):
        x1, y1 = rng.integers(0, 200, 2)
        x2 = x1 + rng.integers(20, 300)
        y2 = y1 + rng.integers(20, 300)
        boxes.append([x1, y1, x2, y2])
        # reference SimpleHRNet.py:243-272
        correction_factor = res_h / res_w * (x2 - x1) / (y2 - y1)
        if correction_factor > 1:
            center = y1 + (y2 - y1) // 2
            length = int(round((y2 - y1) * correction_factor))
            expected.append([x1, center - length // 2, x2, center + length // 2])
        elif correction_factor < 1:
            center = x1 + (x2 - x1) // 2
            length = int(round((x2 - x1) / correction_factor))
            expected.append([center - length // 2, y1, center + length // 2, y2])
        else:
            expected.append([x1, y1, x2, y2])

    got = np.asarray(I.pad_to_aspect(np.asarray(boxes, np.float32), aspect))
    np.testing.assert_allclose(got, np.asarray(expected, np.float32), atol=1.0)
    # exact match in the vast majority of cases (banker's rounding edge cases aside)
    exact = np.mean(np.all(got == np.asarray(expected, np.float32), axis=1))
    assert exact > 0.9


def test_winograd_conv_matches_direct(rng):
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.ops import winograd as W

    x = jnp.asarray(rng.standard_normal((2, 16, 12, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 6)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = W.conv3x3_winograd(x, W.transform_kernel(k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_resize_linear_upscale_matches_cv2(rng):
    """Whole-frame resize_linear == cv2.INTER_LINEAR including the UPSCALE
    border (edge-clamped taps; the gather-based fallback zero-fills there,
    which is why the facade's 'linear' mode must route here)."""
    import cv2
    import jax.numpy as jnp
    from simple_hrnet_tpu.ops import image as I

    img = rng.uniform(0, 255, (24, 18, 3)).astype(np.float32)
    out = np.asarray(I.resize_linear(jnp.asarray(img), (96, 72)))
    ref = cv2.resize(img, (72, 96), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(out, ref, atol=2e-4)
