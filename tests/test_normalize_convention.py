"""One ImageNet-normalize convention across every subsystem (VERDICT r4 #4).

The convention: ``(x_255 - MEAN255) * INV255_STD`` with the SHARED
pre-merged f32 constants defined once in ops/image.py — never a division
(XLA strength-reduces ``x / const`` with its own reciprocal bits) and
never multiply-then-subtract (XLA and C compilers FMA-contract
``a*b - c`` into one rounding while numpy rounds twice). Subtract-then-
multiply is immune to both, so host numpy, native C++ (imgproc.cpp), and
in-graph jit agree BITWISE. Reference anchor: the torchvision Normalize
transform the facade mirrors, /root/reference/SimpleHRNet.py:167-172.

Pinned here: the fused serving path (ops.image.normalize under jit — what
api.py's _pose_tail and int8 calibration use), the train/eval host
pipeline (data/coco.py and data/mpii.py one-shot chain), and the
device_targets split normalize (host raw [0,255] tail +
train/steps.py in-graph completion) all produce BITWISE-identical
normalized images.
"""

import numpy as np

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops import image as I


def _host_chain(u8):
    """data/coco.py / data/mpii.py one-shot host normalize."""
    return (u8.astype(np.float32) - I.MEAN255) * I.INV255_STD


def test_constants_are_shared():
    from simple_hrnet_tpu.data import coco
    assert coco.IMAGENET_MEAN is I.IMAGENET_MEAN
    assert coco.IMAGENET_STD is I.IMAGENET_STD
    assert coco.IMAGENET_INV_STD is I.IMAGENET_INV_STD
    assert coco.MEAN255 is I.MEAN255
    assert coco.INV255_STD is I.INV255_STD
    # each merged constant is a single f32 rounding of the raw statistics
    assert I.MEAN255.dtype == np.float32
    assert I.INV255_STD.dtype == np.float32
    np.testing.assert_array_equal(I.MEAN255,
                                  I.IMAGENET_MEAN * np.float32(255.0))
    np.testing.assert_array_equal(
        I.INV255_STD, I.INV255 * (np.float32(1.0) / I.IMAGENET_STD))


def test_convention_matches_reference_arithmetic(rng):
    """(x - mean*255) * (inv255 * inv_std) is the reference's
    (x/255 - mean)/std to f32 rounding (not bitwise — that is the point:
    only the restructured form is cross-backend reproducible)."""
    u8 = rng.integers(0, 256, (4, 8, 8, 3), np.uint8)
    ref = ((u8.astype(np.float64) / 255.0 - I.IMAGENET_MEAN.astype(np.float64))
           / I.IMAGENET_STD.astype(np.float64))
    np.testing.assert_allclose(_host_chain(u8), ref, atol=2e-6)


def test_serving_normalize_bitwise_matches_host_pipeline(rng):
    u8 = rng.integers(0, 256, (5, 24, 32, 3), np.uint8)
    want = _host_chain(u8)
    # the fused serving graphs call I.normalize on f32 [0,255] crops
    # (api.py:_pose_tail); jit it exactly as they do
    got = np.asarray(jax.jit(I.normalize)(jnp.asarray(u8, jnp.float32)))
    np.testing.assert_array_equal(got, want)


def test_device_targets_split_bitwise_matches_one_shot(rng):
    u8 = rng.integers(0, 256, (3, 16, 16, 3), np.uint8)
    # host raw tail in device_targets mode (data/coco.py)
    tail = u8.astype(np.float32)
    # in-graph completion (train/steps.py:_batch_inputs)

    @jax.jit
    def in_graph(x):
        return (x - jnp.asarray(I.MEAN255)) * jnp.asarray(I.INV255_STD)

    np.testing.assert_array_equal(np.asarray(in_graph(tail)),
                                  _host_chain(u8))
