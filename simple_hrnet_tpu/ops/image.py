"""On-device image preprocessing: crop / resize / normalize / warp.

The reference does all of this per box on the host with cv2/PIL inside a
Python loop (SimpleHRNet.py:237-278) — the single biggest throughput sink of
its pipeline. Here a whole frame is shipped to the TPU once (uint8) and all
person crops are produced by one vmapped gather-based sampler, fused by XLA
with the normalization, so multi-person preprocessing is a single device
computation with static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics (reference SimpleHRNet.py:152, 171).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(x: jnp.ndarray, *, scale: float = 1.0 / 255.0) -> jnp.ndarray:
    """uint8/float [0,255] HWC/NHWC RGB -> ImageNet-normalized float32."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x.astype(jnp.float32) * scale - mean) / std


def _bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                     fill: float = 0.0) -> jnp.ndarray:
    """Bilinear sampling of HWC ``image`` at float coords, zero-filled
    outside (matches the reference's zero padding of out-of-image crop
    regions, SimpleHRNet.py:246-276)."""
    h, w = image.shape[0], image.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v.astype(jnp.float32), fill)

    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def crop_resize(image: jnp.ndarray, box: jnp.ndarray,
                out_hw: Tuple[int, int],
                valid_box: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Crop ``box`` (x1, y1, x2, y2 float) from HWC image and bilinearly
    resize to ``out_hw`` on device (half-pixel-center convention — the
    cv2.resize INTER_LINEAR sampling grid; NOTE the reference resizes crops
    through PIL transforms.Resize, which antialiases when downscaling, so
    crops from boxes larger than the input resolution differ slightly — a
    deliberate deviation, see PARITY.md). Regions outside the image are
    zero — equivalent to the reference's np.pad + crop.

    ``valid_box``: if given, samples falling outside it are zeroed even when
    inside the image. This reproduces the reference's aspect-ratio padding
    quirk (SimpleHRNet.py:246-276): the crop is taken from the ORIGINAL
    detection box and zero-padded to aspect, so expanded regions are black
    even where the frame has content (a deliberate guard against
    cross-person keypoints, per the comment at SimpleHRNet.py:246).
    """
    oh, ow = out_hw
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    sy = (y2 - y1) / oh
    sx = (x2 - x1) / ow
    ys = y1 + (jnp.arange(oh, dtype=jnp.float32)[:, None] + 0.5) * sy - 0.5
    xs = x1 + (jnp.arange(ow, dtype=jnp.float32)[None, :] + 0.5) * sx - 0.5
    ys = jnp.broadcast_to(ys, (oh, ow))
    xs = jnp.broadcast_to(xs, (oh, ow))
    out = _bilinear_sample(image, ys, xs)
    if valid_box is not None:
        inside = ((xs >= valid_box[0] - 0.5) & (xs <= valid_box[2] - 0.5) &
                  (ys >= valid_box[1] - 0.5) & (ys <= valid_box[3] - 0.5))
        out = jnp.where(inside[..., None], out, 0.0)
    return out


def crop_resize_batch(image: jnp.ndarray, boxes: jnp.ndarray,
                      out_hw: Tuple[int, int]) -> jnp.ndarray:
    """vmapped multi-person crop: (H, W, C) + (P, 4) -> (P, oh, ow, C)."""
    return jax.vmap(lambda b: crop_resize(image, b, out_hw))(boxes)


def warp_affine(image: jnp.ndarray, inv_mat: jnp.ndarray,
                out_hw: Tuple[int, int], fill: float = 0.0) -> jnp.ndarray:
    """General affine warp (bilinear), given the INVERSE map (dst -> src).

    Device equivalent of cv2.warpAffine(..., INTER_LINEAR) with constant-0
    border as used for training crops (reference datasets/COCO.py:291-296 via
    utils.get_affine_transform); cv2 inverts the forward matrix internally —
    pass ``affine.affine_matrix(..., inv=True)`` here.
    """
    oh, ow = out_hw
    ys = jnp.broadcast_to(jnp.arange(oh, dtype=jnp.float32)[:, None], (oh, ow))
    xs = jnp.broadcast_to(jnp.arange(ow, dtype=jnp.float32)[None, :], (oh, ow))
    src_x = inv_mat[0, 0] * xs + inv_mat[0, 1] * ys + inv_mat[0, 2]
    src_y = inv_mat[1, 0] * xs + inv_mat[1, 1] * ys + inv_mat[1, 2]
    return _bilinear_sample(image, src_y, src_x, fill=fill)


@partial(jax.jit, static_argnames=('out_hw',))
def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Whole-image bilinear resize (HWC or NHWC)."""
    if image.ndim == 3:
        return crop_resize(image, jnp.array(
            [0.0, 0.0, float(image.shape[1]), float(image.shape[0])]), out_hw)
    return jax.vmap(lambda im: crop_resize(im, jnp.array(
        [0.0, 0.0, float(image.shape[2]), float(image.shape[1])]), out_hw))(image)


def _cubic_weights(in_size: int, out_size: int, a: float = -0.75) -> 'np.ndarray':
    """Dense (out, in) bicubic interpolation matrix with cv2's kernel (a=-0.75)
    and border clamping — bit-compatible with cv2.resize INTER_CUBIC.

    Expressing the resize as two dense matmuls maps straight onto the MXU
    (vs a gather) and is built once per static shape at trace time.
    """
    import numpy as np

    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        frac = src - base
        for t in range(-1, 3):
            d = abs(frac - t)
            if d <= 1:
                k = (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
            elif d < 2:
                k = a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
            else:
                k = 0.0
            w[i, min(max(base + t, 0), in_size - 1)] += k
    return w


def resize_cubic(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_CUBIC-exact bicubic resize as two dense matmuls (HWC/NHWC).

    The facade's single-person whole-frame path (reference
    SimpleHRNet.py:216-220) uses this to match the reference pixel pipeline.
    """
    in_hw = image.shape[-3:-1]
    wh = jnp.asarray(_cubic_weights(in_hw[0], out_hw[0]))
    ww = jnp.asarray(_cubic_weights(in_hw[1], out_hw[1]))
    x = image.astype(jnp.float32)
    # rows: (..., H, W, C) -> (..., oh, W, C)
    x = jnp.einsum('oh,...hwc->...owc', wh, x)
    x = jnp.einsum('pw,...hwc->...hpc', ww, x)
    return x


def _linear_aa_weights(in_size: int, out_size: int) -> 'np.ndarray':
    """Dense (out, in) PIL-convention antialiased bilinear matrix.

    Reproduces Pillow's ``precompute_coeffs`` (src/libImaging/Resample.c)
    for the triangle filter: the kernel widens by the downscale factor
    (area-weighted averaging), weights are normalized per output pixel, and
    window bounds are computed with PIL's ``int(x + 0.5)`` rounding. On
    upscales (scale <= 1) this degenerates to plain half-pixel-center
    bilinear. This is what the reference's ``transforms.Resize`` does to
    PIL images (SimpleHRNet.py:167-172) — see PARITY.md #6.
    """
    import numpy as np

    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = filterscale  # bilinear filter support = 1.0
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax)
        k = 1.0 - np.abs((xs - center + 0.5) / filterscale)
        k = np.maximum(k, 0.0)
        s = k.sum()
        if s != 0.0:
            k /= s
        w[i, xmin:xmax] = k
    return w.astype(np.float32)


def resize_bilinear_aa(image: jnp.ndarray,
                       out_hw: Tuple[int, int]) -> jnp.ndarray:
    """PIL-equivalent antialiased bilinear resize (HWC/NHWC, static shapes).

    Two dense matmuls (MXU-friendly, built once per shape at trace time),
    matching ``PIL.Image.resize(..., BILINEAR)`` / torchvision
    ``transforms.Resize`` on float images to ~1e-5 (PIL's uint8 path adds
    int16 fixed-point rounding on top). Closes the PARITY.md #6 deviation
    for whole-frame resizes; enable via ``SimpleHRNet(interpolation=
    'bilinear_aa')``.
    """
    in_hw = image.shape[-3:-1]
    wh = jnp.asarray(_linear_aa_weights(in_hw[0], out_hw[0]))
    ww = jnp.asarray(_linear_aa_weights(in_hw[1], out_hw[1]))
    x = image.astype(jnp.float32)
    x = jnp.einsum('oh,...hwc->...owc', wh, x)
    x = jnp.einsum('pw,...hwc->...hpc', ww, x)
    return x


def pad_to_aspect(boxes: jnp.ndarray, aspect: float,
                  clamp_hw: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Expand xyxy boxes (float) to the target height/width aspect ratio.

    Device-side equivalent of the reference's correction_factor logic
    (SimpleHRNet.py:243-272): the box is symmetrically grown along the
    deficient axis; the (possibly out-of-image) padded region samples as
    zeros in crop_resize, matching np.pad semantics.

    ``clamp_hw``: the reference's BATCH path (SimpleHRNet.py:393-407) instead
    clamps the grown coordinates to the image bounds — max(0, lo), min(H|W,
    hi) — and crops real pixels. Pass (H, W) to reproduce that; only the
    grown axis is clamped, the other axis keeps the raw detector box exactly
    as the reference does.

    The reference computes, in ints: length = round(side * f); new bounds =
    center -/+ length // 2 with center = lo + side // 2. We reproduce that
    arithmetic (including the floor-divides) so decoded keypoints match.
    """
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    w = x2 - x1
    h = y2 - y1
    correction = aspect * w / jnp.maximum(h, 1e-6)

    # correction > 1 -> grow y side
    cy = y1 + jnp.floor(h / 2)
    ly = jnp.round(h * correction)
    y1_new = cy - jnp.floor(ly / 2)
    y2_new = cy + jnp.floor(ly / 2)
    # correction < 1 -> grow x side
    cx = x1 + jnp.floor(w / 2)
    lx = jnp.round(w / jnp.maximum(correction, 1e-6))
    x1_new = cx - jnp.floor(lx / 2)
    x2_new = cx + jnp.floor(lx / 2)

    if clamp_hw is not None:
        y1_new = jnp.maximum(y1_new, 0.0)
        y2_new = jnp.minimum(y2_new, float(clamp_hw[0]))
        x1_new = jnp.maximum(x1_new, 0.0)
        x2_new = jnp.minimum(x2_new, float(clamp_hw[1]))

    grow_y = correction > 1
    grow_x = correction < 1
    return jnp.stack([
        jnp.where(grow_x, x1_new, x1),
        jnp.where(grow_y, y1_new, y1),
        jnp.where(grow_x, x2_new, x2),
        jnp.where(grow_y, y2_new, y2),
    ], axis=1)
