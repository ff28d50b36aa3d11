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
import numpy as np

# ImageNet statistics (reference SimpleHRNet.py:152, 171) — the ONE
# canonical definition; data/coco.py re-exports these.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)
IMAGENET_INV_STD = (np.float32(1.0) / IMAGENET_STD).astype(np.float32)
INV255 = np.float32(1.0) / np.float32(255.0)
# The framework-wide normalize convention is
#     (x_255 - MEAN255) * INV255_STD        [x_255 = RGB in 0..255 f32]
# — algebraically (x/255 - mean)/std, but restructured so EVERY backend
# produces the same bits:
#   * never a division: XLA strength-reduces x / const into x * (1/const)
#     with its own reciprocal, so host and in-graph divisions differ by
#     1-2 ulp, which amplifies to ~7e-4 through the conv stack
#     (root-caused in tests/diag_devt.py, round 4);
#   * never multiply-then-subtract: XLA and C compilers FMA-contract
#     a*b - c into fma(a, b, -c) (one rounding), while numpy rounds
#     twice — observed 5e-7 drift. Subtract-then-multiply cannot be
#     contracted, so host numpy, native C++ (imgproc.cpp) and jit agree
#     bitwise (tests/test_normalize_convention.py).
# The merged constants are each a single f32 rounding, shared everywhere.
MEAN255 = (IMAGENET_MEAN * np.float32(255.0)).astype(np.float32)
INV255_STD = (INV255 * IMAGENET_INV_STD).astype(np.float32)


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] HWC/NHWC RGB -> ImageNet-normalized float32.

    Subtract-then-multiply with the shared f32 constants (see module
    comment) so the fused serving path is bitwise-identical to the
    train/eval host pipeline's normalize."""
    return ((x.astype(jnp.float32) - jnp.asarray(MEAN255))
            * jnp.asarray(INV255_STD))


def _bilinear_sample(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                     fill: float = 0.0,
                     frame_index: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Bilinear sampling of HWC ``image`` at float coords, zero-filled
    outside (matches the reference's zero padding of out-of-image crop
    regions, SimpleHRNet.py:246-276). With ``frame_index``, ``image`` is
    an NHWC stack and taps gather ``image[frame_index, y, x]`` — the
    whole-frame ``image[f]`` select this replaces materializes a frame
    copy PER CROP under vmap (measured 8x slowdown of the fused
    multi-frame graph)."""
    hdim = 0 if frame_index is None else 1
    h, w = image.shape[hdim], image.shape[hdim + 1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        if frame_index is None:
            v = image[yc, xc]
        else:
            v = image[frame_index, yc, xc]
        return jnp.where(valid[..., None], v.astype(jnp.float32), fill)

    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def crop_resize(image: jnp.ndarray, box: jnp.ndarray,
                out_hw: Tuple[int, int],
                valid_box: Optional[jnp.ndarray] = None,
                frame_index: Optional[jnp.ndarray] = None) -> jnp.ndarray:
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
    out = _bilinear_sample(image, ys, xs, frame_index=frame_index)
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


def _linear_weights(in_size: int, out_size: int) -> 'np.ndarray':
    """Dense (out, in) bilinear matrix: half-pixel centers, edge clamp —
    cv2.resize INTER_LINEAR arithmetic (float path).

    Same MXU-matmul formulation as ``_cubic_weights``: on TPU a gather-
    based sampler costs ~3 orders of magnitude more than two dense
    matmuls at these shapes (PERF.md crop measurements: 3100 us vs
    5.5 us per 384x288 crop)."""
    import numpy as np

    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        frac = src - base
        w[i, min(max(base, 0), in_size - 1)] += 1.0 - frac
        w[i, min(max(base + 1, 0), in_size - 1)] += frac
    return w


def resize_linear(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-equivalent bilinear resize as two dense matmuls
    (HWC/NHWC), built once per static shape at trace time."""
    wh = jnp.asarray(_linear_weights(image.shape[-3], out_hw[0]))
    ww = jnp.asarray(_linear_weights(image.shape[-2], out_hw[1]))
    x = image.astype(jnp.float32)
    x = jnp.einsum('oh,...hwc->...owc', wh, x)
    x = jnp.einsum('pw,...hwc->...hpc', ww, x)
    return x


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


def _triangle_mass(lo: jnp.ndarray, hi: jnp.ndarray, center: jnp.ndarray,
                   fs: jnp.ndarray) -> jnp.ndarray:
    """Closed-form sum of the PIL triangle kernel over integer positions.

    mass(c) = sum over integer y in [lo, hi) of
              max(0, 1 - |y + 0.5 - c| / fs)
    evaluated per output pixel (``center`` is (O,)); needed because PIL
    normalizes its coeffs over the WHOLE crop window including regions that
    lie outside the source frame (the np.pad zero borders are real pixels
    of the PIL image), so a dense sum over frame columns would mis-scale
    edge outputs. All inputs integer-valued floats.
    """
    # support: k > 0 iff c - fs - 0.5 < y < c + fs - 0.5
    a = jnp.maximum(lo, jnp.floor(center - fs - 0.5) + 1.0)
    b = jnp.minimum(hi - 1.0, jnp.ceil(center + fs - 0.5) - 1.0)
    n = jnp.maximum(b - a + 1.0, 0.0)

    def s(p, q):  # sum of (y + 0.5 - c) for integer y in [p, q]
        m = jnp.maximum(q - p + 1.0, 0.0)
        return m * ((p + q) * 0.5 + 0.5 - center)

    mid = jnp.clip(jnp.ceil(center - 0.5) - 1.0, a - 1.0, b)  # last u<0
    sum_abs = -s(a, mid) + s(mid + 1.0, b)
    return n - sum_abs / fs


def _pil_axis_weights(lo, hi, out_size: int, n_frame: int,
                      valid_lo, valid_hi, quantize: bool, dtype):
    """Dense (out_size, n_frame) PIL ``precompute_coeffs`` matrix built
    from TRACED box bounds (integer-valued floats, frame coordinates).

    Row i holds the bilinear-AA coefficients PIL would use to produce
    output pixel i of a resize from the [lo, hi) crop window, placed at
    the source frame positions; positions outside [valid_lo, valid_hi)
    (the region with real pixels — the rest of the crop is np.pad zeros)
    or outside the frame get weight 0. ``quantize`` rounds each
    normalized coeff to PIL's 8bpc fixed point (1/2^22 —
    normalize_coeffs_8bpc in src/libImaging/Resample.c).
    """
    f = dtype
    lo = lo.astype(f)
    hi = jnp.maximum(hi.astype(f), lo + 1.0)
    size = hi - lo
    scale = size / out_size
    fs = jnp.maximum(scale, 1.0)
    i = jnp.arange(out_size, dtype=f)
    center = lo + (i + 0.5) * scale                      # (O,) frame coords
    y = jnp.arange(n_frame, dtype=f)                     # (N,)
    u = y[None, :] + 0.5 - center[:, None]
    k = jnp.maximum(0.0, 1.0 - jnp.abs(u) / fs)          # (O, N)
    in_box = (y[None, :] >= lo) & (y[None, :] <= hi - 1.0)
    k = jnp.where(in_box, k, 0.0)
    denom = _triangle_mass(lo, hi, center, fs)           # (O,)
    k = k / jnp.maximum(denom, 1e-12)[:, None]
    if quantize:
        k = jnp.floor(k * float(1 << 22) + 0.5) * (1.0 / float(1 << 22))
    in_valid = (y[None, :] >= valid_lo.astype(f)) & \
        (y[None, :] <= valid_hi.astype(f) - 1.0)
    return jnp.where(in_valid, k, 0.0)


def crop_resize_pil(image: jnp.ndarray, box: jnp.ndarray,
                    out_hw: Tuple[int, int],
                    valid_box: Optional[jnp.ndarray] = None,
                    quantize: bool = True) -> jnp.ndarray:
    """PIL-exact per-person crop: reproduces the reference's
    ``crop -> np.pad -> ToPILImage -> transforms.Resize -> ToTensor``
    pipeline (SimpleHRNet.py:237-279) fully on device for a DYNAMIC box.

    ``box``: the aspect-padded crop window (x1, y1, x2, y2, integer-valued
    floats — the reference computes them in ints); ``valid_box``: the
    original detection box holding real pixels (everything else in the
    window is np.pad zero). Implementation: the PIL ``precompute_coeffs``
    row/col coefficient matrices are built from the traced box against the
    full frame axes (static shapes) and applied as two dense matmuls —
    width pass first, then height, exactly PIL's two-pass order — with
    PIL's uint8 fixed-point semantics (coeffs quantized to 1/2^22, each
    pass rounded to uint8) when ``quantize``. Under x64 this is bit-exact
    vs PIL (every intermediate is exactly representable in f64); in f32
    (TPU production) a ~1e-7 coefficient drift can flip occasional
    round-half cases by one 8-bit count (see tests/test_crop_pil.py).
    Replaces the 4-tap ``crop_resize`` sampler when the facade is built
    with ``interpolation='bilinear_aa'`` (PARITY.md #6).
    """
    oh, ow = out_hw
    h, w = image.shape[0], image.shape[1]
    f = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    if valid_box is None:
        vx1, vy1, vx2, vy2 = x1, y1, x2, y2
    else:
        vx1, vy1, vx2, vy2 = (valid_box[i] for i in range(4))
    # The reference's numpy slice truncates the crop at the frame edge
    # BEFORE np.pad (SimpleHRNet.py:274-277, boxes are clamped at min=0
    # only — YOLOv3.py scale_coords), so a detection overhanging the
    # bottom/right shrinks the PIL source: the window's hi shifts down by
    # the overhang while the np.pad zeros keep their size.
    x2 = x2 - jnp.maximum(vx2 - w, 0.0)
    y2 = y2 - jnp.maximum(vy2 - h, 0.0)
    ww = _pil_axis_weights(x1, x2, ow, w, vx1, vx2, quantize, f)  # (ow, W)
    wh = _pil_axis_weights(y1, y2, oh, h, vy1, vy2, quantize, f)  # (oh, H)
    t = jnp.einsum('ow,hwc->hoc', ww, image.astype(f))
    if quantize:
        t = jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)
    out = jnp.einsum('qh,hoc->qoc', wh, t)
    if quantize:
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    return out.astype(jnp.float32)


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
    Precision note: the reference's f64 expressions cancel algebraically —
    round(h * correction) == round(w * aspect) and round(w / correction)
    == round(h / aspect) — and the cancelled single-multiply forms stay
    exact in this graph's f32 (the uncancelled w/correction chain was
    observed to land 1 ulp below a half-integer and flip round(), shifting
    the padded box by one pixel vs the reference).
    """
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    w = x2 - x1
    h = y2 - y1
    # sign(correction - 1) == sign(w * aspect - h); both sides are exact
    # integer-valued f32 products for realistic boxes/aspects
    cmp = w * aspect - h

    # correction > 1 -> grow y side
    cy = y1 + jnp.floor(h / 2)
    ly = jnp.round(w * aspect)
    y1_new = cy - jnp.floor(ly / 2)
    y2_new = cy + jnp.floor(ly / 2)
    # correction < 1 -> grow x side
    cx = x1 + jnp.floor(w / 2)
    lx = jnp.round(h * (1.0 / aspect))
    x1_new = cx - jnp.floor(lx / 2)
    x2_new = cx + jnp.floor(lx / 2)

    if clamp_hw is not None:
        y1_new = jnp.maximum(y1_new, 0.0)
        y2_new = jnp.minimum(y2_new, float(clamp_hw[0]))
        x1_new = jnp.maximum(x1_new, 0.0)
        x2_new = jnp.minimum(x2_new, float(clamp_hw[1]))

    grow_y = cmp > 0
    grow_x = cmp < 0
    return jnp.stack([
        jnp.where(grow_x, x1_new, x1),
        jnp.where(grow_y, y1_new, y1),
        jnp.where(grow_x, x2_new, x2),
        jnp.where(grow_y, y2_new, y2),
    ], axis=1)
