"""Heatmap -> keypoint decoding, fully vectorized for XLA.

Replaces the reference's per-person/per-joint Python loops with batched
jnp ops so decode runs on-device as part of one jitted pipeline:

  * ``argmax_decode``      — the SimpleHRNet.predict flavour: plain argmax
                             scaled into the bounding-box frame
                             (reference SimpleHRNet.py:299-308).
  * ``get_max_preds``      — (x, y) argmax + maxvals with the >0 mask
                             (reference misc/utils.py:125-151).
  * ``get_final_preds``    — +-0.25 subpixel shift by gradient sign, then
                             inverse-affine back to original image coords
                             (reference misc/utils.py:154-182).
  * ``flip_back``          — horizontal heatmap flip + L/R joint swap for
                             flip-test averaging (reference misc/utils.py:19-29).

All functions take NHWC-ordered heatmaps as produced by our models:
``(N, H, W, J)``; the reference's NCHW convention is handled by the facade.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops.affine import affine_matrix_jax


def get_max_preds(heatmaps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax decode. heatmaps: (N, H, W, J) -> preds (N, J, 2) xy, maxvals (N, J, 1).

    Matches reference utils.py:125-151 exactly, including zeroing predictions
    whose peak value is <= 0.
    """
    n, h, w, j = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.take_along_axis(flat, idx[..., None], axis=2)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    preds = preds * (maxvals > 0.0).astype(jnp.float32)
    return preds, maxvals


def argmax_decode(heatmaps: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """SimpleHRNet.predict decode: (N,H,W,J) + boxes (N,4 xyxy) -> (N,J,3) (y,x,conf).

    pt_y = row / H * (y2 - y1) + y1 ; pt_x = col / W * (x2 - x1) + x1
    (reference SimpleHRNet.py:302-308 — note: plain argmax, NO subpixel).
    """
    n, h, w, j = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    conf = jnp.take_along_axis(flat, idx[..., None], axis=2)[..., 0]
    row = jnp.floor(idx.astype(jnp.float32) / w)
    col = (idx % w).astype(jnp.float32)
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    pt_y = row / h * (y2 - y1)[:, None] + y1[:, None]
    pt_x = col / w * (x2 - x1)[:, None] + x1[:, None]
    return jnp.stack([pt_y, pt_x, conf], axis=-1)


def subpixel_refine(heatmaps: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Shift each coord by 0.25 * sign of the local heatmap gradient.

    Applied only when the (rounded) peak is strictly inside the border
    (reference utils.py:161-174: ``1 < px < width-1 and 1 < py < height-1``).
    coords: (N, J, 2) in xy order.
    """
    n, h, w, j = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2)  # (N, J, H, W)
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    inside = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    def gather(hm_j, yy, xx):
        return hm_j[yy, xx]

    gather_b = jax.vmap(jax.vmap(gather))
    dx = (gather_b(hm, pyc, pxc + 1) - gather_b(hm, pyc, pxc - 1))
    dy = (gather_b(hm, pyc + 1, pxc) - gather_b(hm, pyc - 1, pxc))
    diff = jnp.stack([dx, dy], axis=-1)
    shift = jnp.sign(diff) * 0.25 * inside[..., None].astype(jnp.float32)
    return coords + shift


def transform_preds(coords: jnp.ndarray, center: jnp.ndarray,
                    scale: jnp.ndarray, pixel_std: float,
                    output_size: Sequence[int]) -> jnp.ndarray:
    """Map heatmap-space coords back to original image coords.

    Vectorized equivalent of reference utils.py:116-122 (rot=0 inverse
    affine). coords: (N, J, 2); center/scale: (N, 2).
    """
    mats = jax.vmap(
        lambda c, s: affine_matrix_jax(c, s, 0.0, output_size, pixel_std,
                                       inv=True))(center, scale)
    ones = jnp.ones(coords.shape[:-1] + (1,), coords.dtype)
    homo = jnp.concatenate([coords, ones], axis=-1)  # (N, J, 3)
    return jnp.einsum('nij,nkj->nki', mats, homo)


def get_final_preds(heatmaps: jnp.ndarray, center: jnp.ndarray,
                    scale: jnp.ndarray, pixel_std: float = 200.0,
                    post_processing: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full decode used by training/eval (reference utils.py:154-182).

    heatmaps: (N, H, W, J) NHWC. Returns (preds (N,J,2) xy in original image
    coords, maxvals (N,J,1)).
    """
    coords, maxvals = get_max_preds(heatmaps)
    if post_processing:
        coords = subpixel_refine(heatmaps, coords)
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    preds = transform_preds(coords, center, scale, pixel_std, [w, h])
    return preds, maxvals


def flip_back(heatmaps: jnp.ndarray,
              matched_parts: Sequence[Tuple[int, int]]) -> jnp.ndarray:
    """Un-flip heatmaps of a horizontally flipped input (NHWC).

    Width-reverses and swaps each L/R joint pair (reference utils.py:19-29).
    """
    flipped = heatmaps[:, :, ::-1, :]
    perm = list(range(flipped.shape[-1]))
    for a, b in matched_parts:
        perm[a], perm[b] = perm[b], perm[a]
    return flipped[..., jnp.array(perm)]


def flip_test_average(heatmaps: jnp.ndarray, heatmaps_flipped: jnp.ndarray,
                      matched_parts: Sequence[Tuple[int, int]],
                      shift: bool = False) -> jnp.ndarray:
    """Average normal + un-flipped heatmaps (reference testing/Test.py:134-141).

    The reference does NOT apply the official implementation's one-pixel
    feature shift; pass ``shift=True`` to enable it (it slightly improves AP
    by compensating the flip's half-pixel feature offset).
    """
    back = flip_back(heatmaps_flipped, matched_parts)
    if shift:
        back = jnp.concatenate([back[:, :, :1, :], back[:, :, :-1, :]], axis=2)
    return (heatmaps + back) * 0.5
