"""Gaussian heatmap target generation (reference datasets/COCO.py:460-515).

Two implementations with identical semantics:
  * ``generate_target``        — host numpy, exact port (used by the data
                                 pipeline workers, like the reference).
  * ``generate_target_device`` — batched jnp version for fully on-device
                                 training pipelines (vectorized over joints).

Semantics: an unnormalized gaussian (peak 1) of sigma ``heatmap_sigma`` is
stamped at the stride-quantized joint position; joints whose gaussian falls
completely outside the heatmap get weight 0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

COCO_JOINTS_WEIGHT = np.asarray(
    [1., 1., 1., 1., 1., 1., 1., 1.2, 1.2, 1.5, 1.5, 1., 1., 1.2, 1.2,
     1.5, 1.5], np.float32).reshape(17, 1)


def generate_target(joints: np.ndarray, joints_vis: np.ndarray,
                    heatmap_size: Tuple[int, int],
                    image_size: Tuple[int, int],
                    heatmap_sigma: float = 3,
                    joints_weight: Optional[np.ndarray] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact port of COCODataset._generate_target.

    Args:
      joints: (J, 2) xy in image coords; joints_vis: (J, 2).
      heatmap_size / image_size: (width, height) tuples — the reference's
        convention (COCO.py:105-107).

    Returns (target (J, hm_h, hm_w) float32, target_weight (J, 1)).
    """
    nof_joints = joints.shape[0]
    target_weight = np.ones((nof_joints, 1), np.float32)
    target_weight[:, 0] = joints_vis[:, 0]

    target = np.zeros((nof_joints, heatmap_size[1], heatmap_size[0]),
                      np.float32)
    tmp_size = heatmap_sigma * 3

    for joint_id in range(nof_joints):
        feat_stride = np.asarray(image_size) / np.asarray(heatmap_size)
        mu_x = int(joints[joint_id][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[joint_id][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= heatmap_size[0] or ul[1] >= heatmap_size[1] \
                or br[0] < 0 or br[1] < 0:
            target_weight[joint_id] = 0
            continue

        size = int(2 * tmp_size + 1)
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(- ((x - x0) ** 2 + (y - y0) ** 2) / (2 * heatmap_sigma ** 2))

        g_x = max(0, -ul[0]), min(br[0], heatmap_size[0]) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], heatmap_size[1]) - ul[1]
        img_x = max(0, ul[0]), min(br[0], heatmap_size[0])
        img_y = max(0, ul[1]), min(br[1], heatmap_size[1])

        if target_weight[joint_id] > 0.5:
            target[joint_id][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]

    if joints_weight is not None:
        target_weight = np.multiply(target_weight, joints_weight)

    return target, target_weight


def generate_target_device(joints: jnp.ndarray, joints_vis: jnp.ndarray,
                           heatmap_size: Tuple[int, int],
                           image_size: Tuple[int, int],
                           heatmap_sigma: float = 3
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized device version: (N, J, 2) -> (N, hm_h, hm_w, J) NHWC.

    Identical stride quantization (int truncation of x/stride + 0.5) and
    out-of-bounds weighting as the host version, computed densely — a
    (hm_h*hm_w) gaussian per joint is cheap on the VPU and removes the host
    target generation from the training step entirely.
    """
    hm_w, hm_h = heatmap_size
    stride = (jnp.asarray(image_size, jnp.float32) /
              jnp.asarray(heatmap_size, jnp.float32))
    tmp_size = heatmap_sigma * 3
    if tmp_size != int(tmp_size):
        # The host/reference semantics for fractional sigma*3 are not
        # replicable: int() truncation toward zero shifts the stamp window
        # by one near the top/left edge, and for frac(sigma*3) < 0.5 the
        # int(2*tmp_size+1)-wide gaussian is narrower than the
        # br-ul window, which crashes the host slice assignment for
        # interior joints. Use host targets for fractional sigma.
        raise ValueError(
            f'generate_target_device requires heatmap_sigma*3 to be an '
            f'integer (got sigma={heatmap_sigma!r}); the reference '
            f'stamping (COCO.py:460-515) is ill-defined for fractional '
            f'windows — use host-side targets (device_targets=False).')

    # reference: int(x/stride + 0.5) — truncation toward zero, not floor
    mu = jnp.trunc(joints / stride + 0.5).astype(jnp.int32)  # (N, J, 2)
    ul = mu - int(tmp_size)
    br = mu + int(tmp_size + 1)
    oob = ((ul[..., 0] >= hm_w) | (ul[..., 1] >= hm_h) |
           (br[..., 0] < 0) | (br[..., 1] < 0))
    weight = joints_vis[..., 0] * (~oob).astype(jnp.float32)  # (N, J)

    xs = jnp.arange(hm_w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(hm_h, dtype=jnp.float32)[None, None, :]
    gx = jnp.exp(-jnp.square(xs - mu[..., 0:1]) / (2 * heatmap_sigma ** 2))
    gy = jnp.exp(-jnp.square(ys - mu[..., 1:2]) / (2 * heatmap_sigma ** 2))
    # truncate beyond the reference's stamp window (3 sigma box)
    gx = gx * (jnp.abs(xs - mu[..., 0:1]) <= tmp_size)
    gy = gy * (jnp.abs(ys - mu[..., 1:2]) <= tmp_size)
    target = gy[:, :, :, None] * gx[:, :, None, :]           # (N, J, H, W)
    target = target * (weight[..., None, None] > 0.5)
    return target.transpose(0, 2, 3, 1), weight[..., None]
