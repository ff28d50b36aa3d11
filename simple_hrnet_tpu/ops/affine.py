"""Affine transform construction — exact re-derivation of the reference's
center/scale/rotation geometry, in closed form (no cv2 dependency on the
device path).

The reference builds a 2x3 warp matrix from three point correspondences via
``cv2.getAffineTransform`` (misc/utils.py:46-75). The three points are:
  src0 = center + scale_tmp * shift
  src1 = src0 + R(rot) @ [0, -src_w/2]
  src2 = src1 + perp(src0 - src1)
  dst0 = [dst_w/2, dst_h/2]; dst1 = dst0 + [0, -dst_w/2]; dst2 = ... same rule
Because the construction is a similarity transform (rotation + isotropic-x
scale + translation), the matrix has the closed form derived here, which we
verify against cv2 in tests to float precision.

Both a numpy (host, trace-free) and a jnp (device, jit/vmap-able) version are
provided.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _three_points(center, scale, rot, output_size, pixel_std, shift):
    """The exact three src/dst points the reference feeds cv2 (utils.py:56-68)."""
    scale_tmp = np.asarray(scale, np.float32) * float(pixel_std)
    src_w = scale_tmp[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([src_w * 0.5 * sn, src_w * -0.5 * cs], np.float32)
    dst_dir = np.array([0.0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = np.asarray(center, np.float32) + scale_tmp * np.asarray(shift, np.float32)
    src[1] = src[0] + src_dir
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    d = src[0] - src[1]
    src[2] = src[1] + np.array([-d[1], d[0]], np.float32)
    d = dst[0] - dst[1]
    dst[2] = dst[1] + np.array([-d[1], d[0]], np.float32)
    return src, dst


def affine_matrix(center, scale, rot, output_size, pixel_std=200.0,
                  shift=(0.0, 0.0), inv=False) -> np.ndarray:
    """2x3 affine matrix, identical to reference get_affine_transform.

    Solved exactly from the three-point correspondence (what
    cv2.getAffineTransform does internally).
    """
    src, dst = _three_points(center, scale, rot, output_size, pixel_std, shift)
    if inv:
        src, dst = dst, src
    # Solve A @ [src; 1] = dst for the 2x3 matrix A.
    m = np.concatenate([src, np.ones((3, 1), np.float32)], axis=1)  # (3,3)
    sol = np.linalg.solve(m, dst)  # (3, 2)
    return sol.T.astype(np.float32)  # (2, 3)


def affine_matrix_jax(center, scale, rot, output_size, pixel_std=200.0,
                      inv=False) -> jnp.ndarray:
    """jnp version (closed form, jit/vmap-friendly; shift fixed at 0).

    For the reference's construction the forward map is
        dst = R(-rot)·diag(k,k)·(p - src0) + dst0
    with k = dst_w / src_w (similarity transform), so the closed form avoids a
    linear solve per box.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    src_w = scale[0] * pixel_std
    dst_w = float(output_size[0])
    dst_h = float(output_size[1])
    k = dst_w / src_w
    rot_rad = jnp.asarray(rot, jnp.float32) * (jnp.pi / 180.0)
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    # forward rotation applied to src offsets is R(rot) (see _three_points);
    # mapping src->dst therefore uses R(rot)^-1 scaled by k.
    rotm = jnp.array([[cs, sn], [-sn, cs]], jnp.float32) * k
    dst0 = jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32)
    if inv:
        # p_src = R(rot)·(p_dst - dst0)/k + src0
        rinv = jnp.array([[cs, -sn], [sn, cs]], jnp.float32) / k
        t = center - rinv @ dst0
        return jnp.concatenate([rinv, t[:, None]], axis=1)
    t = dst0 - rotm @ center
    return jnp.concatenate([rotm, t[:, None]], axis=1)


def apply_affine(points: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply a 2x3 matrix to (..., 2) points (reference utils.py:78-81)."""
    pts = np.asarray(points, np.float32)
    return pts @ mat[:, :2].T + mat[:, 2]
