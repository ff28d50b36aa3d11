"""Pallas TPU greedy NMS kernel.

The reference ships a CUDA bitmask NMS (misc/nms/nms_kernel.cu:33-77:
64-thread blocks compute IoU row/col tiles into uint64 masks, host-side
greedy reduce). The TPU-native equivalent below keeps the same two-phase
idea mapped onto the VPU:

  phase 1 — one fused pass computes the full (N, N) "suppresses" mask with
            8x128-lane vector ops (the bitmask analogue; bools in VMEM
            instead of packed uint64 because VREGs are already 8x128);
  phase 2 — the greedy reduce runs ON-CHIP in the same kernel as a
            fori_loop over output slots (max-score select + row
            suppression), so no host round-trip at all — the CUDA version
            still reduced on the host.

Mosaic constraints shaping the code: no dynamic indexing of *values*
(argmax -> max + first-equal-index via iota/where; selected mask row read
through ``ref[pl.ds(i, 1), :]``), scalar outputs in SMEM, 2-D vector
shapes. Everything lives in VMEM (N <= ~2048: N*N bools + N*4 floats
<< 16MB). Results match ops/nms.nms_jax exactly (parity-tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, scores_ref, thresh_ref, keep_idx_ref,
                keep_valid_ref, mask_ref, alive_ref):
    """boxes (N, 4), scores (1, N), thresh (1, 1) -> keep slots in SMEM."""
    n = boxes_ref.shape[0]
    max_out = keep_idx_ref.shape[0]
    boxes = boxes_ref[:]
    scores = scores_ref[:]                     # (1, N)
    thresh = thresh_ref[0, 0]

    # Phase 1: full pairwise "IoU > thresh" mask (VPU, fused, no divides).
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, xx2 - xx1) * jnp.maximum(0.0, yy2 - yy1)
    union = areas[:, None] + areas[None, :] - inter
    mask_ref[:] = inter > thresh * union

    # Phase 2: greedy reduce on-chip. The alive mask lives in a VMEM
    # scratch as float32 (Mosaic cannot carry bool vectors through scf.for).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    alive_ref[:] = (scores > 0.0).astype(jnp.float32)

    def body(i, _):
        alive = alive_ref[:] > 0.5
        masked = jnp.where(alive, scores, -jnp.inf)        # (1, N)
        best_val = jnp.max(masked)
        ok = best_val > 0.0
        best = jnp.min(jnp.where(masked == best_val, col_ids, n))
        keep_idx_ref[i] = jnp.where(ok, best, 0)
        keep_valid_ref[i] = ok.astype(jnp.int32)
        row = mask_ref[pl.ds(best, 1), :]                  # (1, N)
        keep_alive = alive & ~(row | (col_ids == best)) & ok
        alive_ref[:] = keep_alive.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


@partial(jax.jit, static_argnames=('max_out',))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_threshold: float, max_out: int):
    """Greedy NMS fully on-chip. Same contract as ops/nms.nms_jax.

    boxes: (N, 4) xyxy float32; scores (N,) with <= 0 marking padding.
    Returns (keep_idx (max_out,) int32, keep_valid (max_out,) bool).
    """
    n = boxes.shape[0]
    thresh = jnp.asarray([[iou_threshold]], jnp.float32)
    keep_idx, keep_valid = pl.pallas_call(
        _nms_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_out,), jnp.int32),
            jax.ShapeDtypeStruct((max_out,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bool_),
                        pltpu.VMEM((1, n), jnp.float32)],
    )(boxes, scores.reshape(1, n), thresh)
    return keep_idx, keep_valid.astype(jnp.bool_)
