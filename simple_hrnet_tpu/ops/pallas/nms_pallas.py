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

Batching: a plain ``jax.vmap`` over ``pallas_call`` produces block specs
Mosaic rejects (a squeezed leading block dim over the SMEM outputs), so
``nms_pallas`` carries a ``custom_vmap`` rule that dispatches to an
explicitly batched variant — grid over images, outputs laid out
(B, 1, max_out) so every block's last two dims equal the array's. One
vmap level (the detector's per-image map) is supported; measured in the
YOLOv3 detect graph the batched kernel replaces ~222 us/image of
XLA-unrolled greedy NMS with ~12 us/image (PERF.md round 3).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_core(boxes, scores, thresh, n, max_out, write_slot, mask_ref,
              alive_ref):
    """Shared kernel body. boxes (N, 4), scores (1, N), thresh scalar;
    ``write_slot(i, idx, valid)`` stores output slot i."""
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
        write_slot(i, jnp.where(ok, best, 0), ok.astype(jnp.int32))
        row = mask_ref[pl.ds(best, 1), :]                  # (1, N)
        keep_alive = alive & ~(row | (col_ids == best)) & ok
        alive_ref[:] = keep_alive.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


def _nms_kernel(boxes_ref, scores_ref, thresh_ref, keep_idx_ref,
                keep_valid_ref, mask_ref, alive_ref):
    """boxes (N, 4), scores (1, N), thresh (1, 1) -> keep slots in SMEM."""

    def write_slot(i, idx, valid):
        keep_idx_ref[i] = idx
        keep_valid_ref[i] = valid

    _nms_core(boxes_ref[:], scores_ref[:], thresh_ref[0, 0],
              boxes_ref.shape[0], keep_idx_ref.shape[0], write_slot,
              mask_ref, alive_ref)


def _nms_kernel_batched(boxes_ref, scores_ref, thresh_ref, keep_idx_ref,
                        keep_valid_ref, mask_ref, alive_ref):
    """Grid-over-images blocks: boxes (1, N, 4), scores (1, 1, N),
    outputs (1, 1, max_out) SMEM slices of the (B, 1, max_out) arrays."""

    def write_slot(i, idx, valid):
        keep_idx_ref[0, 0, i] = idx
        keep_valid_ref[0, 0, i] = valid

    _nms_core(boxes_ref[0], scores_ref[0], thresh_ref[0, 0],
              boxes_ref.shape[1], keep_idx_ref.shape[2], write_slot,
              mask_ref, alive_ref)


def _nms_call(boxes, scores, thresh, max_out):
    n = boxes.shape[0]
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


def _nms_call_batched(boxes, scores, thresh, max_out):
    """boxes (B, N, 4), scores (B, N) -> ((B, max_out) idx, (B, max_out)
    valid). One grid step per image; VMEM scratch is reused across steps
    (each program fully rewrites it)."""
    b, n = scores.shape
    keep_idx, keep_valid = pl.pallas_call(
        _nms_kernel_batched,
        grid=(b,),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, max_out), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, max_out), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, max_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_out), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.bool_),
                        pltpu.VMEM((1, n), jnp.float32)],
    )(boxes, scores.reshape(b, 1, n), thresh)
    return keep_idx[:, 0], keep_valid[:, 0].astype(jnp.bool_)


@lru_cache(maxsize=None)
def _vmappable(max_out: int):
    @jax.custom_batching.custom_vmap
    def f(boxes, scores, thresh):
        return _nms_call(boxes, scores, thresh, max_out)

    @f.def_vmap
    def _rule(axis_size, in_batched, boxes, scores, thresh):
        bb, sb, tb = in_batched
        if not bb:
            boxes = jnp.broadcast_to(boxes[None], (axis_size, *boxes.shape))
        if not sb:
            scores = jnp.broadcast_to(scores[None],
                                      (axis_size, *scores.shape))
        if tb:  # per-image thresholds can't differ in one kernel launch;
            thresh = thresh[0]  # the detect graph's threshold is constant
        idx, valid = _nms_call_batched(boxes, scores, thresh, max_out)
        return (idx, valid), (True, True)

    return f


@partial(jax.jit, static_argnames=('max_out',))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_threshold: float, max_out: int):
    """Greedy NMS fully on-chip. Same contract as ops/nms.nms_jax.

    boxes: (N, 4) xyxy float32; scores (N,) with <= 0 marking padding.
    Returns (keep_idx (max_out,) int32, keep_valid (max_out,) bool).
    vmap-capable (one level) via the custom_vmap rule above.
    """
    thresh = jnp.asarray([[iou_threshold]], jnp.float32)
    return _vmappable(max_out)(boxes, scores, thresh)
