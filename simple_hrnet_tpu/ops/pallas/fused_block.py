"""Pallas fused BasicBlock-chain kernel for HRNet's high-resolution branch.

Motivation (measured on v5e, see PERF.md): HRNet's branch-0 convs
(C=48 @ 96x72 for W48) run at ~34 TF/s under XLA — the 48-channel
contraction/output dims waste the 128-wide MXU and the 128-lane layout
inflates HBM traffic 2.7x. This kernel runs a branch's whole chain of 4
BasicBlocks (8 convs + residuals + ReLUs) for a PAIR of images entirely in
VMEM:

  * two images are packed into the channel dim (C -> 2C) with
    block-diagonal weights — 2x redundant FLOPs for ~4x better MXU shapes
    (55 vs 34 TF/s measured at the XLA level; here the chain also loses all
    intermediate HBM round-trips);
  * each 3x3 conv = 9 static-tap dot_generals over a zero-padded VMEM
    scratch, f32 accumulation, folded-BN bias + ReLU fused in registers.

Weights must be pre-packed with ``pack_chain_weights`` (host-side, once at
load): (8, 3, 3, 2C, 2C) block-diagonal bf16 + (8, 2C) biases.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def blockdiag_chain(x: jnp.ndarray, weights: jnp.ndarray,
                    biases: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-XLA variant of the fused chain: groups of G images packed into
    channels with block-diagonal kernels, standard lax convs in between.

    Measured faster than both the naive chain (1.56x on the conv at C=48)
    and the current Pallas kernel (see PERF.md): the Gx-redundant
    block-diagonal FLOPs buy much better MXU shapes at small C. G is
    encoded in the packed weights (G = weights_C / model_C).
    """
    b, h, w_dim, c = x.shape
    group = weights.shape[-1] // c
    orig_b = b
    pad = (-b) % group
    if pad:
        x = jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
        b += pad
    # batch-halves packing: plain slices + channel concat (measured ~10%
    # faster than the interleaved reshape/transpose packing)
    step = b // group
    xg = jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                         axis=-1).astype(dtype)

    def conv(v, i):
        y = jax.lax.conv_general_dilated(
            v, weights[i].astype(dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + biases[i]
        return y

    v = xg
    for blk in range(4):
        res = v
        mid = jnp.maximum(conv(v, 2 * blk), 0.0).astype(dtype)
        v = jnp.maximum(conv(mid, 2 * blk + 1) + res.astype(jnp.float32),
                        0.0).astype(dtype)

    out = jnp.concatenate([v[..., g * c:(g + 1) * c] for g in range(group)],
                          axis=0)
    return out[:orig_b]


def pack_chain_weights(block_params: list, dtype=jnp.bfloat16,
                       group: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack 4 folded BasicBlocks into block-diag stacked kernels.

    block_params: list of 4 dicts with folded conv1/conv2
    ({'kernel': (3,3,C,C), 'bias': (C,)}). ``group`` images share one
    grouped tensor. Returns (weights (8, 3, 3, GC, GC) dtype,
    biases (8, GC) f32).
    """
    convs = []
    for bp in block_params:
        convs.append(bp['conv1'])
        convs.append(bp['conv2'])
    c = convs[0]['kernel'].shape[2]
    w = np.zeros((8, 3, 3, group * c, group * c), np.float32)
    b = np.zeros((8, group * c), np.float32)
    for i, conv in enumerate(convs):
        k = np.asarray(conv['kernel'], np.float32)
        bias = np.asarray(conv.get('bias', np.zeros(c)), np.float32)
        for g in range(group):
            w[i, :, :, g * c:(g + 1) * c, g * c:(g + 1) * c] = k
            b[i, g * c:(g + 1) * c] = bias
    return jnp.asarray(w, dtype), jnp.asarray(b, jnp.float32)


def _chain_kernel(x_ref, w_ref, b_ref, out_ref, xp_ref, shl_ref, shr_ref,
                  res_ref):
    """One grid step = one packed image-pair; refs are (1, H, W, 2C).

    Layout strategy (the round-1 version lost to XLA because all 9 per-tap
    slices of the padded scratch were SUBLANE-OFFSET reads, each forcing a
    Mosaic relayout): content lives at column 0 of an 8-aligned buffer, and
    the two x-shifted views are PRE-SHIFTED into dedicated buffers — 2
    misaligned copies per conv instead of 6 misaligned taps, every other
    read/store aligned. Row (ky) offsets are major-dim and free.
    """
    _, h, w_dim, c2 = out_ref.shape

    # zero once: borders (row 0 / h+1, the shl zero column, the alignment
    # tail) stay zero forever — later writes touch content regions only
    @pl.when(pl.program_id(0) == 0)
    def _():
        xp_ref[:] = jnp.zeros(xp_ref.shape, xp_ref.dtype)
        shl_ref[:] = jnp.zeros(shl_ref.shape, shl_ref.dtype)
        shr_ref[:] = jnp.zeros(shr_ref.shape, shr_ref.dtype)

    def conv3x3(conv_idx, residual):
        # pre-shift the two x-offset views (the only misaligned ops)
        shl_ref[1:h + 1, 1:w_dim + 1] = xp_ref[1:h + 1, 0:w_dim]
        shr_ref[1:h + 1, 0:w_dim] = xp_ref[1:h + 1, 1:w_dim + 1]
        acc = jnp.broadcast_to(b_ref[conv_idx, :], (h, w_dim, c2)).astype(
            jnp.float32)
        for ky in range(3):
            for kx, src in ((0, shl_ref), (1, xp_ref), (2, shr_ref)):
                tap = src[ky:ky + h, 0:w_dim, :]
                acc = acc + jax.lax.dot_general(
                    tap, w_ref[conv_idx, ky, kx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if residual is not None:
            acc = acc + residual.astype(jnp.float32)
        return jnp.maximum(acc, 0.0)

    # 4 BasicBlocks: conv1 -> relu -> conv2 (+residual) -> relu
    xp_ref[1:h + 1, 0:w_dim] = x_ref[0]
    res_ref[:] = x_ref[0]
    for blk in range(4):
        mid = conv3x3(2 * blk, None)
        xp_ref[1:h + 1, 0:w_dim] = mid.astype(xp_ref.dtype)
        y = conv3x3(2 * blk + 1, res_ref[:])
        res_ref[:] = y.astype(res_ref.dtype)
        if blk < 3:
            xp_ref[1:h + 1, 0:w_dim] = res_ref[:]
    out_ref[0] = res_ref[:]


@partial(jax.jit, static_argnames=())
def fused_basic_chain(x: jnp.ndarray, weights: jnp.ndarray,
                      biases: jnp.ndarray) -> jnp.ndarray:
    """Run the fused 4-BasicBlock chain.

    x: (B, H, W, C); weights/biases from pack_chain_weights (any group —
    G = weights_C / C images share one packed tensor; G*C == 128 fills the
    MXU lanes exactly, e.g. W32's C=32 with G=4). Batch-halves packing,
    consistent with blockdiag_chain. Returns (B, H, W, C), matching the
    unfused chain to bf16 tolerance.
    """
    b, h, w_dim, c = x.shape
    group = weights.shape[-1] // c
    orig_b = b
    pad = (-b) % group
    if pad:
        x = jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
        b += pad
    cg = group * c
    # batch-halves packing (same layout as blockdiag_chain)
    step = b // group
    xg = jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                         axis=-1)

    dtype = x.dtype
    if w_dim % 8:
        raise ValueError('fused_basic_chain requires W % 8 == 0 (aligned '
                         'sublane slices); use blockdiag_chain instead')
    wp = (w_dim + 2 + 7) // 8 * 8  # content cols [0,W), shifted views need W+1
    out = pl.pallas_call(
        _chain_kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // group, h, w_dim, cg), dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wp, cg), dtype),   # xp: content + zero borders
            pltpu.VMEM((h + 2, wp, cg), dtype),   # shl: x-1 view
            pltpu.VMEM((h + 2, wp, cg), dtype),   # shr: x+1 view
            pltpu.VMEM((h, w_dim, cg), dtype),    # res
        ],
    )(xg, weights.astype(dtype), biases)

    out = jnp.concatenate([out[..., g * c:(g + 1) * c] for g in range(group)],
                          axis=0)
    return out[:orig_b]
