"""Pallas fused BasicBlock-chain kernel for HRNet's high-resolution branch.

Motivation (measured on v5e, see PERF.md): HRNet's branch-0 convs
(C=48 @ 96x72 for W48) run at ~34 TF/s under XLA — the 48-channel
contraction/output dims waste the 128-wide MXU and the 128-lane layout
inflates HBM traffic 2.7x. This kernel runs a branch's whole chain of 4
BasicBlocks (8 convs + residuals + ReLUs) for a PAIR of images entirely in
VMEM:

  * G images are packed into the channel dim (C -> G*C) with
    block-diagonal weights — Gx redundant FLOPs for full MXU lanes
    (G*C == 128 is the sweet spot: W32's C=32 with G=4; here the chain
    also loses all intermediate HBM round-trips);
  * each 3x3 conv = 3 dot_generals (K = 3*G*C: the kx taps live in lane
    blocks of one wide VMEM buffer) over zero-padded scratch, f32
    accumulation, folded-BN bias + ReLU fused in registers (kernel v3 —
    the v1/v2/v3 layout progression and measurements are in PERF.md).

Measured at the W32 branch-0 shape (16x64x48x32, bf16, 200-iter chained
on-chip timing): 0.183 ms vs 0.238 blockdiag-XLA (1.30x) vs 0.645 plain
(3.5x). At 96 packed lanes (W48) XLA still wins — use blockdiag there.

Weights must be pre-packed with ``pack_chain_weights`` (host-side, once at
load): (8, 3, 3, GC, GC) block-diagonal + (8, GC) f32 biases.
"""

from __future__ import annotations

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
                       group: int = 2,
                       pad_to: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack 4 folded BasicBlocks into block-diag stacked kernels.

    block_params: list of 4 dicts with folded conv1/conv2
    ({'kernel': (3,3,C,C), 'bias': (C,)}). ``group`` images share one
    grouped tensor. Returns (weights (8, 3, 3, CP, CP) dtype,
    biases (8, CP) f32) where CP = max(G*C, pad_to).

    ``pad_to``: zero-pad the packed width up to this many lanes (e.g.
    W48's G=2 pack is 96 lanes; padding to 128 makes every tap-buffer
    lane offset VREG-aligned inside the Pallas kernel, trading 33% junk
    lanes for full MXU tiles — the zero weight rows/cols keep the padded
    lanes exactly zero through the whole chain, residuals included).
    """
    convs = []
    for bp in block_params:
        convs.append(bp['conv1'])
        convs.append(bp['conv2'])
    c = convs[0]['kernel'].shape[2]
    cp = max(group * c, pad_to)
    w = np.zeros((8, 3, 3, cp, cp), np.float32)
    b = np.zeros((8, cp), np.float32)
    for i, conv in enumerate(convs):
        k = np.asarray(conv['kernel'], np.float32)
        bias = np.asarray(conv.get('bias', np.zeros(c)), np.float32)
        for g in range(group):
            w[i, :, :, g * c:(g + 1) * c, g * c:(g + 1) * c] = k
            b[i, g * c:(g + 1) * c] = bias
    return jnp.asarray(w, dtype), jnp.asarray(b, jnp.float32)


def pack_chain_weights_int8(block_params: list, amax: dict,
                            group: int = 2, pad_to: int = 0):
    """Quantize a 4-BasicBlock chain for the int8 blockdiag path.

    ``amax``: {id(conv_node): input amax} from models/quantize.calibrate
    run on the UNGROUPED tree (per-tensor amax is invariant under the
    batch-halves channel packing — same values, different layout).

    Returns dict(wq (8,3,3,GC,GC) int8 block-diag, wscale (8,GC) f32
    per-output-channel, b (8,GC) f32 biases, ascales (8,) f32 input
    scales). Measured 1.41x over the bf16 XLA blockdiag at W48's 96
    packed lanes (PERF.md round 2c); at 128 lanes the Pallas bf16 kernel
    stays faster — pack_grouped gates accordingly.
    """
    convs = []
    for bp in block_params:
        convs.append(bp['conv1'])
        convs.append(bp['conv2'])
    c = convs[0]['kernel'].shape[2]
    cg = max(group * c, pad_to)  # zero lanes beyond G*C (see pad_to above)
    wq = np.zeros((8, 3, 3, cg, cg), np.int8)
    ws = np.ones((8, cg), np.float32)
    b = np.zeros((8, cg), np.float32)
    ascales = np.zeros((8,), np.float32)
    for i, conv in enumerate(convs):
        k = np.asarray(conv['kernel'], np.float32)
        s = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
        s = np.where(s == 0.0, 1.0, s)
        kq = np.clip(np.round(k / s), -127, 127).astype(np.int8)
        bias = np.asarray(conv.get('bias', np.zeros(c)), np.float32)
        for g in range(group):
            wq[i, :, :, g * c:(g + 1) * c, g * c:(g + 1) * c] = kq
            ws[i, g * c:(g + 1) * c] = s
            b[i, g * c:(g + 1) * c] = bias
        ascales[i] = amax[id(conv)] / 127.0
    return {'wq': jnp.asarray(wq), 'wscale': jnp.asarray(ws),
            'b': jnp.asarray(b), 'ascales': jnp.asarray(ascales)}


def blockdiag_chain_int8_grouped(xg: jnp.ndarray, q: dict,
                                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Int8 4-BasicBlock chain on an ALREADY-grouped tensor (B', H, W, CG).

    Each conv: static-scale symmetric int8 quantization of the input
    (TRT-style calibration scales — no runtime amax reduction), int8 conv
    with int32 accumulation on the MXU's 2x-rate int8 path, f32
    dequantize + bias; ReLU/residual in f32, handoff in ``dtype``.
    """
    wq, ws, b, asc = q['wq'], q['wscale'], q['b'], q['ascales']

    def qconv(v, i):
        vq = jnp.clip(jnp.round(v.astype(jnp.float32) * (1.0 / asc[i])),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            vq, wq[i], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (asc[i] * ws[i]) + b[i]

    v = xg
    for blk in range(4):
        res = v.astype(jnp.float32)
        mid = jnp.maximum(qconv(v, 2 * blk), 0.0).astype(dtype)
        v = jnp.maximum(qconv(mid, 2 * blk + 1) + res, 0.0).astype(dtype)
    return v


def _chain_kernel(x_ref, w_ref, b_ref, out_ref, xw_ref):
    """One grid step = one packed image group; x/out blocks are
    (1, H, W, CG), w_ref is (8, 3, 3*CG, CG) with the three kx taps stacked
    on the contraction dim.

    Layout strategy, v3 (see PERF.md for the v1/v2/v3 progression): the
    round-1 kernel lost to XLA because all 9 per-tap slices of the padded
    scratch were SUBLANE-OFFSET reads, each forcing a Mosaic relayout; v2
    pre-shifted the two x-offset views into dedicated buffers (2 misaligned
    copies/conv instead of 6 misaligned taps). v3 additionally concatenates
    the kx taps on the LANE dim of one wide buffer — lane offsets at CG
    multiples are register-aligned, so each conv is 3 dot_generals with
    K=3*CG instead of 9 with K=CG (3x fewer accumulator round-trips, taller
    MXU contractions). Row (ky) offsets are major-dim and free. The
    residual lives in the output block (saves one scratch buffer — keeps
    the f32 variant inside the 16MB VMEM budget).
    """
    _, h, w_dim, cg = out_ref.shape

    # zero once: borders (row 0 / h+1, the shl zero column, alignment
    # tails) stay zero forever — later writes touch content regions only
    @pl.when(pl.program_id(0) == 0)
    def _():
        xw_ref[:] = jnp.zeros(xw_ref.shape, xw_ref.dtype)

    def load_center(v):
        # content at rows [1, h], cols [0, w); lane block 1 = center taps
        xw_ref[1:h + 1, 0:w_dim, cg:2 * cg] = v

    def conv3x3(conv_idx, residual):
        # the two misaligned sublane shifts write straight into the wide
        # buffer's outer lane blocks (lane offsets are CG-aligned: free)
        xw_ref[1:h + 1, 1:w_dim + 1, 0:cg] = \
            xw_ref[1:h + 1, 0:w_dim, cg:2 * cg]
        xw_ref[1:h + 1, 0:w_dim, 2 * cg:3 * cg] = \
            xw_ref[1:h + 1, 1:w_dim + 1, cg:2 * cg]
        acc = jnp.broadcast_to(b_ref[conv_idx, :], (h, w_dim, cg)).astype(
            jnp.float32)
        for ky in range(3):
            tap = xw_ref[ky:ky + h, 0:w_dim, :]
            acc = acc + jax.lax.dot_general(
                tap, w_ref[conv_idx, ky],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if residual is not None:
            acc = acc + residual.astype(jnp.float32)
        return jnp.maximum(acc, 0.0)

    # 4 BasicBlocks: conv1 -> relu -> conv2 (+residual) -> relu
    load_center(x_ref[0])
    out_ref[0] = x_ref[0]
    for blk in range(4):
        mid = conv3x3(2 * blk, None)
        load_center(mid.astype(xw_ref.dtype))
        y = conv3x3(2 * blk + 1, out_ref[0])
        out_ref[0] = y.astype(out_ref.dtype)
        if blk < 3:
            load_center(out_ref[0])


def _chain_kernel_int8(x_ref, w_ref, inva_ref, alpha_ref, b_ref, out_ref,
                       xw_ref):
    """Int8 variant of the v3 chain kernel (see _chain_kernel).

    The wide tap buffer holds INT8 activations (half the VMEM footprint and
    HBM-free like v3), each conv is 3 int8xint8->int32 dot_generals on the
    MXU's 2x-rate int8 path, and the dequant+bias+ReLU epilogue runs in f32
    registers. Per-conv quantization uses the calibrated static scales:
    ``inva_ref`` (8,1) = 1/ascale, ``alpha_ref`` (8,CG) = ascale*wscale
    (the combined dequant factor), ``b_ref`` (8,CG) f32 biases.
    """
    _, h, w_dim, cg = out_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():
        xw_ref[:] = jnp.zeros(xw_ref.shape, xw_ref.dtype)

    def quantize_store(v, conv_idx):
        # quantize for conv ``conv_idx`` and park in the center lane block
        q = jnp.clip(jnp.round(v.astype(jnp.float32) * inva_ref[conv_idx, 0]),
                     -127, 127).astype(jnp.int8)
        xw_ref[1:h + 1, 0:w_dim, cg:2 * cg] = q

    def conv3x3(conv_idx, residual, quant_for, want_value):
        # VMEM-stack discipline: the f32 conv result escapes this function
        # ONLY when it feeds out_ref (want_value); mid results quantize
        # straight back into the tap buffer so at most one full-extent f32
        # temporary is live at a time (the 16MB scoped limit binds here).
        xw_ref[1:h + 1, 1:w_dim + 1, 0:cg] = \
            xw_ref[1:h + 1, 0:w_dim, cg:2 * cg]
        xw_ref[1:h + 1, 0:w_dim, 2 * cg:3 * cg] = \
            xw_ref[1:h + 1, 1:w_dim + 1, cg:2 * cg]
        acc = jnp.zeros((h, w_dim, cg), jnp.int32)
        for ky in range(3):
            tap = xw_ref[ky:ky + h, 0:w_dim, :]
            acc = acc + jax.lax.dot_general(
                tap, w_ref[conv_idx, ky],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        accf = acc.astype(jnp.float32) * alpha_ref[conv_idx, :] \
            + b_ref[conv_idx, :]
        if residual is not None:
            accf = accf + residual.astype(jnp.float32)
        accf = jnp.maximum(accf, 0.0)
        if quant_for is not None:
            quantize_store(accf, quant_for)
        if want_value:
            return accf

    quantize_store(x_ref[0], 0)
    out_ref[0] = x_ref[0]
    for blk in range(4):
        conv3x3(2 * blk, None, quant_for=2 * blk + 1, want_value=False)
        y = conv3x3(2 * blk + 1, out_ref[0],
                    quant_for=2 * blk + 2 if blk < 3 else None,
                    want_value=True)
        out_ref[0] = y.astype(out_ref.dtype)


def chain_pallas_int8_ok(w_dim: int, cg: int) -> bool:
    """Run the compiled int8 chain kernel at this shape?

    Measured (PERF.md round 2c): wins only at exactly 128 packed lanes
    (0.141 vs 0.163 ms XLA-int8 at W32); at 96 lanes the int8 tile's
    32-row sublane granularity makes the misaligned tap copies dominate
    (0.769 vs 0.436 — the XLA blockdiag int8 chain stays). Needs W % 8
    aligned slices like the bf16 kernel.
    """
    if w_dim % 8 or cg != 128:
        return False
    if jax.default_backend() == 'cpu':
        return cpu_interpret_enabled()
    return True


def chain_pallas_int8_grouped(xg: jnp.ndarray, q: dict) -> jnp.ndarray:
    """VMEM-resident int8 chain on an ALREADY-grouped tensor (B',H,W,CG).

    ``q`` from pack_chain_weights_int8. Requires W % 8 == 0 (same aligned
    sublane constraint as the bf16 kernel).
    """
    bg, h, w_dim, cg = xg.shape
    dtype = xg.dtype
    wp = (w_dim + 2 + 7) // 8 * 8
    w = q['wq']  # (8, 3, 3, CG, CG) int8
    wst = jnp.concatenate([w[:, :, 0], w[:, :, 1], w[:, :, 2]], axis=2)
    inva = (1.0 / q['ascales']).astype(jnp.float32)[:, None]
    alpha = (q['ascales'][:, None] * q['wscale']).astype(jnp.float32)
    return pl.pallas_call(
        _chain_kernel_int8,
        grid=(bg,),
        interpret=jax.default_backend() == 'cpu',
        in_specs=[
            pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, h, w_dim, cg), dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wp, 3 * cg), jnp.int8),
        ],
        # the int32 accumulator + f32 epilogue at full block extent spill
        # to the VMEM stack; the default 16MB scoped limit is conservative
        # (v5e VMEM is 128MB) — raise it for the large W48 block
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, wst, inva, alpha, q['b'].astype(jnp.float32))


def cpu_interpret_enabled() -> bool:
    """Opt-in for running production-path Pallas kernels through the
    interpreter on CPU (SHT_PALLAS_CPU_INTERPRET=1). Parity tests enable
    it; by default CPU execution falls back to the XLA formulations —
    interpreter-mode kernels are orders of magnitude slower and would
    drag every CPU facade test through them."""
    import os
    return os.environ.get('SHT_PALLAS_CPU_INTERPRET', '0') == '1'


def chain_pallas_ok(w_dim: int, dtype) -> bool:
    """Can the compiled chain kernel run at this shape/dtype?

    Needs W % 8 == 0 (aligned sublane slices). In f32 on a REAL TPU the
    kernel's VMEM footprint (wide tap buffer + f32 weights + Mosaic's
    double-buffered in/out blocks) exceeds the 16MB budget at production
    shapes — f32 falls back to the XLA blockdiag chain. On CPU the kernel
    runs (interpreted, any dtype) only when SHT_PALLAS_CPU_INTERPRET=1.
    """
    if w_dim % 8:
        return False
    if jax.default_backend() == 'cpu':
        return cpu_interpret_enabled()
    return dtype != jnp.float32


def chain_pallas_grouped(xg: jnp.ndarray, weights: jnp.ndarray,
                         biases: jnp.ndarray) -> jnp.ndarray:
    """Run the fused chain kernel on an ALREADY-packed tensor.

    xg: (B', H, W, CG) with CG == weights' channel width (the grouped-trunk
    fast path packs once for the whole trunk — models/hrnet_fast.py — and
    calls this directly on its grouped branch-0 tensors). Requires
    W % 8 == 0 (aligned sublane slices).
    """
    bg, h, w_dim, cg = xg.shape
    dtype = xg.dtype
    wp = (w_dim + 2 + 7) // 8 * 8  # content cols [0,W), shifted views need W+1
    # restack (8,3,3,CG,CG) -> (8,3,3*CG,CG): kx taps on the contraction
    # dim, order [shl(kx=0) | center(kx=1) | shr(kx=2)] matching the wide
    # buffer's lane blocks
    w = weights.astype(dtype)
    wst = jnp.concatenate([w[:, :, 0], w[:, :, 1], w[:, :, 2]], axis=2)
    return pl.pallas_call(
        _chain_kernel,
        grid=(bg,),
        interpret=jax.default_backend() == 'cpu',
        in_specs=[
            pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w_dim, cg), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, h, w_dim, cg), dtype),
        scratch_shapes=[
            # [x-1 | center | x+1] tap views, content + zero borders
            pltpu.VMEM((h + 2, wp, 3 * cg), dtype),
        ],
        # W48-sized 128-lane blocks (pad-to-128 path) exceed the default
        # 16MB scoped budget (tap buffer + weights + double-buffered
        # blocks); v5e VMEM is 128MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xg, wst, biases)


def chain_pallas_grouped_padded(xg: jnp.ndarray, weights: jnp.ndarray,
                                biases: jnp.ndarray) -> jnp.ndarray:
    """Run the bf16 chain kernel on a grouped tensor whose pack width is
    BELOW the weights' (pad_to-widened) lane count: zero-pad the lanes up,
    run the kernel at full-VREG alignment, slice the content lanes back.

    The rationale for W48's 96-lane pack (VERDICT r2 #2): at CG=96 every
    tap-buffer lane offset straddles VREGs (Mosaic relayouts per tap) and
    the MXU contracts K=N=96 at a 56% ceiling; padded to 128 the offsets
    align and the tiles fill — 75% useful lanes beats 56% useful MXU.
    The pad/slice are XLA ops that fuse with neighbors.
    """
    cg = xg.shape[-1]
    cp = weights.shape[-1]
    xp = jnp.pad(xg, ((0, 0), (0, 0), (0, 0), (0, cp - cg)))
    return chain_pallas_grouped(xp, weights, biases)[..., :cg]


def chain_pallas_int8_grouped_padded(xg: jnp.ndarray, q: dict) -> jnp.ndarray:
    """Int8 analogue of chain_pallas_grouped_padded (q packed with
    pad_to; padded weight lanes are zero so padded outputs stay zero)."""
    cg = xg.shape[-1]
    cp = q['wq'].shape[-1]
    xp = jnp.pad(xg, ((0, 0), (0, 0), (0, 0), (0, cp - cg)))
    return chain_pallas_int8_grouped(xp, q)[..., :cg]


def fused_basic_chain(x: jnp.ndarray, weights: jnp.ndarray,
                      biases: jnp.ndarray) -> jnp.ndarray:
    """Run the fused 4-BasicBlock chain.

    x: (B, H, W, C); weights/biases from pack_chain_weights (any group —
    G = weights_C / C images share one packed tensor; G*C == 128 fills the
    MXU lanes exactly, e.g. W32's C=32 with G=4 — measured 1.5x over the
    XLA blockdiag chain at that shape, PERF.md round 2). Batch-halves
    packing, consistent with blockdiag_chain. Returns (B, H, W, C),
    matching the unfused chain to bf16 tolerance. Falls back to
    blockdiag_chain when W % 8 != 0 (the kernel needs aligned sublane
    slices).
    """
    b, h, w_dim, c = x.shape
    if not chain_pallas_ok(w_dim, x.dtype):
        return blockdiag_chain(x, weights, biases, dtype=x.dtype)
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
    out = chain_pallas_grouped(xg, weights, biases)
    out = jnp.concatenate([out[..., g * c:(g + 1) * c] for g in range(group)],
                          axis=0)
    return out[:orig_b]
