"""Winograd-F(2,3)-along-H fused BasicBlock-chain kernel (VERDICT r3 #5).

The full 2D F(2x2,3x3) measured 8x slower in XLA (ops/winograd.py): the
16 stride-2 tile slices hit the W (sublane) and H dims and every one
materialized a relayout. The round-3 park note estimated the Pallas
de-interleave cost instead of measuring it. This module measures the
one formulation whose strides are ALL free:

  * Winograd runs along H ONLY — F(2,3) on the ky axis. H is the MAJOR
    dim of the chain kernel's tap buffer, so the stride-2 tile accesses
    become direct indexes once H is factored as (ht, 2): image row
    2t+p lives at [t, p]. No sublane/lane de-interleave exists at all.
  * The kx axis keeps chain v3's taps-on-lanes layout (fused_block.py):
    each Winograd term is one dot_general with K = 3*CG.

Arithmetic per conv: 4 dots over ht = h/2 rows replace v3's 3 dots over
h rows — 2/3 the MACs (1.5x fewer; the 2.25x of full 2D F(2,3) is not
reachable without the W de-interleave). The extra work is row adds of
(ht, W, 3CG) tiles on the VPU: major-dim offset views, relayout-free.

1-D F(2,3) identities used (derived from B^T/G/A^T in ops/winograd.py):
  inputs  d = [x(2t-1), x(2t), x(2t+1), x(2t+2)]
  V0 = d0 - d2   V1 = d1 + d2   V2 = d2 - d1   V3 = d1 - d3
  U0 = w0        U1 = (w0+w1+w2)/2  U2 = (w0-w1+w2)/2  U3 = w2
  y(2t)   = V0 U0 + V1 U1 + V2 U2
  y(2t+1) = V1 U1 - V2 U2 - V3 U3

Replaces the same cuDNN 3x3 convs as the direct chain
(reference models_/hrnet.py:74-189). Measurement: scripts/bench_winograd.py;
numbers in PERF.md ("Winograd-H chain").
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simple_hrnet_tpu.ops.pallas.fused_block import cpu_interpret_enabled

# G matrix of F(2,3) applied to the ky axis (rows of U below)
_G = np.array([[1.0, 0.0, 0.0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0.0, 0.0, 1.0]], np.float32)


def pack_winograd_weights(weights: jnp.ndarray, dtype=jnp.bfloat16):
    """(8, 3, 3, CG, CG) chain weights (pack_chain_weights layout) ->
    (8, 4, 3*CG, CG): ky transformed by G, kx taps stacked on the
    contraction dim in v3's [shl | center | shr] lane-block order.
    Host-side, once at pack time; the transform is exact in f32
    ({0, +-1, +-0.5} coefficients)."""
    w = np.asarray(weights, np.float32)               # (8, ky, kx, CG, CG)
    u = np.einsum('uk,ikxab->iuxab', _G, w)           # (8, 4, kx, CG, CG)
    cg = u.shape[-1]
    # merge (kx, cin) kx-MAJOR: contraction blocks [shl | center | shr]
    # must match the tap buffer's lane-block order (fused_block.py v3)
    return jnp.asarray(u.reshape(8, 4, 3 * cg, cg), dtype)


def _wino_kernel(x_ref, w_ref, b_ref, out_ref, xw_ref):
    """One grid step = one packed image group.

    x/out blocks: (1, ht, 2, W, CG) — H factored as (tile, parity).
    w_ref: (8, 4, 3*CG, CG) from pack_winograd_weights.
    xw_ref scratch: (ht+2, 2, WP, 3*CG) — content tiles at [1, ht],
    tile rows 0 / ht+1 are the zero 'same' border (image rows -2..-1 and
    h..h+1; only rows -1 and h are ever read). Lane blocks hold the
    [x-1 | center | x+1] kx taps exactly like chain v3 — the two
    sublane-offset copies per conv are unchanged; every Winograd access
    is a major-dim view."""
    _, ht, _, w_dim, cg = out_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():
        xw_ref[:] = jnp.zeros(xw_ref.shape, xw_ref.dtype)

    def load_center(v):
        # v: (ht, 2, w, cg) -> center lane block of content tiles
        xw_ref[1:ht + 1, :, 0:w_dim, cg:2 * cg] = v

    def conv3x3(conv_idx, residual):
        # kx shifted copies (the only misaligned ops, same two as v3)
        xw_ref[1:ht + 1, :, 1:w_dim + 1, 0:cg] = \
            xw_ref[1:ht + 1, :, 0:w_dim, cg:2 * cg]
        xw_ref[1:ht + 1, :, 0:w_dim, 2 * cg:3 * cg] = \
            xw_ref[1:ht + 1, :, 1:w_dim + 1, cg:2 * cg]

        # image row 2t+p of tile t lives at xw[t+1, p]
        even_c = xw_ref[1:ht + 1, 0, 0:w_dim, :]   # x[2t]
        odd_c = xw_ref[1:ht + 1, 1, 0:w_dim, :]    # x[2t+1]
        odd_up = xw_ref[0:ht, 1, 0:w_dim, :]       # x[2t-1]
        even_dn = xw_ref[2:ht + 2, 0, 0:w_dim, :]  # x[2t+2]

        dot = lambda v, u: jax.lax.dot_general(
            v, w_ref[conv_idx, u], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m0 = dot(odd_up - odd_c, 0)
        m1 = dot(even_c + odd_c, 1)
        m2 = dot(odd_c - even_c, 2)
        m3 = dot(even_c - even_dn, 3)

        bias = jnp.broadcast_to(b_ref[conv_idx, :],
                                (ht, w_dim, cg)).astype(jnp.float32)
        y_even = bias + m0 + m1 + m2
        y_odd = bias + m1 - m2 - m3
        if residual is not None:
            y_even = y_even + residual[:, 0].astype(jnp.float32)
            y_odd = y_odd + residual[:, 1].astype(jnp.float32)
        return jnp.stack([jnp.maximum(y_even, 0.0),
                          jnp.maximum(y_odd, 0.0)], axis=1)

    load_center(x_ref[0])
    out_ref[0] = x_ref[0]
    for blk in range(4):
        mid = conv3x3(2 * blk, None)
        load_center(mid.astype(xw_ref.dtype))
        y = conv3x3(2 * blk + 1, out_ref[0])
        out_ref[0] = y.astype(out_ref.dtype)
        if blk < 3:
            load_center(out_ref[0])


def wino_pallas_ok(h: int, w_dim: int, dtype) -> bool:
    """Same constraints as chain v3 (W % 8 sublane alignment, bf16/int8
    VMEM budget) plus even H for the F(2,3) tiling."""
    if h % 2 or w_dim % 8:
        return False
    if jax.default_backend() == 'cpu':
        return cpu_interpret_enabled()
    return dtype != jnp.float32


def chain_pallas_grouped_wino(xg: jnp.ndarray, w_wino: jnp.ndarray,
                              biases: jnp.ndarray) -> jnp.ndarray:
    """Winograd-H fused chain on an ALREADY-packed tensor (B', H, W, CG).

    w_wino from pack_winograd_weights(pack_chain_weights(...)); biases as
    for chain v3. Requires even H and W % 8 == 0. The (B, H, W, C) ->
    (B, ht, 2, W, C) factoring is a free dim-split reshape in XLA."""
    bg, h, w_dim, cg = xg.shape
    ht = h // 2
    dtype = xg.dtype
    wp = (w_dim + 2 + 7) // 8 * 8
    w_wino = w_wino.astype(dtype)  # stored f32; compute in activation dtype
    xt = xg.reshape(bg, ht, 2, w_dim, cg)
    out = pl.pallas_call(
        _wino_kernel,
        grid=(bg,),
        interpret=jax.default_backend() == 'cpu',
        in_specs=[
            pl.BlockSpec((1, ht, 2, w_dim, cg), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, 2, w_dim, cg),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, ht, 2, w_dim, cg), dtype),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, 2, wp, 3 * cg), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, w_wino, biases)
    return out.reshape(bg, h, w_dim, cg)


def blockdiag_chain_wino(x: jnp.ndarray, w_wino4: jnp.ndarray,
                         biases: jnp.ndarray,
                         dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-XLA Winograd-H chain for the shapes where Pallas loses to XLA
    (W48's 96-lane packs): grouped batch-halves packing like
    blockdiag_chain, each conv = 4 one-row (1,3) convs over the
    H-factored tensor. The only Winograd data movement is row slicing on
    H — a major-dim copy XLA handles without relayouts (unlike the 2D
    form's W-stride slices). MACs: 4*(h/2)*3 vs h*9 per output row block
    = 2/3 of the direct conv.

    ``w_wino4``: (8, 4, 1, 3, CG, CG) — G-transformed ky, kx kept as a
    width-3 conv kernel (see pack_winograd_weights_xla)."""
    b, h, w_dim, c = x.shape
    group = w_wino4.shape[-1] // c
    orig_b = b
    pad = (-b) % group
    if pad:
        x = jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
        b += pad
    step = b // group
    xg = jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                         axis=-1).astype(dtype)
    ht = h // 2

    def conv(v, i):
        # pad H by 1 (same border), factor rows by parity via one
        # even/odd split each (major-dim stride-2 slice of a padded copy)
        vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0), (0, 0)))
        # vp row r holds image row r-1
        d0 = vp[:, 0:h:2]      # x[2t-1]
        d1 = vp[:, 1:h + 1:2]  # x[2t]
        d2 = vp[:, 2:h + 2:2]  # x[2t+1]
        d3 = vp[:, 3:h + 2:2]  # x[2t+2] (t=ht-1 hits the zero border row)
        V = (d0 - d2, d1 + d2, d2 - d1, d1 - d3)
        y_even = None
        y_odd = None
        for u in range(4):
            m = jax.lax.conv_general_dilated(
                V[u], w_wino4[i, u].astype(dtype), (1, 1),
                [(0, 0), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            if u == 0:
                y_even = m
            elif u == 1:
                y_even = y_even + m
                y_odd = m
            elif u == 2:
                y_even = y_even + m
                y_odd = y_odd - m
            else:
                y_odd = y_odd - m
        # interleave the two row phases back: (B, ht, 2, W, C) -> H
        y = jnp.stack([y_even, y_odd], axis=2).reshape(b // group, h,
                                                       w_dim, -1)
        return y + biases[i]

    v = xg
    for blk in range(4):
        res = v
        mid = jnp.maximum(conv(v, 2 * blk), 0.0).astype(dtype)
        v = jnp.maximum(conv(mid, 2 * blk + 1) + res.astype(jnp.float32),
                        0.0).astype(dtype)
    out = jnp.concatenate([v[..., g * c:(g + 1) * c] for g in range(group)],
                          axis=0)
    return out[:orig_b]


def pack_winograd_weights_xla(weights: jnp.ndarray):
    """(8, 3, 3, CG, CG) -> (8, 4, 1, 3, CG, CG) f32: G-transformed ky as
    4 width-3 'HWIO' kernels for blockdiag_chain_wino."""
    w = np.asarray(weights, np.float32)
    u = np.einsum('uk,ikxab->iuxab', _G, w)           # (8, 4, kx, CG, CG)
    return jnp.asarray(u[:, :, None])                 # (8, 4, 1, 3, CG, CG)
