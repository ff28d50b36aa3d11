"""Pallas fused fusion-layer kernel: relu(base + sum_j up_f(conv1x1(y_j))).

HRNet's stage fusion computes, for the high-resolution output branch,
``relu(x_0 + sum_j upsample_{2^j}(BN(conv1x1(x_j))))`` (reference
models_/hrnet.py:31-35, 66-70). Under XLA each 1x1-conv output materializes
and the broadcast+add chain is a separate HBM pass. This kernel runs the
whole resize-add for one image entirely in VMEM:

  * the folded 1x1 conv is ONE MXU dot per source over the pre-flattened
    (H_j*W_j, C_j) tensor;
  * nearest-upsampling along W is a block-diagonal 0/1 interleave MATMUL
    (a sublane interleave would relayout on every row — the Mosaic killer
    the round-1 chain kernel hit; a dot sidesteps the layout system);
  * upsampling along H is free: output rows are duplicated by static
    major-dim row adds into an f32 accumulator;
  * per-source biases collapse into the accumulator init (every output
    pixel receives exactly one upsampled value per source, and the 0/1
    matmul preserves it), and the final ReLU is fused into the store.

Exact in f32 (the interleave matmul selects single elements; only the
conv-dot reduction order differs from lax.conv). Requires W % 8 == 0
(aligned row slices) — true for every HRNet resolution whose input width
is a multiple of 32 (the facade's standard 288/192 widths).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk_rows(w_src: int) -> int:
    """Smallest S with S * w_src divisible by 8 (sublane-aligned chunks)."""
    s = 1
    while (s * w_src) % 8:
        s *= 2
    return s


def _interleave_matrix(w_src: int, factor: int, s: int) -> np.ndarray:
    """(S*W_out, S*W_src) block-diag 0/1 matrix: out[x] = src[x // factor]
    per row-block (nearest-neighbour W-upsampling as a matmul)."""
    w_out = w_src * factor
    u = np.zeros((w_out, w_src), np.float32)
    u[np.arange(w_out), np.arange(w_out) // factor] = 1.0
    out = np.zeros((s * w_out, s * w_src), np.float32)
    for i in range(s):
        out[i * w_out:(i + 1) * w_out, i * w_src:(i + 1) * w_src] = u
    return out


def fuse_up_supported(base_shape: Sequence[int],
                      src_shapes: Sequence[Sequence[int]]) -> bool:
    """Shape gate: W aligned, integer pyramid factors, VMEM budget sane."""
    _, h, w, c = base_shape
    if w % 8:
        return False
    vmem = 4 * h * w * c  # f32 accumulator
    for (_, hj, wj, cj) in src_shapes:
        if hj == 0 or wj == 0 or h % hj or w % wj or h // hj != w // wj:
            return False
        if h // hj == 1:
            return False
        s = _chunk_rows(wj)
        n_chunks = -(-hj // s)
        vmem += 4 * (n_chunks * s * wj) * c  # t scratch
    return vmem < 8 * 1024 * 1024


def _make_kernel(h: int, w: int, c: int, meta: List[Tuple[int, int, int, int]]):
    """meta per source: (h_j, w_j, factor, s_chunk)."""
    n_src = len(meta)

    def kernel(*refs):
        base_ref = refs[0]
        y_refs = refs[1:1 + n_src]
        w_refs = refs[1 + n_src:1 + 2 * n_src]
        u_refs = refs[1 + 2 * n_src:1 + 3 * n_src]
        bsum_ref = refs[1 + 3 * n_src]
        out_ref = refs[2 + 3 * n_src]
        acc_ref = refs[3 + 3 * n_src]
        t_refs = refs[4 + 3 * n_src:]

        acc_ref[:] = base_ref[0].astype(jnp.float32) + bsum_ref[0]
        for j, (hj, wj, f, s) in enumerate(meta):
            # folded 1x1 conv: one dot over all (padded) source pixels
            t_refs[j][:] = jax.lax.dot_general(
                y_refs[j][0], w_refs[j][:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            n_chunks = -(-hj // s)
            for ci in range(n_chunks):
                chunk = t_refs[j][ci * s * wj:(ci + 1) * s * wj]
                # W-upsample: 0/1 interleave matmul (exact selection)
                up = jax.lax.dot_general(
                    u_refs[j][:], chunk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # H-upsample: row duplication on the (free) major dim
                for si in range(min(s, hj - ci * s)):
                    row = up[si * w:(si + 1) * w]
                    src_row = ci * s + si
                    for e in range(f):
                        acc_ref[f * src_row + e] += row
        out_ref[0] = jnp.maximum(acc_ref[:], 0.0).astype(out_ref.dtype)

    return kernel


def fuse_up(base: jnp.ndarray, ys: Sequence[jnp.ndarray],
            kernels: Sequence[jnp.ndarray],
            biases: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """relu(base + sum_j nearest_up(conv1x1(y_j, kernels[j]) + biases[j])).

    base: (B, H, W, C); ys[j]: (B, H_j, W_j, C_j) with H/H_j == W/W_j a
    power of two; kernels[j]: (1, 1, C_j, C) folded conv kernels;
    biases[j]: (C,). Dtype follows ``base`` (f32 exact; bf16 accumulates
    in f32). Call ``fuse_up_supported`` first.
    """
    b, h, w, c = base.shape
    meta = []
    y_flat: List[jnp.ndarray] = []
    u_mats: List[jnp.ndarray] = []
    w_mats: List[jnp.ndarray] = []
    t_shapes = []
    for y, k in zip(ys, kernels):
        _, hj, wj, cj = y.shape
        f = h // hj
        s = _chunk_rows(wj)
        n_chunks = -(-hj // s)
        rows_pad = n_chunks * s * wj
        meta.append((hj, wj, f, s))
        yf = y.reshape(b, hj * wj, cj)
        if rows_pad != hj * wj:
            yf = jnp.pad(yf, ((0, 0), (0, rows_pad - hj * wj), (0, 0)))
        y_flat.append(yf)
        u_mats.append(jnp.asarray(_interleave_matrix(wj, f, s)))
        w_mats.append(k.reshape(cj, c).astype(base.dtype))
        t_shapes.append((rows_pad, c))
    bias_sum = jnp.zeros((1, c), jnp.float32)
    for bias in biases:
        bias_sum = bias_sum + bias.astype(jnp.float32)[None, :]

    n_src = len(ys)
    # on CPU backends (tests) run the kernel through the interpreter so the
    # model code has ONE fuse path everywhere
    interpret = jax.default_backend() == 'cpu'
    in_specs = [pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for yf in y_flat:
        in_specs.append(pl.BlockSpec(
            (1, yf.shape[1], yf.shape[2]), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))
    for _ in range(2 * n_src + 1):  # w_mats, u_mats, bias_sum
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        _make_kernel(h, w, c, meta),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), base.dtype),
        scratch_shapes=[pltpu.VMEM((h, w, c), jnp.float32)] +
        [pltpu.VMEM(ts, jnp.float32) for ts in t_shapes],
        interpret=interpret,
    )(base, *y_flat, *w_mats, *u_mats, bias_sum)
    return out
