#!/usr/bin/env python3
"""Measure the pad-to-128-lanes Pallas chain at W48's 96-lane pack.

VERDICT r2 item #2: W48's branch-0 chain (C=48, G=2 -> 96 packed lanes)
runs pure XLA because every Pallas formulation lost at 96 lanes (VREG-
straddling tap offsets). This script times, at the production shape
(16, 96, 72, 48) grouped G=2, in ONE serialized TPU session:

  bf16: XLA blockdiag | pallas v3 @96 (misaligned) | pallas padded->128
  int8: XLA blockdiag | pallas padded->128

plus a parity check of the padded kernels vs their XLA formulations.
202-iteration chained on-chip timing (PERF.md measurement rules).

Usage: python scripts/bench_pad128.py [--h 96] [--w 72] [--c 48] [--b 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops.pallas import fused_block as FB
from simple_hrnet_tpu.utils.profiling import device_timer


def make_blocks(rng, c):
    blocks = []
    for _ in range(4):
        blk = {}
        for name in ('conv1', 'conv2'):
            blk[name] = {
                'kernel': rng.standard_normal((3, 3, c, c)).astype(
                    np.float32) * (1.0 / np.sqrt(9 * c)),
                'bias': rng.standard_normal(c).astype(np.float32) * 0.05,
            }
        blocks.append(blk)
    return blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--h', type=int, default=96)
    ap.add_argument('--w', type=int, default=72)
    ap.add_argument('--c', type=int, default=48)
    ap.add_argument('--b', type=int, default=16)
    ap.add_argument('--group', type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    blocks = make_blocks(rng, args.c)
    amax = {id(blk[k]): 3.0 for blk in blocks for k in ('conv1', 'conv2')}
    g = args.group
    cg = g * args.c

    w96, b96 = FB.pack_chain_weights(blocks, jnp.float32, group=g)
    w128, b128 = FB.pack_chain_weights(blocks, jnp.float32, group=g,
                                       pad_to=128)
    q96 = FB.pack_chain_weights_int8(blocks, amax, group=g)
    q128 = FB.pack_chain_weights_int8(blocks, amax, group=g, pad_to=128)

    bg = args.b // g
    xg = jnp.asarray(
        rng.standard_normal((bg, args.h, args.w, cg)), jnp.bfloat16)

    T = dict(iters_lo=2, iters_hi=202, repeats=3)
    ms = lambda t: t * 1e3

    def timed(label, fn, *fargs):
        t = device_timer(fn, *fargs, **T)
        print(f'{label:34s} {ms(t):7.3f} ms/chain', flush=True)
        return t

    # parity first (bf16 tolerances — reduction reorder)
    ref = FB.blockdiag_chain(
        jnp.concatenate([xg[..., i * args.c:(i + 1) * args.c]
                         for i in range(g)], axis=0),
        w96, b96, dtype=jnp.bfloat16)
    got = FB.chain_pallas_grouped_padded(xg, w128, b128)
    got = jnp.concatenate([got[..., i * args.c:(i + 1) * args.c]
                           for i in range(g)], axis=0)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    print(f'parity bf16 padded vs XLA blockdiag: max abs err {err:.4g} '
          f'(rel {err / scale:.4g})', flush=True)

    refq = FB.blockdiag_chain_int8_grouped(xg, q96, dtype=jnp.bfloat16)
    gotq = FB.chain_pallas_int8_grouped_padded(xg, q128)
    errq = float(jnp.max(jnp.abs(gotq.astype(jnp.float32) -
                                 refq.astype(jnp.float32))))
    scaleq = float(jnp.max(jnp.abs(refq.astype(jnp.float32)))) or 1.0
    print(f'parity int8 padded vs XLA int8: max abs err {errq:.4g} '
          f'(rel {errq / scaleq:.4g})', flush=True)

    t_xla = timed('bf16 XLA blockdiag @96',
                  lambda v, w, b: FB.blockdiag_chain(
                      jnp.concatenate(
                          [v[..., i * args.c:(i + 1) * args.c]
                           for i in range(g)], axis=0), w, b,
                      dtype=jnp.bfloat16), xg, w96, b96)
    try:
        t_p96 = timed('bf16 pallas v3 @96 (misaligned)',
                      FB.chain_pallas_grouped, xg, w96, b96)
    except Exception as e:  # VMEM/Mosaic failures are data, not crashes
        print(f'bf16 pallas v3 @96 FAILED: {type(e).__name__}', flush=True)
        t_p96 = float('inf')
    t_p128 = timed('bf16 pallas padded->128',
                   FB.chain_pallas_grouped_padded, xg, w128, b128)

    t_xq = timed('int8 XLA blockdiag @96',
                 lambda v, q: FB.blockdiag_chain_int8_grouped(
                     v, q, dtype=jnp.bfloat16), xg, q96)
    t_pq128 = timed('int8 pallas padded->128',
                    FB.chain_pallas_int8_grouped_padded, xg, q128)

    print(f'\nbf16: padded vs XLA {t_xla / t_p128:.2f}x, '
          f'vs v3@96 {t_p96 / t_p128:.2f}x')
    print(f'int8: padded vs XLA-int8 {t_xq / t_pq128:.2f}x, '
          f'vs bf16-XLA {t_xla / t_pq128:.2f}x')


if __name__ == '__main__':
    main()
