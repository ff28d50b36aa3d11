#!/usr/bin/env python3
"""Measure the Winograd-H chain vs chain v3 / XLA blockdiag (VERDICT r3 #5).

The round-3 park note for Winograd rested on an ESTIMATED de-interleave
cost. This measures the formulation with no de-interleave at all
(F(2,3) along H only, ops/pallas/winograd_chain.py) at both production
packs:

  * W32 branch-0 (b16 ungrouped -> G=4 pack: 4x64x48x128) — where
    chain v3 already beats XLA 1.30x; Winograd-H does 2/3 its MACs.
  * W48 branch-0 (b16 -> G=2 pack: 8x96x72x96) — where XLA wins and
    every direct-Pallas formulation measured slower; the XLA Winograd-H
    variant changes the ARITHMETIC instead of the layout.

All timings chained on-chip (utils/profiling.device_timer, >=40 iters
for sub-ms kernels per CLAUDE.md). Run SERIALIZED — never concurrently
with another TPU benchmark. Results: PERF.md "Winograd-H chain".
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.ops.pallas import fused_block as FB
from simple_hrnet_tpu.ops.pallas import winograd_chain as WC
from simple_hrnet_tpu.utils.profiling import device_timer


def bench_pack(c, hw, batch, group, dtype=jnp.bfloat16):
    h, w = hw
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, c, c)))
    wts, bias = FB.pack_chain_weights(blocks, dtype=dtype, group=group)
    w_wino = WC.pack_winograd_weights(wts, dtype=dtype)
    w_wino4 = WC.pack_winograd_weights_xla(wts)

    x = jnp.asarray(rng.standard_normal((batch, h, w, c)), dtype)
    step = batch // group
    xg = jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                         axis=-1)
    cg = group * c
    T = dict(iters_lo=10, iters_hi=50, repeats=3)
    label = f'C={c} G={group} {h}x{w} b{batch} ({cg} lanes, {dtype.__name__})'
    print(f'== {label} ==', flush=True)

    t = device_timer(lambda v, wt, b: FB.blockdiag_chain(
        v, wt, b, dtype=dtype), x, wts, bias, **T)
    print(f'  XLA blockdiag direct   {t*1e3:7.3f} ms', flush=True)
    base = t

    t = device_timer(WC.blockdiag_chain_wino, x, w_wino4, bias, **T)
    print(f'  XLA blockdiag wino-H   {t*1e3:7.3f} ms ({base/t:4.2f}x direct)',
          flush=True)

    if FB.chain_pallas_ok(w, dtype):
        t3 = device_timer(FB.chain_pallas_grouped, xg, wts, bias, **T)
        print(f'  Pallas chain v3        {t3*1e3:7.3f} ms '
              f'({base/t3:4.2f}x XLA-direct)', flush=True)
    else:
        t3 = None
    if WC.wino_pallas_ok(h, w, dtype):
        tw = device_timer(WC.chain_pallas_grouped_wino, xg, w_wino, bias, **T)
        rel = f', {t3/tw:4.2f}x v3' if t3 else ''
        print(f'  Pallas wino-H          {tw*1e3:7.3f} ms '
              f'({base/tw:4.2f}x XLA-direct{rel})', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dtype', default='bf16')
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype in ('bf16', 'bfloat16') \
        else jnp.float32
    print('devices:', jax.devices(), flush=True)
    # W32 production pack: 128 lanes, Pallas v3 territory
    bench_pack(32, (64, 48), 16, 4, dtype)
    # W48 production pack: 96 lanes, XLA territory
    bench_pack(48, (96, 72), 16, 2, dtype)


if __name__ == '__main__':
    main()
