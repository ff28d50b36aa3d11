#!/usr/bin/env python3
"""Stage-level breakdown of the production int8 W48 forward (b32) — the
pose net is 84% of the fused multi-person e2e graph, so its biggest
bucket is the next e2e lever.

Nested-prefix timing via apply_grouped(upto=...): each prefix returns
its full intermediate tree (device_timer reduces EVERY leaf, nothing is
dead-code-eliminated). Buckets: stem+layer1 | transition1 | stage2 |
stage3 (x4) | stage4 (x3) | head.

Usage: python scripts/bench_int8_breakdown.py [--batch 32] [--dtype int8|bf16]
Serialize with other TPU benchmarks.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--dtype', default='int8', choices=('int8', 'bf16'))
    args = ap.parse_args()

    from simple_hrnet_tpu.models import hrnet, hrnet_fast
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.models import quantize as Q
    from simple_hrnet_tpu.utils.profiling import device_timer

    J = jax.tree_util.tree_map
    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=48,
                                          nof_joints=17))
    amax = None
    if args.dtype == 'int8':
        amax = Q.calibrate_cpu(lambda p, v: hrnet.apply(p, v), params,
                               [Q.smooth_frames((384, 288))])
    packed = J(jnp.asarray, hrnet_fast.pack_grouped(params, group=2,
                                                    int8_amax=amax))
    if amax is not None:
        params = Q.quantize_folded(params, amax)
    params = J(jnp.asarray, params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 384, 288, 3)),
                    jnp.float32)
    T = dict(iters_lo=2, iters_hi=42, repeats=3)

    prev = 0.0
    for label in ('stem', 't1', 'stage2', 'stage3', 'stage4', None):
        fn = (lambda v, p, pk, _u=label: hrnet_fast.apply_grouped(
            p, pk, v, dtype=jnp.bfloat16, upto=_u))
        t = device_timer(fn, x, params, packed, **T)
        name = label or 'full (head)'
        print(f'{name:12s}: {t * 1e3:7.3f} ms  (+{(t - prev) * 1e3:6.3f})',
              flush=True)
        prev = t
    print(f'=> {args.batch / prev:.1f} img/s b{args.batch} {args.dtype}',
          flush=True)


if __name__ == '__main__':
    main()
