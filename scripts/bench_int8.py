"""Reproduce the int8 e2e measurements in PERF.md round 2c.

Usage: python scripts/bench_int8.py [--model w48|w32] [--batches 16,64]

Times the grouped production forward in bf16 vs int8 (calibrated PTQ,
models/quantize.py) with chained on-chip timing. Serialize runs — never
benchmark two TPU processes concurrently (PERF.md measurement notes).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet, hrnet_fast
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.models import quantize as Q
from simple_hrnet_tpu.utils.profiling import device_timer

CFG = {'w48': (48, (384, 288), 2), 'w32': (32, (256, 192), 4)}


def main(model='w48', batches=(16,)):
    c, res, group = CFG[model]
    T = dict(iters_lo=2, iters_hi=42, repeats=5)
    rng = np.random.default_rng(0)
    J = jax.tree_util.tree_map

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=c,
                                          nof_joints=17))
    amax = Q.calibrate_cpu(lambda p, v: hrnet.apply(p, v), params,
                           [Q.smooth_frames(res)])
    packed = J(jnp.asarray, hrnet_fast.pack_grouped(params, group=group))
    packed_q = J(jnp.asarray, hrnet_fast.pack_grouped(params, group=group,
                                                      int8_amax=amax))
    params_q = J(jnp.asarray, Q.quantize_folded(params, amax))
    params = J(jnp.asarray, params)
    lanes = group * c == 128

    for b in batches:
        x = jnp.asarray(rng.standard_normal((b, *res, 3)), jnp.float32)
        tb = device_timer(lambda v, p, pk: hrnet_fast.apply_grouped(
            p, pk, v, dtype=jnp.bfloat16, fuse_up_pallas=lanes),
            x, params, packed, **T)
        ti = device_timer(lambda v, p, pk: hrnet_fast.apply_grouped(
            p, pk, v, dtype=jnp.bfloat16, fuse_up_pallas=lanes),
            x, params_q, packed_q, **T)
        print(f'{model} b{b}: bf16 {tb*1e3:7.3f} ms ({b/tb:6.1f} img/s)  '
              f'int8 {ti*1e3:7.3f} ms ({b/ti:6.1f} img/s)  {tb/ti:.2f}x',
              flush=True)


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', choices=('w48', 'w32'), default='w48')
    ap.add_argument('--batches', default='16')
    a = ap.parse_args()
    main(a.model, tuple(int(b) for b in a.batches.split(',')))
