#!/usr/bin/env python3
"""Where stem+layer1's 2.17 ms goes (W48-384x288 b16 bf16, PERF.md
"where the time goes" row 1), and whether a space-to-depth stem helps.

Prefix timing: conv1 | +conv2 | +layer1. Then the MLPerf-style
space-to-depth alternative for conv1 (stride-2 3x3 C_in=3 wastes
125/128 of the MXU contraction dim): 2x2 space-to-depth -> C_in=12,
kernel zero-padded 3x3->4x4 and rearranged to a stride-1 2x2 conv over
the half-res input — the exact same dot products, K=12 instead of 3.

Usage: python scripts/bench_stem.py [--batch 16]
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
    ap.add_argument('--batch', type=int, default=16)
    args = ap.parse_args()

    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.utils.profiling import device_timer

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=48,
                                          nof_joints=17))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 384, 288, 3)),
                    jnp.float32)
    T = dict(iters_lo=2, iters_hi=202, repeats=3)
    dt = jnp.bfloat16

    def conv1(v, p):
        return L.conv_bn(v, p, 'conv1', 'bn1', stride=2, padding=1,
                         act=True, dtype=dt)

    def stem_layer1(v, p):
        h = L.conv_bn(v, p, 'conv1', 'bn1', stride=2, padding=1, act=True,
                      dtype=dt)
        h = L.conv_bn(h, p, 'conv2', 'bn2', stride=2, padding=1, act=True,
                      dtype=dt)
        for i in range(4):
            h = L.bottleneck(p['layer1'][str(i)], h, dtype=dt)
        return h

    t1 = device_timer(conv1, x, params, **T)
    print(f'conv1 (3->64, 384x288 s2):        {t1 * 1e3:7.3f} ms', flush=True)

    def c12(v, p):
        h = conv1(v, p)
        return L.conv_bn(h, p, 'conv2', 'bn2', stride=2, padding=1,
                         act=True, dtype=dt)

    t12 = device_timer(c12, x, params, **T)
    print(f'+conv2 (64->64, 192x144 s2):      {t12 * 1e3:7.3f} ms '
          f'(+{(t12 - t1) * 1e3:.3f})', flush=True)
    tsl = device_timer(stem_layer1, x, params, **T)
    print(f'+layer1 (4 bottlenecks, 96x72):   {tsl * 1e3:7.3f} ms '
          f'(+{(tsl - t12) * 1e3:.3f})', flush=True)

    # ---- space-to-depth conv1: exact kernel transform ----
    k = np.asarray(params['conv1']['kernel'], np.float32)  # (3,3,3,64)
    k4 = np.zeros((4, 4, 3, 64), np.float32)
    k4[:3, :3] = k  # pad; stride-2 3x3 from even offsets never reads row/col 3
    # torch 'same' s2 pad=1: output (i,j) reads input rows 2i-1..2i+1.
    # Shift content by +1 (pre-pad the input once) so reads start at 2i.
    ks2d = k4.reshape(2, 2, 2, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
             .reshape(2, 2, 12, 64)
    ks2d = jnp.asarray(ks2d)

    def conv1_s2d(v, p):
        # pre-pad so the 4x4 window starting at even rows covers pad=1
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        n, h, w, c = vp.shape
        s2d = vp.reshape(n, h // 2, 2, w // 2, 2, c) \
                .transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        out = jax.lax.conv_general_dilated(
            s2d.astype(dt), ks2d.astype(dt), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = out + p['conv1']['bias'].astype(out.dtype)
        return jax.nn.relu(out)

    # parity check (f32 path on the same device)
    ref = np.asarray(conv1(x[:2], params), np.float32)
    got = np.asarray(conv1_s2d(x[:2], params), np.float32)
    print(f's2d parity max|diff|: {np.abs(ref - got).max():.3e} '
          f'(shapes {ref.shape} vs {got.shape})', flush=True)

    ts = device_timer(conv1_s2d, x, params, **T)
    print(f'conv1 space-to-depth (12->64):    {ts * 1e3:7.3f} ms '
          f'({t1 / ts:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
