#!/usr/bin/env python3
"""Follow-up to bench_stem.py: can space-to-depth conv1 win if the
relayout is cheap (strided slices) or free (pre-sliced input, as the
crop matmuls could emit it)?

bench_stem.py measured: conv1 (3->64 s2, 384x288) = 0.999 ms of the
1.88 ms stem+layer1 — but the reshape/transpose s2d formulation is
0.55x (the 6-D transpose relayout dominates). Variants here:

  A. conv1, input pre-cast to bf16 (is the f32 input read the cost?)
  B. s2d via 4 strided H/W slices + lane concat (no 6-D transpose)
  C. s2d conv ONLY, (n,193,145,12) input precomputed = the floor the
     crop-matmul integration would hit (the crop can emit the four
     parity slices by static row/col-weight slicing, zero extra work)

Usage: python scripts/bench_stem2.py [--batch 16]
Serialize with other TPU benchmarks.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def s2d_kernel(k: np.ndarray) -> np.ndarray:
    """(3,3,3,64) stride-2 pad-1 kernel -> (2,2,12,64) stride-1 kernel
    over the +1-pre-padded, 2x2 space-to-depth input.

    Channel order matches concat([ee, eo, oe, oo], lanes): ch =
    (a*2+b)*3+c where (a,b) = row/col parity. Exact transform — the
    stride-2 3x3 window from even offsets never reads row/col 3 of the
    zero-padded 4x4 kernel."""
    k4 = np.zeros((4, 4, 3, 64), np.float32)
    k4[:3, :3] = k
    return k4.reshape(2, 2, 2, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
             .reshape(2, 2, 12, 64)


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

    t1 = device_timer(conv1, x, params, **T)
    print(f'conv1 baseline (f32 in):          {t1 * 1e3:7.3f} ms', flush=True)

    xb = x.astype(dt)
    ta = device_timer(conv1, xb, params, **T)
    print(f'A. conv1, bf16 input:             {ta * 1e3:7.3f} ms '
          f'({t1 / ta:.2f}x)', flush=True)

    ks2d = jnp.asarray(s2d_kernel(np.asarray(params['conv1']['kernel'],
                                             np.float32)))

    def conv_s2d(s2d_in, p):
        out = jax.lax.conv_general_dilated(
            s2d_in.astype(dt), ks2d.astype(dt), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        out = out + p['conv1']['bias'].astype(out.dtype)
        return jax.nn.relu(out)

    def conv1_s2d_slices(v, p):
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        s2d = jnp.concatenate(
            [vp[:, 0::2, 0::2], vp[:, 0::2, 1::2],
             vp[:, 1::2, 0::2], vp[:, 1::2, 1::2]], axis=-1)
        return conv_s2d(s2d, p)

    ref = np.asarray(conv1(x[:2], params), np.float32)
    got = np.asarray(conv1_s2d_slices(x[:2], params), np.float32)
    print(f'B parity max|diff|: {np.abs(ref - got).max():.3e}', flush=True)

    tb = device_timer(conv1_s2d_slices, x, params, **T)
    print(f'B. s2d via 4 strided slices:      {tb * 1e3:7.3f} ms '
          f'({t1 / tb:.2f}x)', flush=True)

    s2d_in = jnp.asarray(np.asarray(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ))
    s2d_in = jnp.concatenate(
        [s2d_in[:, 0::2, 0::2], s2d_in[:, 0::2, 1::2],
         s2d_in[:, 1::2, 0::2], s2d_in[:, 1::2, 1::2]], axis=-1)
    s2d_in.block_until_ready()
    tc = device_timer(conv_s2d, s2d_in, params, **T)
    print(f'C. s2d conv only (input ready):   {tc * 1e3:7.3f} ms '
          f'({t1 / tc:.2f}x)', flush=True)

    s2d_b = s2d_in.astype(dt)
    s2d_b.block_until_ready()
    tcb = device_timer(conv_s2d, s2d_b, params, **T)
    print(f'C2. same, bf16 input:             {tcb * 1e3:7.3f} ms '
          f'({t1 / tcb:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
