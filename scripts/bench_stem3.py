#!/usr/bin/env python3
"""Does folding normalize into conv1 (+ bf16 crop output) help the REAL
pipeline shape, or does XLA's elementwise fusion already hide it?

Simulates the fused multi-person graph's pose entry: frame -> 8 person
crops (two dense matmuls each, the production crop path) -> clip ->
normalize -> conv1(bf16). Variants:

  base:   crops f32 -> clip+normalize (f32) -> conv1 w/ in-graph bf16 cast
  folded: crops cast bf16 at the matmul epilogue -> clip -> conv1 with
          normalize folded into the kernel (k *= 1/(255 std)) + a static
          position-dependent bias FIELD (border-exact: the zero padding
          of normalized space contributes kernel.b only where taps fall
          inside the image — F = conv(b * ones) reproduces it exactly).

Parity asserted to bf16 tolerance. Usage: python scripts/bench_stem3.py
Serialize with other TPU benchmarks.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops import image as I
    from simple_hrnet_tpu.utils.profiling import device_timer

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=48,
                                          nof_joints=17))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.integers(0, 255, (480, 640, 3)), jnp.float32)
    # 8 person crops: two dense sampling matrices each (the production
    # PIL-matmul crop path); random boxes -> random row/col weights with
    # the right shapes and ~2-tap rows
    n_crops, out_h, out_w = 8, 384, 288

    def sampling(out_size, in_size, lo, hi):
        w = np.zeros((out_size, in_size), np.float32)
        src = np.linspace(lo, hi, out_size)
        base = np.clip(src.astype(int), 0, in_size - 2)
        frac = np.clip(src - base, 0, 1)
        w[np.arange(out_size), base] = 1 - frac
        w[np.arange(out_size), base + 1] = frac
        return w

    wr = jnp.asarray(np.stack([sampling(out_h, 480, 10 + 5 * i, 400 + 5 * i)
                               for i in range(n_crops)]))
    wc = jnp.asarray(np.stack([sampling(out_w, 640, 20 + 7 * i, 500 + 3 * i)
                               for i in range(n_crops)]))
    T = dict(iters_lo=2, iters_hi=102, repeats=3)
    dt = jnp.bfloat16

    def crops_of(f, cast=None):
        x = jnp.einsum('nrh,hwc->nrwc', wr, f)
        x = jnp.einsum('npw,nrwc->nrpc', wc, x)
        x = jnp.clip(x, 0.0, 255.0)
        return x.astype(cast) if cast is not None else x

    def base(f, p):
        x = I.normalize(crops_of(f))
        return L.conv_bn(x, p, 'conv1', 'bn1', stride=2, padding=1,
                         act=True, dtype=dt)

    # folded params: kernel scaled per input channel, bias -> static field
    mean = np.asarray(I.IMAGENET_MEAN, np.float32)
    std = np.asarray(I.IMAGENET_STD, np.float32)
    a = 1.0 / (255.0 * std)
    b = -mean / std
    k = np.asarray(params['conv1']['kernel'], np.float32)
    k_folded = jnp.asarray(k * a[None, None, :, None])
    bias0 = np.asarray(params['conv1']['bias'], np.float32)
    ones_b = jnp.asarray(np.broadcast_to(b, (1, out_h, out_w, 3)))
    field = jax.lax.conv_general_dilated(
        ones_b, jnp.asarray(k), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + bias0
    field = jnp.asarray(np.asarray(field))  # static constant

    def folded(f, p):
        x = crops_of(f, cast=dt)
        out = jax.lax.conv_general_dilated(
            x, k_folded.astype(dt), (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jax.nn.relu(out + field.astype(out.dtype))

    ref = np.asarray(base(frame, params), np.float32)
    got = np.asarray(folded(frame, params), np.float32)
    scale = max(np.abs(ref).max(), 1e-6)
    print(f'parity max|diff| (rel): {np.abs(ref - got).max() / scale:.3e}',
          flush=True)

    tb = device_timer(base, frame, params, **T)
    print(f'base   (f32 norm + in-graph cast): {tb * 1e3:7.3f} ms', flush=True)
    tf = device_timer(folded, frame, params, **T)
    print(f'folded (bf16 crops, fused norm):   {tf * 1e3:7.3f} ms '
          f'({tb / tf:.2f}x, {(tb - tf) * 1e3:+.3f} ms/8 crops)', flush=True)


if __name__ == '__main__':
    main()
