#!/usr/bin/env python3
"""Per-segment timing of the YOLOv3-416 detector forward (round 4).

After cross-frame crop compaction the detect graph is ~40% of a mixed
serving window and 100% of the rung-0 idle tier (PERF.md), but nothing
has profiled INSIDE the darknet forward. This times nested prefixes of
the block list (the same chained on-chip method as
scripts/bench_fused_breakdown.py) so each backbone stage / FPN head is
the difference of two prefix timings.

Segments (block-index cut points of darknet.yolov3_blocks):
  conv0 [0,1)        416^2, 3->32   (3 input lanes: MXU-starved)
  s64   [1,5)        208^2, 32/64
  s128  [5,12)       104^2, 64/128
  s256  [12,37)      52^2, 128/256  (8 residual units)
  s512  [37,62)      26^2, 256/512  (8 residual units)
  s1024 [62,75)      13^2, 512/1024 (4 residual units)
  head1 [75,83)      13^2 FPN head + yolo decode
  head2 [83,95)      26^2 head
  head3 [95,107)     52^2 head

Usage: python scripts/bench_darknet_layers.py [--batch 8] [--dtype int8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.detectors import darknet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.utils.profiling import device_timer

CUTS = [('conv0', 1), ('s64', 5), ('s128', 12), ('s256', 37),
        ('s512', 62), ('s1024', 75), ('head1', 83), ('head2', 95),
        ('head3', 107)]


def prefix_apply(params, blocks, x, img_size, dtype, stop):
    """darknet.apply's loop, cut after `stop` blocks; returns every live
    tensor at the cut (current feature + any decoded heads) so the timed
    chain keeps the whole prefix alive."""
    outputs, detections = [], []
    for i, blk in enumerate(blocks[:stop]):
        t = blk['type']
        if t == 'convolutional':
            node = params[f'conv_{i}']
            y = L.conv2d(x, node, stride=blk['stride'], padding=blk['pad'],
                         dtype=dtype)
            if 'bn' in node:
                y = L.batch_norm(y, node['bn'])
            if blk['activation'] == 'leaky':
                y = jax.nn.leaky_relu(y, 0.1)
            x = y
        elif t == 'shortcut':
            x = x + outputs[i + blk['from']]
        elif t == 'route':
            feats = [outputs[l if l >= 0 else i + l] for l in blk['layers']]
            x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)
        elif t == 'upsample':
            x = L.upsample_nearest(x, blk['stride'])
        elif t == 'yolo':
            detections.append(
                darknet._yolo_decode(x.astype(jnp.float32), blk, img_size))
        outputs.append(x)
    return (x, *detections)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtype', default='int8', choices=['int8', 'bf16'])
    ap.add_argument('--size', type=int, default=416)
    args = ap.parse_args()
    print(f'devices: {jax.devices()}', flush=True)

    blocks = darknet.yolov3_blocks()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.size, args.size, 3)),
                    jnp.float32)

    params = darknet.fold_weights(
        darknet.init(jax.random.PRNGKey(0), blocks))
    if args.dtype == 'int8':
        from simple_hrnet_tpu.models import quantize as Q
        amax = Q.calibrate_cpu(
            lambda p, v: darknet.apply(p, blocks, v, args.size), params,
            [np.asarray(Q.smooth_frames((args.size, args.size)))])
        params = Q.quantize_folded(params, amax)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    dtype = jnp.bfloat16

    T = dict(iters_lo=2, iters_hi=42, repeats=3)
    print(f'[darknet-layers] YOLOv3-{args.size} b{args.batch} {args.dtype}: '
          f'prefix / segment ms (per batch)')
    prev_t, prev_name = 0.0, None
    for name, stop in CUTS:
        def f(xx, pp, stop=stop):
            return prefix_apply(pp, blocks, xx, args.size, dtype, stop)
        t = device_timer(f, x, params, **T)
        seg = (t - prev_t) * 1e3
        print(f'    {name:6s} prefix {t*1e3:7.3f} ms | segment {seg:7.3f} ms',
              flush=True)
        prev_t, prev_name = t, name
    print(f'[darknet-layers] full forward {prev_t*1e3:.3f} ms '
          f'({args.batch/prev_t:.1f} img/s)', flush=True)


if __name__ == '__main__':
    main()
