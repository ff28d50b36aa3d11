#!/usr/bin/env python3
"""Benchmark the Pallas bitmask NMS IN-GRAPH vs nms_jax (VERDICT r2 #4).

The production YOLOv3 detect jit runs ops/nms.nms_jax (detectors/
yolov3.py); the Pallas kernel (ops/pallas/nms_pallas.py — the
nms_kernel.cu analogue) was parity-tested but never timed at the real
shape inside the detect graph. This script times, one serialized TPU
session:

  * standalone NMS at the detector's post-top-k shape (256 candidates,
    max_det kept), nms_jax vs nms_pallas;
  * the FULL detect jit (letterbox + darknet fwd + top-k + NMS +
    rescale) at 480x640 with each NMS, b1 and b16.

Usage: python scripts/bench_nms_ingraph.py [--model yolov3|yolov3-tiny]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops import nms as nms_ops
from simple_hrnet_tpu.ops.pallas.nms_pallas import nms_pallas
from simple_hrnet_tpu.utils.profiling import device_timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model', default='yolov3')
    ap.add_argument('--hw', default='480,640')
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(','))

    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3
    rng = np.random.default_rng(0)
    T = dict(iters_lo=2, iters_hi=42, repeats=3)

    # standalone at the real post-top-k shape: 256 boxes, 64 kept
    n, max_det = 256, 64
    boxes = jnp.asarray(rng.uniform(0, 416, (n, 4)), jnp.float32)
    boxes = boxes.at[:, 2:].set(boxes[:, :2] + jnp.abs(boxes[:, 2:]) * 0.2
                                + 4.0)
    scores = jnp.asarray(rng.uniform(0, 1, (n,)), jnp.float32)

    t_jax = device_timer(
        lambda s, b: nms_ops.nms_jax(b, s, 0.3, max_det), scores, boxes, **T)
    print(f'standalone nms_jax    ({n} boxes): {t_jax*1e6:8.1f} us',
          flush=True)
    try:
        t_pal = device_timer(
            lambda s, b: nms_pallas(b, s, 0.3, max_det), scores, boxes, **T)
        print(f'standalone nms_pallas ({n} boxes): {t_pal*1e6:8.1f} us '
              f'({t_jax/t_pal:.2f}x)', flush=True)
    except Exception as e:
        print(f'standalone nms_pallas FAILED: {type(e).__name__}: {e}',
              flush=True)

    # batched standalone (the custom_vmap -> grid kernel path) + parity
    bn = 16
    bboxes = jnp.asarray(rng.uniform(0, 416, (bn, n, 4)), jnp.float32)
    bboxes = bboxes.at[..., 2:].set(bboxes[..., :2]
                                    + jnp.abs(bboxes[..., 2:]) * 0.2 + 4.0)
    bscores = jnp.asarray(rng.uniform(0, 1, (bn, n)), jnp.float32)
    vj = jax.jit(jax.vmap(lambda b, s: nms_ops.nms_jax(b, s, 0.3, max_det)))
    vp = jax.jit(jax.vmap(lambda b, s: nms_pallas(b, s, 0.3, max_det)))
    ij, vj_valid = vj(bboxes, bscores)
    ip, vp_valid = vp(bboxes, bscores)
    np.testing.assert_array_equal(np.asarray(vp_valid), np.asarray(vj_valid))
    np.testing.assert_array_equal(np.asarray(ip)[np.asarray(vj_valid)],
                                  np.asarray(ij)[np.asarray(vj_valid)])
    tbj = device_timer(lambda s, b: vj(b, s), bscores, bboxes, **T)
    tbp = device_timer(lambda s, b: vp(b, s), bscores, bboxes, **T)
    print(f'vmapped x{bn} nms_jax   : {tbj*1e6:8.1f} us', flush=True)
    print(f'vmapped x{bn} nms_pallas: {tbp*1e6:8.1f} us ({tbj/tbp:.2f}x, '
          f'parity OK)', flush=True)

    # full detect graph: nms_jax baseline vs the wired default
    # (nms_ingraph -> pallas on TPU)
    det = YOLOv3(model_def=args.model)
    for b in (1, 16):
        frames = jnp.asarray(rng.uniform(0, 255, (b, *hw, 3)), jnp.float32)
        orig = nms_ops.nms_ingraph
        nms_ops.nms_ingraph = nms_ops.nms_jax  # trace-time resolution
        try:
            det._detect_jit = {}
            fn = det.pure_fn(hw)
            t1 = device_timer(lambda f, p: fn(p, f), frames, det.params, **T)
        finally:
            nms_ops.nms_ingraph = orig
        print(f'{args.model} detect b{b} [nms_jax]:    {t1*1e3:7.2f} ms '
              f'({b/t1:6.1f} img/s)', flush=True)

        try:
            det._detect_jit = {}
            fn2 = det.pure_fn(hw)
            t2 = device_timer(lambda f, p: fn2(p, f), frames, det.params,
                              **T)
            print(f'{args.model} detect b{b} [default = nms_ingraph]: '
                  f'{t2*1e3:7.2f} ms ({b/t2:6.1f} img/s)  '
                  f'jax/pallas {t1/t2:.2f}x', flush=True)
        except Exception as e:
            print(f'{args.model} detect b{b} [nms_ingraph] FAILED: '
                  f'{type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
