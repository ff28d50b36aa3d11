#!/usr/bin/env python3
"""Multi-person end-to-end throughput: fused detect+crop+pose+decode.

Measures (chained on-chip timing; the timed scalar consumes EVERY output
so nothing is dead-code-eliminated — see utils/profiling.device_timer):

  * fused single-frame graph (the predict_stream shape): 1 frame,
    8 people slots;
  * fused BATCHED graphs (b4 / b8 frames x 8 slots): the aggregate
    serving shape (VERDICT r2 #7) — the pose batch becomes 32/64 crops;
  * optionally the same with YOLOv5 (BASELINE.json config 5: "End-to-end
    video: YOLOv5 + HRNet-W48 multi-person" — the reference's
    extract-keypoints path, scripts/extract-keypoints.py:120-121).

Usage: python scripts/bench_fused_e2e.py [--yolo v3|v5|both]
       [--dtype int8|bf16] [--hw 480,640] [--slots 8] [--batches 1,4,8]

Serialize runs — never two TPU benchmarks concurrently (PERF.md).
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
    ap.add_argument('--yolo', default='v3', choices=('v3', 'v5', 'both'))
    ap.add_argument('--dtype', default='int8', choices=('int8', 'bf16'))
    ap.add_argument('--hw', default='480,640')
    ap.add_argument('--slots', type=int, default=8)
    ap.add_argument('--batches', default='1,4,8')
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(','))
    batches = [int(v) for v in args.batches.split(',')]

    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.utils import checkpoint as ckpt
    from simple_hrnet_tpu.utils.profiling import device_timer

    path = '/tmp/bench_w48_random.npz'
    if not os.path.exists(path):
        ckpt.save(path, hrnet.init(jax.random.PRNGKey(0), c=48,
                                   nof_joints=17))
    rng = np.random.default_rng(1)

    versions = ('v3', 'v5') if args.yolo == 'both' else (args.yolo,)
    for ver in versions:
        kw = dict(yolo_version='v3', yolo_model_def='yolov3') \
            if ver == 'v3' else dict(yolo_version='v5',
                                     yolo_model_def='yolov5m')
        model = SimpleHRNet(48, 17, path, resolution=(384, 288),
                            multiperson=True, dtype=args.dtype
                            if args.dtype == 'int8' else 'bfloat16', **kw)
        for b in batches:
            if b == 1:
                run = model._get_fused_frame(hw, args.slots)
                frame = jnp.asarray(rng.integers(0, 255, (*hw, 3)),
                                    jnp.float32)
            else:
                run = model._get_fused_frames(hw, args.slots, b)
                frame = jnp.asarray(rng.integers(0, 255, (b, *hw, 3)),
                                    jnp.float32)
            t = device_timer(lambda f, pp, dp: run(pp, dp, f), frame,
                             model.params, model.detector.params,
                             iters_lo=2, iters_hi=42, repeats=3)
            print(f'yolo{ver}+W48 {args.dtype} {hw[1]}x{hw[0]} '
                  f'b{b} x{args.slots} slots: {t*1e3:7.2f} ms/launch = '
                  f'{b/t:6.1f} frames/s/chip '
                  f'({b*args.slots/t:7.1f} crops/s)', flush=True)


if __name__ == '__main__':
    main()
