#!/usr/bin/env python3
"""Production detect-graph effect of the phase stem (round 4).

Times the FULL jitted detect pipeline (letterbox -> darknet -> decode ->
top-K -> NMS -> rescale) with the producer-fused space-to-depth stem on
vs off, at the serving geometry (640x480 frames, batch 8, YOLOv3-416).
Chain-timed on chip (utils/profiling.device_timer). Serialize with other
TPU benchmarks.

Usage: python scripts/bench_phase_stem.py [--batch 8] [--dtypes int8,bf16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.detectors.yolov3 import YOLOv3
from simple_hrnet_tpu.utils.profiling import device_timer


def main():
    import faulthandler
    faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--dtypes', default='bf16,int8')
    args = ap.parse_args()
    print(f'devices: {jax.devices()}', flush=True)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (args.batch, 480, 640, 3)),
                         jnp.float32)
    T = dict(iters_lo=5, iters_hi=45, repeats=3)

    for dname in args.dtypes.split(','):
        dt = 'int8' if dname == 'int8' else jnp.bfloat16
        for ps in (False, True):
            print(f'[phase-stem] building {dname} phase={ps} ...', flush=True)
            det = YOLOv3(dtype=dt, phase_stem=ps)
            fn = det.pure_fn((480, 640))
            t = device_timer(lambda f, p: fn(p, f), frames, det.params, **T)
            tag = 'phase' if ps else 'std  '
            print(f'[phase-stem] {dname:4s} {tag} detect b{args.batch}: '
                  f'{t*1e3:7.3f} ms  ({args.batch/t:7.1f} img/s)', flush=True)


if __name__ == '__main__':
    main()
