#!/usr/bin/env python3
"""Crop-resampler shootout on TPU: gather-based 4-tap bilinear vs the
dense-matmul PIL (AA) crop, at the fused multi-person shapes.

Motivation (round 3): the fused e2e graph spent most of its 40 ms/frame
OUTSIDE detector+pose; TPU gathers are slow and each 384x288 crop does
4 taps x 3ch = 1.3M gathered elements. The PIL crop is two dense matmuls
per crop (MXU work instead of gathers) AND is the reference's exact
resampler — if it also wins on speed it becomes the default.

Usage: python scripts/bench_crops.py [--hw 480,640] [--res 384,288]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops import image as I
from simple_hrnet_tpu.utils.profiling import device_timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--hw', default='480,640')
    ap.add_argument('--res', default='384,288')
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(','))
    res = tuple(int(v) for v in args.res.split(','))

    rng = np.random.default_rng(0)
    T = dict(iters_lo=2, iters_hi=42, repeats=3)

    def boxes_for(n):
        b = rng.uniform(0, min(hw) // 2, (n, 2))
        wh2 = rng.uniform(80, 300, (n, 2))
        bx = np.concatenate([b, b + wh2], axis=1).astype(np.float32)
        return jnp.asarray(np.round(bx))

    for n_frames, slots in ((1, 8), (8, 8)):
        frames = jnp.asarray(
            rng.integers(0, 255, (n_frames, *hw, 3)), jnp.float32)
        pb = I.pad_to_aspect(boxes_for(n_frames * slots), res[0] / res[1])
        pbr = pb.reshape(n_frames, slots, 4)

        def tap_crops(f, b):
            return jax.vmap(lambda img, bb: jax.vmap(
                lambda box: I.crop_resize(img, box, res))(bb))(f, b)

        def pil_crops(f, b):
            return jax.vmap(lambda img, bb: jax.vmap(
                lambda box: I.crop_resize_pil(img, box, res))(bb))(f, b)

        t1 = device_timer(tap_crops, frames, pbr, **T)
        t2 = device_timer(pil_crops, frames, pbr, **T)
        n = n_frames * slots
        print(f'{n_frames}f x {slots} slots ({n} crops {hw}->{res}):')
        print(f'  4-tap gather crop : {t1*1e3:8.3f} ms '
              f'({t1/n*1e6:7.1f} us/crop)')
        print(f'  PIL matmul crop   : {t2*1e3:8.3f} ms '
              f'({t2/n*1e6:7.1f} us/crop)  {t1/t2:5.2f}x', flush=True)

    # compacted-index variant (the _run_gathered shape): 16 crops from
    # 8 frames with arbitrary frame indices, frame_index tap gathers
    frames = jnp.asarray(rng.integers(0, 255, (8, *hw, 3)), jnp.float32)
    fi = jnp.asarray(rng.integers(0, 8, 16), jnp.int32)
    pb = I.pad_to_aspect(boxes_for(16), res[0] / res[1])

    def gather_fi(f, idx, b):
        return jax.vmap(lambda i, box: I.crop_resize(
            f, box, res, frame_index=i))(idx, b)

    def gather_sel(f, idx, b):
        return jax.vmap(lambda i, box: I.crop_resize(f[i], box, res))(idx, b)

    t3 = device_timer(gather_fi, frames, fi, pb, **T)
    t4 = device_timer(gather_sel, frames, fi, pb, **T)
    print(f'compacted 16 crops / 8 frames:')
    print(f'  frame_index taps  : {t3*1e3:8.3f} ms')
    print(f'  rgb[f] per crop   : {t4*1e3:8.3f} ms  ({t4/t3:5.2f}x slower)',
          flush=True)


if __name__ == '__main__':
    main()
