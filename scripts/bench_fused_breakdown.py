#!/usr/bin/env python3
"""Where the time goes in the fused multi-person e2e graph.

Nested-prefix on-chip timing (the method scripts/bench_train_breakdown.py
established) of the north-star graph `api.SimpleHRNet._get_fused_frame`:

  det            frame -> letterbox -> YOLO forward -> NMS -> rescale
  +crops         + pad_to_aspect + PIL dense-matmul crops + normalize
  +pose          + HRNet-W48 forward (int8 grouped by default)
  +decode (full) + argmax_decode   == the production graph

Each prefix is a separate jit whose FULL output tree feeds the timed
chain (device_timer reduces every leaf — nothing is dead-code-
eliminated), so stage cost = difference of adjacent prefixes, with the
caveat that XLA may co-fuse across the cut points: the deltas are upper
bounds on what removing a stage would save.

Usage: python scripts/bench_fused_breakdown.py [--batches 1,8]
       [--dtype int8|bf16] [--yolo v3] [--slots 8] [--hw 480,640]

Serialize: NEVER run concurrently with another TPU benchmark (PERF.md).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_prefix(model, in_hw, max_people, n_frames, stage):
    """Prefix `stage` of the fused graph (mirrors api._get_fused_frames;
    stage in {'det', 'crops', 'pose', 'full'})."""
    from simple_hrnet_tpu.ops import decode as D
    from simple_hrnet_tpu.ops import image as I

    det_fn = model.detector.pure_fn(in_hw)
    res_h, res_w = model.resolution
    aspect = res_h / res_w
    apply_fn = model._apply
    dtype = model.dtype

    @jax.jit
    def run(pose_params, det_params, frames_bgr):
        rgb = frames_bgr[..., ::-1]
        rows, valid = det_fn(det_params, rgb.astype(jnp.float32))
        rows = rows[:, :max_people]
        valid = valid[:, :max_people]
        if stage == 'det':
            return rows, valid
        boxes = jnp.round(rows[..., :4]).reshape(-1, 4)
        padded = I.pad_to_aspect(boxes, aspect)

        def crop_frame(img, pb, ob):
            return jax.vmap(lambda b, o: I.crop_resize_pil(
                img, b, (res_h, res_w), valid_box=o))(pb, ob)

        crops = jax.vmap(crop_frame)(
            rgb, padded.reshape(n_frames, max_people, 4),
            boxes.reshape(n_frames, max_people, 4))
        crops = crops.reshape(-1, res_h, res_w, 3)
        x = I.normalize(jnp.clip(jnp.round(crops), 0.0, 255.0))
        if stage == 'crops':
            return valid, padded, x
        hm = apply_fn(pose_params, x, dtype=dtype)
        if stage == 'pose':
            return valid, padded, hm
        pts = D.argmax_decode(hm, padded)
        return valid, padded, hm, pts

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', default='1,8')
    ap.add_argument('--dtype', default='int8', choices=('int8', 'bf16'))
    ap.add_argument('--yolo', default='v3')
    ap.add_argument('--slots', type=int, default=8)
    ap.add_argument('--hw', default='480,640')
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(','))

    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.utils import checkpoint as ckpt
    from simple_hrnet_tpu.utils.profiling import device_timer

    path = '/tmp/bench_w48_random.npz'
    if not os.path.exists(path):
        ckpt.save(path, hrnet.init(jax.random.PRNGKey(0), c=48,
                                   nof_joints=17))
    model = SimpleHRNet(
        48, 17, path, resolution=(384, 288), multiperson=True,
        yolo_version=args.yolo,
        yolo_model_def='yolov3' if args.yolo == 'v3' else 'yolov5m',
        dtype='int8' if args.dtype == 'int8' else 'bfloat16')
    rng = np.random.default_rng(1)
    T = dict(iters_lo=2, iters_hi=42, repeats=3)

    for nb in (int(v) for v in args.batches.split(',')):
        frames = jnp.asarray(
            rng.integers(0, 255, (nb, *hw, 3)), jnp.float32)
        prev = 0.0
        print(f'--- {args.yolo}+W48 {args.dtype} {hw[1]}x{hw[0]} '
              f'b{nb} x{args.slots} slots ---', flush=True)
        for stage in ('det', 'crops', 'pose', 'full'):
            run = build_prefix(model, hw, args.slots, nb, stage)
            t = device_timer(lambda f, pp, dp: run(pp, dp, f), frames,
                             model.params, model.detector.params, **T)
            ms = t * 1e3
            print(f'  {stage:7s} {ms:8.2f} ms  (+{ms - prev:7.2f})',
                  flush=True)
            prev = ms
        print(f'  => {nb / t:7.1f} frames/s/chip', flush=True)


if __name__ == '__main__':
    main()
