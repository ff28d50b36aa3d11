#!/usr/bin/env python3
"""End-to-end training EPOCH timing with the real loader in the loop.

VERDICT r2 item #5 asked for an epoch timing with the actual input
pipeline feeding the actual train step (not the two measured separately).
This script builds a synthetic COCO dataset at realistic frame sizes and
times ``Train._train()`` wall-clock — DataLoader workers, host aug, the
jitted step, and the per-step loss/PCK readbacks all in the loop, exactly
the loop ``scripts/train_coco.py`` runs (reference: Train.py:236-262).

Modes compared (same model, same step config):
  * host-targets   — the classic pipeline: host does decode+warp+normalize
                     + gaussian stamping; step consumes image/target.
  * device-targets — the host stops at the warp; ImageNet normalize and
                     target generation run in-graph (train/steps.py).

Notes for reading results in THIS environment: the per-step loss
float() + PCK readback synchronizes every step, so through the TPU relay
each step pays a host round-trip on top of compute — identical in both
modes, so the comparison stands; on a local chip the absolute rates rise.

Usage: python scripts/bench_epoch.py [--images 256] [--batch 16]
       [--model_c 48] [--resolution 384,288] [--dtype bfloat16]
       [--grouped] [--workers 2] [--epochs 1]
"""
import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

_spec = importlib.util.spec_from_file_location(
    'bench_input_pipeline', os.path.join(REPO, 'scripts',
                                         'bench_input_pipeline.py'))
_bip = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bip)


def run_epochs(root, args, device_targets):
    from simple_hrnet_tpu.data import native as native_img
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.train.trainer import Train

    h, w = args.res
    ds = COCODataset(root_path=root, data_version='train2017',
                     is_train=True, image_width=w, image_height=h,
                     use_native_decode=native_img.available(),
                     device_targets=device_targets)
    train = Train(exp_name='bench-epoch', ds_train=ds, ds_val=ds,
                  epochs=1, batch_size=args.batch,
                  num_workers=args.workers, lr=1e-3, lr_decay=False,
                  optimizer='Adam', log_path=tempfile.mkdtemp(),
                  use_tensorboard=False, model_c=args.model_c,
                  model_nof_joints=17, flip_test_images=False,
                  dtype=args.dtype, use_grouped_trunk=args.grouped,
                  device_targets=device_targets)
    n = len(train.dl_train) * args.batch
    train._train()  # warmup epoch: compiles the step, warms the page cache
    t0 = time.perf_counter()
    for _ in range(args.epochs):
        train._train()
    dt = (time.perf_counter() - t0) / args.epochs
    return n / dt, dt, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=256)
    ap.add_argument('--people', type=int, default=1)
    ap.add_argument('--hw', default='480,640', help='source frame size')
    ap.add_argument('--resolution', default='384,288')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--model_c', type=int, default=48)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--grouped', action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument('--workers', type=int, default=2)
    ap.add_argument('--epochs', type=int, default=1)
    args = ap.parse_args()
    args.res = tuple(int(v) for v in args.resolution.split(','))
    hw = tuple(int(v) for v in args.hw.split(','))

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        _bip.make_dataset(root, args.images, args.people, hw, rng)
        out = {}
        for devt in (False, True):
            tag = 'device-targets' if devt else 'host-targets'
            rate, dt, n = run_epochs(root, args, devt)
            out[tag] = round(rate, 1)
            print(f'{tag:15s}: epoch of {n} samples in {dt:.2f} s '
                  f'-> {rate:.1f} img/s end-to-end', flush=True)
        print(json.dumps({'metric': 'train epoch end-to-end (W%d %dx%d '
                                    'b%d, loader in the loop)'
                                    % (args.model_c, *args.res, args.batch),
                          'unit': 'img/s', **out}))


if __name__ == '__main__':
    main()
