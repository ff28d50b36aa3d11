#!/usr/bin/env python3
"""Measure the training input pipeline against the W48 train-step rate.

VERDICT r2 item #5: "host input never stalls the TPU" was asserted
(data/loader.py:7) but never demonstrated. This script generates a
synthetic COCO dataset at realistic frame sizes, then measures
samples/second of:

  * ``COCODataset.__getitem__`` single-threaded (cv2 path vs the fused
    native JPEG->warp->normalize path, ``use_native_decode=True``);
  * the threaded ``data.loader.DataLoader`` at several worker counts
    (the reference trains with DataLoader(num_workers=4),
    /root/reference/training/Train.py:212-218).

Compare the printed loader rate against the measured W48-384x288 b16
train step (254 img/s on one v5e chip, PERF.md "Training step") — the
loader must exceed it for the step to never stall. Run this on the
training host; results for THIS machine (1 CPU core) are recorded in
PERF.md ("Input pipeline vs train step").

Usage: python scripts/bench_input_pipeline.py [--images 64] [--people 2]
       [--hw 480,640] [--batch 16] [--seconds 20]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root, n_images, people, hw, rng):
    import cv2
    os.makedirs(os.path.join(root, 'train2017'), exist_ok=True)
    os.makedirs(os.path.join(root, 'annotations'), exist_ok=True)
    h, w = hw
    images, annotations = [], []
    ann_id = 1
    base = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    for img_id in range(1, n_images + 1):
        # cheap unique-ish photos: shifted copies of one noise frame
        img = np.roll(base, img_id * 37, axis=1)
        cv2.imwrite(os.path.join(root, 'train2017', '%012d.jpg' % img_id),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append({'id': img_id, 'width': w, 'height': h,
                       'file_name': '%012d.jpg' % img_id})
        for _ in range(people):
            x, y = rng.integers(5, w // 3), rng.integers(5, h // 3)
            bw, bh = rng.integers(w // 4, w // 2), rng.integers(h // 4, h // 2)
            kpts = []
            for _ in range(17):
                kpts.extend([float(np.clip(x + rng.uniform(0, bw), 0, w - 1)),
                             float(np.clip(y + rng.uniform(0, bh), 0, h - 1)),
                             2])
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'iscrowd': 0,
                'bbox': [float(x), float(y), float(bw), float(bh)],
                'area': float(bw * bh), 'keypoints': kpts,
                'num_keypoints': 17})
            ann_id += 1
    with open(os.path.join(root, 'annotations',
                           'person_keypoints_train2017.json'), 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{'id': 1, 'name': 'person'}]}, f)


def rate_getitem(ds, seconds, rng):
    n = len(ds)
    count = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        ds[int(rng.integers(0, n))]
        count += 1
    return count / (time.perf_counter() - t0)


def rate_loader(ds, batch, workers, seconds):
    from simple_hrnet_tpu.data.loader import DataLoader
    dl = DataLoader(ds, batch_size=batch, shuffle=True,
                    num_workers=workers, drop_last=True)
    count = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for b in dl:
            count += b[0].shape[0]
            if time.perf_counter() - t0 >= seconds:
                break
    return count / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--images', type=int, default=64)
    ap.add_argument('--people', type=int, default=2)
    ap.add_argument('--hw', default='480,640')
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--seconds', type=float, default=20.0)
    ap.add_argument('--step-rate', type=float, default=254.0,
                    help='img/s of the train step to compare against '
                         '(PERF.md: W48-384x288 b16 bf16 on one v5e)')
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.hw.split(','))
    rng = np.random.default_rng(0)

    from simple_hrnet_tpu.data.coco import COCODataset

    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, args.images, args.people, hw, rng)
        results = {}
        # device_targets=True is the TPU-side-tail mode: the host stops at
        # the warp (no normalize, no gaussian stamping, no 470 KB/sample
        # target collate) — train/steps.py runs those in-graph
        for native in (False, True):
            for devt in (False, True):
                try:
                    ds = COCODataset(root_path=root,
                                     data_version='train2017',
                                     is_train=True, use_native_decode=native,
                                     device_targets=devt)
                except Exception as e:
                    print(f'native={native}: unavailable ({e})')
                    continue
                tag = ('native' if native else 'cv2') + \
                    ('+devt' if devt else '')
                r1 = rate_getitem(ds, args.seconds, rng)
                results[f'getitem_{tag}'] = r1
                print(f'{tag:12s} __getitem__ 1-thread: {r1:7.1f} samples/s',
                      flush=True)
                for workers in (1, 2, 4):
                    r = rate_loader(ds, args.batch, workers, args.seconds)
                    results[f'loader_{tag}_w{workers}'] = r
                    print(f'{tag:12s} loader b{args.batch} x{workers} '
                          f'workers: {r:7.1f} samples/s '
                          f'({r / args.step_rate:4.2f}x the '
                          f'{args.step_rate:.0f} img/s W48 step)',
                          flush=True)
        best = max(results.values()) if results else 0.0
        verdict = 'feeds' if best >= args.step_rate else 'STALLS'
        print(f'\nbest loader rate {best:.1f} img/s vs step '
              f'{args.step_rate:.0f} img/s -> host {verdict} the TPU')


if __name__ == '__main__':
    main()
