#!/usr/bin/env python3
"""Record a pycocotools COCOeval fixture for bit-checking the native AP
evaluator (simple_hrnet_tpu/utils/metrics.py:coco_eval_native).

pycocotools is NOT installable in the build environment (zero egress), so
the native reimplementation of COCOeval's keypoint matching is pinned only
by hand-computed analytic fixtures. Run THIS script in any environment
that has pycocotools:

    python scripts/dump_pycocotools_fixture.py \
        [--out tests/goldens/pycocotools_coco_eval.json]

It generates deterministic synthetic GT/detection sets that exercise the
tricky COCOeval paths (crowd re-matching, keypoint-less GTs and their
bbox-rect OKS branch, area-range ignores, maxDets truncation, score ties,
images with only GTs / only detections), evaluates them with the REAL
pycocotools COCOeval, and writes both the data and the expected stats to
the fixture JSON. Commit the file; tests/test_coco_eval_fixture.py then
asserts the native evaluator reproduces every stat to 1e-9 (and is skipped
while the fixture is absent).

Reference protocol: /root/reference/datasets/COCO.py:574-588 (COCOeval
'keypoints' summarize).
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

J = 17  # COCO person keypoints


def _person(rng, img_id, ann_id, center, scale, n_vis=J, iscrowd=0):
    """One GT annotation: keypoints scattered around ``center``."""
    kp = np.zeros((J, 3))
    kp[:, 0] = center[0] + rng.normal(0, scale * 0.2, J)
    kp[:, 1] = center[1] + rng.normal(0, scale * 0.2, J)
    vis = rng.permutation(J) < n_vis
    kp[vis, 2] = rng.integers(1, 3, int(vis.sum()))
    kp[~vis, :] = 0.0
    x0, y0 = center[0] - scale, center[1] - scale
    area = float((2 * scale) ** 2)
    return {
        'id': ann_id, 'image_id': img_id, 'category_id': 1,
        'keypoints': [round(float(v), 3) for v in kp.reshape(-1)],
        'num_keypoints': int((kp[:, 2] > 0).sum()),
        'bbox': [round(float(v), 3) for v in (x0, y0, 2 * scale, 2 * scale)],
        'area': area, 'iscrowd': int(iscrowd),
    }


def _det_from(rng, gt, img_id, score, jitter):
    """A detection derived from a GT by jittering its keypoints."""
    kp = np.asarray(gt['keypoints'], float).reshape(J, 3).copy()
    base = kp[:, :2].copy()
    blank = (kp[:, 2] == 0)
    if blank.any():  # give unlabeled joints plausible coordinates
        bx, by, bw, bh = gt['bbox']
        base[blank, 0] = bx + bw * rng.random(int(blank.sum()))
        base[blank, 1] = by + bh * rng.random(int(blank.sum()))
    base += rng.normal(0, jitter, (J, 2))
    out = np.concatenate([base, np.full((J, 1), 1.0)], axis=1)
    return {'image_id': img_id, 'category_id': 1,
            'keypoints': [round(float(v), 3) for v in out.reshape(-1)],
            'score': round(float(score), 4)}


def build_cases():
    """Deterministic GT/DT sets. Each case: (name, gt_dict, results)."""
    cases = []

    def gt_dict(anns, n_imgs):
        return {
            'images': [{'id': i, 'width': 640, 'height': 480}
                       for i in range(n_imgs)],
            'annotations': anns,
            'categories': [{'id': 1, 'name': 'person',
                            'keypoints': ['k%d' % k for k in range(J)],
                            'skeleton': []}],
        }

    # --- case 1: basic multi-image, mixed-quality detections -------------
    rng = np.random.default_rng(7)
    anns, dets, aid = [], [], 1
    for img in range(4):
        for p in range(1 + img % 3):
            c = (80 + 140 * p + 10 * img, 120 + 90 * p)
            g = _person(rng, img, aid, c, 40 + 8 * p)
            aid += 1
            anns.append(g)
            dets.append(_det_from(rng, g, img, 0.95 - 0.1 * p, jitter=2.0))
            if p == 0:  # a sloppier duplicate detection of the same person
                dets.append(_det_from(rng, g, img, 0.5, jitter=12.0))
    # a spurious detection on an empty image region
    dets.append(_det_from(rng, anns[0], 3, 0.4, jitter=120.0))
    cases.append(('basic', gt_dict(anns, 4), dets))

    # --- case 2: crowd re-matching + keypoint-less GT (bbox-rect OKS) ----
    rng = np.random.default_rng(11)
    anns, dets, aid = [], [], 1
    g0 = _person(rng, 0, aid, (100, 100), 45); aid += 1
    crowd = _person(rng, 0, aid, (300, 200), 90, n_vis=5, iscrowd=1); aid += 1
    nokp = _person(rng, 0, aid, (480, 320), 60, n_vis=0); aid += 1
    anns += [g0, crowd, nokp]
    dets.append(_det_from(rng, g0, 0, 0.9, jitter=1.5))
    # two detections inside the crowd region: both should re-match it
    dets.append(_det_from(rng, crowd, 0, 0.8, jitter=3.0))
    dets.append(_det_from(rng, crowd, 0, 0.7, jitter=5.0))
    # a detection sitting inside the keypoint-less GT's bbox (exercises the
    # computeOks bbox-rect branch -> should be ignored, not a FP)
    dets.append(_det_from(rng, nokp, 0, 0.6, jitter=1.0))
    cases.append(('crowd_and_keypointless', gt_dict(anns, 1), dets))

    # --- case 3: area ranges, maxDets truncation, score ties -------------
    rng = np.random.default_rng(13)
    anns, dets, aid = [], [], 1
    scales = [10, 20, 28, 50, 70, 120]  # small / medium / large areas
    for p, s in enumerate(scales):
        c = (60 + 100 * p, 150 + 37 * p)
        g = _person(rng, 0, aid, c, s); aid += 1
        anns.append(g)
        dets.append(_det_from(rng, g, 0, 0.9, jitter=s * 0.05))
    # 25 tied-score noise detections (forces maxDets=20 truncation with a
    # stable-sort-dependent cut)
    for k in range(25):
        dets.append(_det_from(rng, anns[k % len(anns)], 0, 0.3,
                              jitter=30.0 + k))
    # an image with GT but no detections
    g = _person(rng, 1, aid, (200, 200), 40); aid += 1
    anns.append(g)
    cases.append(('areas_maxdets_ties', gt_dict(anns, 2), dets))

    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(
        REPO, 'tests', 'goldens', 'pycocotools_coco_eval.json'))
    args = ap.parse_args()

    try:
        import pycocotools  # noqa: F401
    except ImportError:
        sys.exit('pycocotools is not importable here. Run this script in an '
                 'environment that has it (pip install pycocotools), then '
                 'commit the fixture it writes.')

    from simple_hrnet_tpu.utils.metrics import _pycocotools_eval

    fixture = {'note': 'pycocotools COCOeval keypoint stats on synthetic '
                       'cases; generated by scripts/'
                       'dump_pycocotools_fixture.py', 'cases': []}
    for name, gt, dts in build_cases():
        stats = _pycocotools_eval(gt, dts)
        fixture['cases'].append({'name': name, 'gt': gt, 'results': dts,
                                 'stats': {k: float(v)
                                           for k, v in stats.items()}})
        print(name, {k: round(v, 4) for k, v in stats.items()})

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(fixture, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
