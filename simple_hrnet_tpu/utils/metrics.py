"""Accuracy metrics: PCK (reference misc/utils.py:185-244) and a native
COCO keypoint AP evaluator (OKS-based, pycocotools-compatible protocol).

The reference depends on pycocotools' COCOeval (datasets/COCO.py:574-588);
this environment does not ship it, so ``coco_eval`` below implements the
COCO keypoint evaluation protocol natively (OKS similarity matrix, greedy
matching by score with crowd handling omitted as the reference filters
iscrowd, 101-point interpolated AP over OKS thresholds .5:.05:.95). When
pycocotools IS available it is used instead for bit-identical numbers.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from simple_hrnet_tpu.ops import decode as D
from simple_hrnet_tpu.ops.nms import COCO_SIGMAS


# ---------------------------------------------------------------------------
# PCK accuracy (train/val metric)
# ---------------------------------------------------------------------------

def _calc_dists(preds: jnp.ndarray, target: jnp.ndarray,
                normalize: jnp.ndarray) -> jnp.ndarray:
    """(J, N) distance matrix with -1 for untargeted joints
    (reference utils.py:185-198: target coords must both be > 1)."""
    valid = (target[..., 0] > 1) & (target[..., 1] > 1)          # (N, J)
    normed = (preds - target) / normalize[:, None, :]
    dists = jnp.linalg.norm(normed, axis=-1)                     # (N, J)
    return jnp.where(valid, dists, -1.0).T


def evaluate_pck_accuracy(output: jnp.ndarray, target: jnp.ndarray,
                          thr: float = 0.5):
    """PCK@thr from heatmaps, normalized by heatmap_size/10.

    output/target: (N, H, W, J) NHWC. Returns (per-joint acc (J,), avg_acc,
    cnt, pred coords, target coords) like reference utils.py:213-244;
    per-joint accuracy is -1 where no joint was evaluable.
    """
    pred, _ = D.get_max_preds(output)
    gt, _ = D.get_max_preds(target)
    h, w = output.shape[1], output.shape[2]
    norm = jnp.ones((pred.shape[0], 2)) * jnp.asarray([h, w], jnp.float32) / 10
    dists = _calc_dists(pred, gt, norm)                          # (J, N)

    evaluable = dists != -1
    below = (dists < thr) & evaluable
    cnt_j = evaluable.sum(axis=1)
    acc = jnp.where(cnt_j > 0, below.sum(axis=1) / jnp.maximum(cnt_j, 1), -1.0)
    valid_joints = acc >= 0
    avg_acc = jnp.where(valid_joints.sum() > 0,
                        jnp.where(valid_joints, acc, 0).sum()
                        / jnp.maximum(valid_joints.sum(), 1), 0.0)
    return acc, avg_acc, valid_joints.sum(), pred, gt


# ---------------------------------------------------------------------------
# COCO keypoint AP (native evaluator)
# ---------------------------------------------------------------------------

def compute_oks(gt_kpts: np.ndarray, gt_area: float, dt_kpts: np.ndarray,
                sigmas: np.ndarray = COCO_SIGMAS) -> np.ndarray:
    """OKS of each detection vs one GT (COCOeval.computeOks semantics).

    gt_kpts: (J, 3) [x, y, v]; dt_kpts: (M, J, 3).
    """
    variances = (sigmas * 2) ** 2
    xg, yg, vg = gt_kpts[:, 0], gt_kpts[:, 1], gt_kpts[:, 2]
    k1 = np.count_nonzero(vg > 0)
    oks = np.zeros(dt_kpts.shape[0])
    for i, dt in enumerate(dt_kpts):
        dx = dt[:, 0] - xg
        dy = dt[:, 1] - yg
        e = (dx ** 2 + dy ** 2) / variances / (gt_area + np.spacing(1)) / 2
        if k1 > 0:
            e = e[vg > 0]
        oks[i] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] else 0.0
    return oks


def coco_keypoint_ap(gts: Dict[int, List[dict]], dts: Dict[int, List[dict]],
                     oks_thresholds: Optional[np.ndarray] = None,
                     area_range: Tuple[float, float] = (0, float('inf')),
                     max_dets: int = 20) -> Tuple[float, float, np.ndarray]:
    """COCO-protocol keypoint AP/AR.

    gts/dts: imgId -> list of {'keypoints': (J,3), 'area': float,
    'score': float (dts only)}. Returns (AP, AR, per-threshold AP array).
    """
    if oks_thresholds is None:
        oks_thresholds = np.linspace(0.5, 0.95, 10)
    t_count = len(oks_thresholds)

    all_matches = []   # (score, is_tp per threshold)
    total_gt = 0
    img_ids = set(gts) | set(dts)
    for img in img_ids:
        gt_list = [g for g in gts.get(img, [])
                   if area_range[0] <= g['area'] < area_range[1]
                   and np.count_nonzero(np.asarray(g['keypoints'])[:, 2]) > 0]
        dt_list = sorted(dts.get(img, []), key=lambda d: -d['score'])[:max_dets]
        total_gt += len(gt_list)
        if not dt_list:
            continue
        if not gt_list:
            for d in dt_list:
                all_matches.append((d['score'], np.zeros(t_count, bool)))
            continue
        dt_kpts = np.stack([np.asarray(d['keypoints'], np.float64)
                            for d in dt_list])
        ious = np.stack([compute_oks(np.asarray(g['keypoints'], np.float64),
                                     g['area'], dt_kpts) for g in gt_list])
        # greedy match per threshold: detections by score, each takes the
        # best still-unmatched gt with iou >= threshold
        tp = np.zeros((len(dt_list), t_count), bool)
        for ti, thr in enumerate(oks_thresholds):
            gt_used = np.zeros(len(gt_list), bool)
            for di in range(len(dt_list)):
                best, best_iou = -1, thr
                for gi in range(len(gt_list)):
                    if gt_used[gi]:
                        continue
                    if ious[gi, di] >= best_iou:
                        best, best_iou = gi, ious[gi, di]
                if best >= 0:
                    gt_used[best] = True
                    tp[di, ti] = True
        for di, d in enumerate(dt_list):
            all_matches.append((d['score'], tp[di]))

    if total_gt == 0 or not all_matches:
        return 0.0, 0.0, np.zeros(t_count)

    all_matches.sort(key=lambda m: -m[0])
    tps = np.stack([m[1] for m in all_matches])  # (D, T)
    cum_tp = np.cumsum(tps, axis=0).astype(np.float64)
    ranks = np.arange(1, tps.shape[0] + 1)[:, None]
    precision = cum_tp / ranks
    recall = cum_tp / total_gt

    # 101-point interpolated AP (COCOeval protocol)
    recall_thrs = np.linspace(0, 1, 101)
    ap_per_t = np.zeros(t_count)
    for ti in range(t_count):
        p = precision[:, ti].copy()
        for i in range(len(p) - 1, 0, -1):
            p[i - 1] = max(p[i - 1], p[i])
        idx = np.searchsorted(recall[:, ti], recall_thrs, side='left')
        prec_at = np.where(idx < len(p), p[np.minimum(idx, len(p) - 1)], 0)
        ap_per_t[ti] = prec_at.mean()
    ar_per_t = recall[-1]
    return float(ap_per_t.mean()), float(ar_per_t.mean()), ap_per_t


def coco_eval_from_results(gt_annotations: dict, results: List[dict]
                           ) -> Dict[str, float]:
    """Evaluate keypoint results (COCO results-json format) against a COCO
    annotation dict (the parsed person_keypoints_*.json). Uses pycocotools
    when importable (bit-identical to the reference COCO.py:574-588), else
    the native evaluator.

    Returns the reference's stats dict: AP, AP .5, AP .75, AP (M), AP (L),
    AR, AR .5, AR .75, AR (M), AR (L).
    """
    try:
        import pycocotools  # noqa: F401
        return _pycocotools_eval(gt_annotations, results)
    except ImportError:
        pass

    gts: Dict[int, List[dict]] = defaultdict(list)
    for ann in gt_annotations.get('annotations', []):
        if ann.get('category_id') != 1 or ann.get('iscrowd'):
            continue
        kp = np.asarray(ann['keypoints'], np.float64).reshape(-1, 3)
        gts[ann['image_id']].append({'keypoints': kp, 'area': ann['area']})

    dts: Dict[int, List[dict]] = defaultdict(list)
    for res in results:
        kp = np.asarray(res['keypoints'], np.float64).reshape(-1, 3)
        dts[res['image_id']].append(
            {'keypoints': kp, 'score': float(res['score']),
             'area': _kpt_area(kp)})

    med = (32 ** 2, 96 ** 2)
    thrs = np.linspace(0.5, 0.95, 10)
    ap, ar, ap_t = coco_keypoint_ap(gts, dts, thrs)
    ap_m, ar_m, _ = coco_keypoint_ap(gts, dts, thrs, area_range=(med[0], med[1]))
    ap_l, ar_l, _ = coco_keypoint_ap(gts, dts, thrs, area_range=(med[1], float('inf')))
    ap50, ar50, _ = coco_keypoint_ap(gts, dts, np.asarray([0.5]))
    ap75, ar75, _ = coco_keypoint_ap(gts, dts, np.asarray([0.75]))
    return {'AP': ap, 'Ap .5': ap50, 'AP .75': ap75, 'AP (M)': ap_m,
            'AP (L)': ap_l, 'AR': ar, 'AR .5': ar50, 'AR .75': ar75,
            'AR (M)': ar_m, 'AR (L)': ar_l}


def _kpt_area(kp: np.ndarray) -> float:
    vis = kp[kp[:, 2] > 0]
    if len(vis) < 2:
        return 1.0
    w = vis[:, 0].max() - vis[:, 0].min()
    h = vis[:, 1].max() - vis[:, 1].min()
    return float(max(w * h, 1.0))


def _pycocotools_eval(gt_annotations: dict, results: List[dict]):
    import json
    import tempfile

    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    with tempfile.NamedTemporaryFile('w', suffix='.json', delete=False) as f:
        json.dump(gt_annotations, f)
        gt_path = f.name
    coco = COCO(gt_path)
    coco_dt = coco.loadRes(results)
    ev = COCOeval(coco, coco_dt, 'keypoints')
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    names = ['AP', 'Ap .5', 'AP .75', 'AP (M)', 'AP (L)', 'AR', 'AR .5',
             'AR .75', 'AR (M)', 'AR (L)']
    return dict(zip(names, ev.stats))
