"""Bit-check the native COCO AP evaluator against a recorded pycocotools
fixture (tests/goldens/pycocotools_coco_eval.json).

The fixture is produced by scripts/dump_pycocotools_fixture.py in an
environment that HAS pycocotools (not installable here — zero egress);
until it is committed these tests skip. What runs unconditionally is a
structural check that the generator's cases evaluate cleanly through the
native evaluator (so the recipe can't rot).

Reference protocol: /root/reference/datasets/COCO.py:574-588.
"""

import json
import os

import numpy as np
import pytest

from simple_hrnet_tpu.utils import metrics as M

FIXTURE = os.path.join(os.path.dirname(__file__), 'goldens',
                       'pycocotools_coco_eval.json')

STAT_KEYS = ['AP', 'Ap .5', 'AP .75', 'AP (M)', 'AP (L)',
             'AR', 'AR .5', 'AR .75', 'AR (M)', 'AR (L)']


def _load_cases():
    if not os.path.exists(FIXTURE):
        pytest.skip('pycocotools fixture not recorded yet — run '
                    'scripts/dump_pycocotools_fixture.py where pycocotools '
                    'is installed and commit the output')
    with open(FIXTURE) as f:
        return json.load(f)['cases']


def test_native_eval_matches_pycocotools_fixture():
    for case in _load_cases():
        stats = M.coco_eval_native(case['gt'], case['results'])
        for k in STAT_KEYS:
            assert stats[k] == pytest.approx(case['stats'][k], abs=1e-9), \
                (case['name'], k, stats[k], case['stats'][k])


def test_fixture_generator_cases_evaluate_natively():
    """The generator's synthetic cases run through the native evaluator
    and produce sane stats (evaluates TODAY, without pycocotools)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'dump_fixture', os.path.join(os.path.dirname(__file__), '..',
                                     'scripts',
                                     'dump_pycocotools_fixture.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cases = mod.build_cases()
    assert [c[0] for c in cases] == ['basic', 'crowd_and_keypointless',
                                     'areas_maxdets_ties']
    for name, gt, dts in cases:
        stats = M.coco_eval_native(gt, dts)
        for k in STAT_KEYS:
            assert -1.0 <= stats[k] <= 1.0
        # every case has evaluable GT and at least one good detection
        assert stats['AP'] > 0.0, name
    # determinism: rebuilding yields identical data
    again = mod.build_cases()
    assert json.dumps([c[1] for c in cases]) == \
        json.dumps([c[1] for c in again])
    assert json.dumps([c[2] for c in cases]) == \
        json.dumps([c[2] for c in again])


def test_keypointless_gt_uses_bbox_rect_oks():
    """computeOks' k1==0 branch: a detection INSIDE the expanded bbox of a
    keypoint-less GT gets OKS 1.0 (zero rect distance), far outside ~0."""
    gt_kp = np.zeros((17, 3))
    bbox = [100.0, 100.0, 40.0, 40.0]
    inside = np.concatenate(
        [np.tile([120.0, 120.0, 1.0], 17)]).reshape(17, 3)
    outside = np.concatenate(
        [np.tile([500.0, 500.0, 1.0], 17)]).reshape(17, 3)
    oks = M.compute_oks(gt_kp, 1600.0, np.stack([inside, outside]),
                        gt_bbox=bbox)
    assert oks[0] == pytest.approx(1.0)
    assert oks[1] < 1e-6
    # without a bbox the fallback uses keypoint distances (legacy behavior)
    oks_nb = M.compute_oks(gt_kp, 1600.0, np.stack([inside]))
    assert 0.0 <= oks_nb[0] <= 1.0
