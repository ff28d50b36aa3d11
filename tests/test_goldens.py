"""Golden regression: fixed-seed facade outputs pinned across refactors.

The goldens were produced by the CPU f32 pipeline at round 1 (after the
torch-parity suite passed) and committed; any future change that moves
keypoints by > 1e-3 must be deliberate and regenerate them via
``python tests/test_goldens.py``.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'goldens', 'facade_w4.json')


def _compute():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.utils import checkpoint as ckpt

    params = hrnet.init(jax.random.PRNGKey(1234), c=4, nof_joints=17)
    path = '/tmp/golden_w4.npz'
    ckpt.save(path, params)
    rng = np.random.default_rng(42)
    frame = rng.uniform(0, 255, (96, 80, 3)).astype(np.uint8)

    model = SimpleHRNet(4, 17, path, multiperson=False, resolution=(64, 64),
                        return_heatmaps=True)
    heatmaps, pts = model.predict(frame)
    return {
        'pts': np.asarray(pts, np.float64).tolist(),
        'hm_stats': [float(heatmaps.min()), float(heatmaps.mean()),
                     float(heatmaps.max())],
    }


def test_facade_golden():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = _compute()
    np.testing.assert_allclose(np.asarray(got['pts']),
                               np.asarray(golden['pts']), atol=1e-3)
    np.testing.assert_allclose(got['hm_stats'], golden['hm_stats'],
                               atol=1e-4, rtol=1e-4)


if __name__ == '__main__':
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, 'w') as f:
        json.dump(_compute(), f, indent=1)
    print(f'goldens written to {GOLDEN_PATH}')
