"""Smoke the real-weight acceptance harness (VERDICT r4 #7).

scripts/validate_goldens.py is the designated harness for the day official
pretrained weights land in the environment (BASELINE.json `published` is
empty until then — the reference's AP-parity claim,
/root/reference/README.md:8-10, can only be validated with them). Nothing
else executes it, so a bitrot there would surface exactly when it is
finally needed. This runs its random-weights path on the cheapest config
(HRNet-W32 256x192 single-person, one fps iteration) end to end: torch
reference build, facade predict, heatmap/keypoint deviation report, JSON
output.
"""

import importlib.util
import json
import os
import sys


def _load_script():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, 'scripts', 'validate_goldens.py')
    spec = importlib.util.spec_from_file_location('validate_goldens', path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['validate_goldens'] = mod
    spec.loader.exec_module(mod)
    return mod


def test_validate_goldens_w32_random_weights(tmp_path):
    vg = _load_script()
    out = str(tmp_path / 'goldens.json')
    results = vg.run(weights_dir=None, image_path=None, out_path=out,
                     only={'w32_256x192_single'}, fps_n=1)

    assert os.path.exists(out)
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk['configs'].keys() == results['configs'].keys()

    cfg = results['configs']['w32_256x192_single']
    assert cfg['random_weights'] is True
    assert results['all_real_weights'] is False
    assert cfg['passes_gate'] is None        # gate only judges real weights
    # random-weight torch-vs-facade parity still holds (same preprocessing,
    # converted params): heatmaps at the usual f32 conv-stack tolerance
    assert cfg['heatmap_max_dev_vs_torch'] < 2e-4
    assert cfg['fps_wall'] > 0
    assert len(cfg['keypoints_golden']) == 17
