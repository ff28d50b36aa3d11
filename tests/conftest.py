"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count``), mirroring how the driver
validates the multi-chip path — no real TPU pod needed (the reference never
tests multi-GPU at all; see SURVEY.md §4).
"""

import os

# Force CPU regardless of the ambient platform (the session may point
# JAX_PLATFORMS at a real TPU, whose fast-math conv precision would break
# bit-parity assertions). The TPU plugin's register() overrides the env var
# via jax.config, so we override it back before any backend is initialized.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)


def reference_on_path():
    """Make the torch reference importable (for parity tests only).

    The reference imports its own modules as ``models_.*`` from the repo root,
    so we append /root/reference to sys.path. We never import application code
    from it in the framework itself.
    """
    ref = '/root/reference'
    if ref not in sys.path:
        sys.path.append(ref)
    return ref


# ---------------------------------------------------------------------------
# Quick tier (`pytest -m quick`): the <5-min pre-commit smoke gate
# (VERDICT r4 #3 — the full suite takes ~77 min on this 1-core host, so
# every snapshot is self-verified against this subset before committing).
# Selection is centralized here instead of scattering @pytest.mark.quick:
# one representative parity test per module + the golden + the facade
# contract core. Keep additions cheap — budget is 5 minutes TOTAL.

QUICK_NODE_IDS = {
    # golden regression + facade contract core
    'test_goldens.py::test_facade_golden',
    'test_api.py::test_single_person_matches_reference',
    'test_api.py::test_batch_contract',
    'test_api.py::test_empty_frame_contract',
    # one parity anchor per module
    'test_models_parity.py::test_hrnet_parity[32-hw0]',
    'test_ops.py::test_get_final_preds_parity',
    'test_ops.py::test_crop_resize_matches_cv2',
    'test_crop_pil.py::test_crop_pil_bitexact_x64',
    'test_detector.py::test_nms_jax_matches_numpy',
    'test_detector.py::test_native_cpp_nms_matches_python',
    'test_detector.py::test_phase_stem_gating',
    'test_detector.py::test_phase_stem_invalid_request_raises',
    'test_yolov5.py::test_detect_decode_formula',
    'test_quantize.py::test_calibrate_and_policy_selection',
    'test_train_components.py::test_joints_mse_loss_parity',
    'test_train_components.py::test_generate_target_parity_with_reference',
    'test_coco_pipeline.py::test_dataset_item_semantics',
    'test_device_targets.py::test_raw_tail_semantics',
    'test_mpii.py::test_mpii_center_scale_arithmetic',
    'test_parallel.py::test_mesh_creation',
    'test_utils.py::test_tracking_association_parity',
    'test_utils.py::test_cli_parsers_match_reference_flags',
    'test_utils.py::test_root_shim_import',
    # cross-subsystem normalize convention (cheap, whole file)
    'test_normalize_convention.py',
    # real-weight acceptance harness smoke (VERDICT r4 #7)
    'test_validate_goldens.py',
    # driver-scoreboard budget guard (VERDICT r4 #1)
    'test_bench_guard.py',
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    for item in items:
        rel = item.nodeid.split('/')[-1]
        fname = rel.split('::')[0]
        collected_files.add(fname)
        if rel in QUICK_NODE_IDS or fname in QUICK_NODE_IDS:
            item.add_marker(pytest.mark.quick)
            matched.add(rel if rel in QUICK_NODE_IDS else fname)
    # A renamed test or reordered parametrize id must not silently thin
    # the pre-commit gate: every QUICK entry whose file WAS collected has
    # to match something. File-scoped so partial runs still work, and
    # skipped entirely under node-id (::) or -k selection, where
    # collection is already restricted before this hook runs.
    if any('::' in str(a) for a in config.args) or \
            getattr(config.option, 'keyword', ''):
        return
    stale = [q for q in QUICK_NODE_IDS
             if q not in matched and q.split('::')[0] in collected_files]
    if stale:
        raise pytest.UsageError(
            f'QUICK_NODE_IDS entries match no collected test (renamed or '
            f'reparametrized?): {sorted(stale)}')
