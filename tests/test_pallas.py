"""Pallas kernel parity tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import pytest


def _boxes_scores(rng, n):
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 300, n)
    boxes[:, 1] = rng.uniform(0, 300, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 150, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 150, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    scores[rng.uniform(0, 1, n) < 0.1] = 0.0  # padding entries
    return boxes, scores


@pytest.mark.parametrize('n', [64, 256])
def test_nms_pallas_matches_nms_jax(n, rng):
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from simple_hrnet_tpu.ops import nms as N
    from simple_hrnet_tpu.ops.pallas.nms_pallas import nms_pallas

    boxes, scores = _boxes_scores(rng, n)
    ref_idx, ref_valid = N.nms_jax(boxes, scores, 0.45, max_out=32)

    with pltpu.force_tpu_interpret_mode():  # CPU test env
        idx, valid = nms_pallas(boxes, scores, 0.45, max_out=32)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)],
                                  np.asarray(ref_idx)[np.asarray(ref_valid)])
