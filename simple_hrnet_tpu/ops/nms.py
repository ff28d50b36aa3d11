"""Non-maximum suppression — TPU-jittable box NMS + host OKS-NMS for eval.

The reference ships three tiers (misc/nms/): pure-python ``nms``, Cython
``cpu_nms`` and a CUDA bitmask ``gpu_nms`` (nms_kernel.cu:33-77), all with
identical greedy semantics and the classic +1 box-extent convention. Here:

  * ``nms_jax``       — static-shape greedy NMS under jit (lax.fori_loop, no
                        host sync); the device path used inside the detector
                        pipeline. A Pallas bitmask kernel (ops/pallas/nms.py)
                        accelerates the IoU masking for large N.
  * ``nms_numpy``     — exact reference-parity host implementation
                        (misc/nms/nms.py:35-72) for COCO eval.
  * ``oks_iou`` / ``oks_nms`` / ``soft_oks_nms`` — keypoint-similarity
                        suppression (misc/nms/nms.py:75-177), host-side
                        (tiny inputs, runs inside the eval loop).

A C++ ``cpu_nms`` (native/nms.cpp via ctypes) provides the exact-parity
native path mirroring the reference's compiled extension; ``nms_numpy`` is
the always-available fallback.
"""

from __future__ import annotations

from functools import partial
import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Device NMS (jittable, static shapes)
# ---------------------------------------------------------------------------

def _iou_matrix(boxes: jnp.ndarray, plus_one: bool) -> jnp.ndarray:
    """Pairwise IoU for xyxy boxes (N, 4) -> (N, N)."""
    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + off) * (y2 - y1 + off)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + off)
    h = jnp.maximum(0.0, yy2 - yy1 + off)
    inter = w * h
    return inter / (areas[:, None] + areas[None, :] - inter)


@partial(jax.jit, static_argnames=('max_out', 'plus_one'))
def nms_jax(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
            max_out: int, plus_one: bool = False):
    """Greedy NMS with static output shape.

    Args:
      boxes: (N, 4) xyxy. Invalid/padded entries must carry score <= 0.
      scores: (N,). Entries <= 0 are never selected.
      iou_threshold: suppress overlap > threshold (reference keeps <=).
      max_out: static number of kept slots.
      plus_one: use the reference's +1 extent convention
        (misc/nms/nms.py:52; the detector pipeline uses False).

    Returns:
      keep_idx: (max_out,) int32 indices into boxes (0 for unused slots)
      keep_valid: (max_out,) bool mask of real selections
    """
    n = boxes.shape[0]
    iou = _iou_matrix(boxes, plus_one)

    def body(i, state):
        alive, keep_idx, keep_valid = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > 0.0
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, 0))
        keep_valid = keep_valid.at[i].set(ok)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & (jnp.arange(n) != best)
        alive = jnp.where(ok, alive, jnp.zeros_like(alive))
        return alive, keep_idx, keep_valid

    state = (scores > 0.0,
             jnp.zeros((max_out,), jnp.int32),
             jnp.zeros((max_out,), bool))
    _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_out, body, state)
    return keep_idx, keep_valid


def nms_ingraph(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_threshold: float, max_out: int):
    """The production in-graph NMS: the Pallas bitmask+greedy kernel on
    TPU (12.5 us vs 223 us for the XLA fori_loop at the detector's 256-
    candidate shape — 17.8x, measured in PERF.md round 3; vmap-capable
    via its custom_vmap rule), ``nms_jax`` elsewhere (CPU tests, any
    backend without Mosaic). Same contract as ``nms_jax``. Replaces the
    reference's CUDA bitmask kernel misc/nms/nms_kernel.cu:33-77.

    Dispatch is per LOWERING PLATFORM (lax.platform_dependent), not the
    process default backend, so a CPU-targeted trace in a TPU process
    (jax.jit(..., device=cpu) debug/eval graphs) gets the XLA fallback
    instead of an unloadable Mosaic call."""
    def _pallas(b, s):
        from simple_hrnet_tpu.ops.pallas.nms_pallas import nms_pallas
        return nms_pallas(b, s, iou_threshold, max_out)

    def _xla(b, s):
        return nms_jax(b, s, iou_threshold, max_out)

    return jax.lax.platform_dependent(boxes, scores,
                                      tpu=_pallas, default=_xla)


# ---------------------------------------------------------------------------
# Host NMS (exact reference parity; used in COCO eval)
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_nms():
    """ctypes binding to native/libnms.so (C++ port of the Cython cpu_nms).

    Builds the library on first use when missing (make -C native
    libnms.so — seconds with any g++; the reference required a manual
    `cd misc; make` the same way, misc/Makefile:1-4). Falls back to the
    identical pure-numpy path if no toolchain is available."""
    global _NATIVE
    if _NATIVE is None:
        import ctypes
        import os
        native_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), 'native')
        so = os.path.join(native_dir, 'libnms.so')
        if not os.path.exists(so) and os.path.exists(
                os.path.join(native_dir, 'nms.cpp')):
            import subprocess
            try:
                subprocess.run(['make', '-C', native_dir, 'libnms.so'],
                               capture_output=True, timeout=120)
            except Exception:
                pass
        if os.path.exists(so):
            lib = ctypes.CDLL(so)
            lib.cpu_nms.restype = ctypes.c_int
            lib.cpu_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
                ctypes.POINTER(ctypes.c_int)]
            _NATIVE = lib
        else:
            _NATIVE = False
    return _NATIVE or None


def nms_numpy(dets: np.ndarray, thresh: float) -> list:
    """Greedy box NMS, exact port of misc/nms/nms.py:35-72 (+1 convention).

    dets: (N, 5) [x1, y1, x2, y2, score]. Returns kept indices. Uses the C++
    native library when built, else pure numpy (identical results).
    """
    if dets.shape[0] == 0:
        return []
    # ONE dtype for both paths: the native kernel computes in float32, so
    # the numpy fallback must too — otherwise an IoU straddling thresh
    # within f32 rounding gives environment-dependent keep sets (same
    # call, different answer on hosts without a C++ toolchain)
    dets = np.ascontiguousarray(dets, np.float32)
    lib = _native_nms()
    if lib is not None:
        import ctypes
        d = dets
        keep = np.zeros(dets.shape[0], np.int32)
        n = lib.cpu_nms(d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        d.shape[0], ctypes.c_float(thresh),
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return keep[:n].tolist()

    x1, y1, x2, y2, scores = (dets[:, i] for i in range(5))
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    # kind='stable': the reference's plain argsort (introsort) orders tied
    # scores arbitrarily; stable-then-reverse pins ties to descending index,
    # which the C++ comparator (native/nms.cpp) reproduces exactly.
    order = scores.argsort(kind='stable')[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


# COCO keypoint sigmas (misc/nms/nms.py:77).
COCO_SIGMAS = np.array(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], np.float64) / 10.0


def oks_iou(g, d, a_g, a_d, sigmas=None, in_vis_thre=None):
    """Object-keypoint-similarity IoU (misc/nms/nms.py:75-94).

    g: (J*3,) flattened gt keypoints [x, y, v]*J ; d: (M, J*3).
    """
    if not isinstance(sigmas, np.ndarray):
        sigmas = COCO_SIGMAS
    variances = (sigmas * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    ious = np.zeros((d.shape[0]))
    for n_d in range(d.shape[0]):
        xd, yd, vd = d[n_d, 0::3], d[n_d, 1::3], d[n_d, 2::3]
        dx = xd - xg
        dy = yd - yg
        e = (dx ** 2 + dy ** 2) / variances / ((a_g + a_d[n_d]) / 2 + np.spacing(1)) / 2
        if in_vis_thre is not None:
            # reference quirk preserved verbatim (nms.py:91): `and` of two
            # non-empty lists returns the SECOND, so only detection
            # visibility actually filters. (The eval-path reference has NO
            # e<=29 outlier filter — that exists only in the tracking
            # variant, utils.py:364 / utils/tracking.py.)
            ind = list(vg > in_vis_thre) and list(vd > in_vis_thre)
            e = e[ind]
        ious[n_d] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


def oks_nms(kpts_db, thresh, sigmas=None, in_vis_thre=None):
    """Greedy OKS suppression (misc/nms/nms.py:97-124)."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k['score'] for k in kpts_db])
    kpts = np.array([np.asarray(k['keypoints']).flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        ovr = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                      sigmas, in_vis_thre)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep


def rescore(overlap, scores, thresh, type='gaussian'):
    """Soft-NMS rescoring (misc/nms/nms.py:125-134): 'gaussian' decays all
    scores by exp(-oks^2/thresh); 'linear' scales only overlaps >= thresh
    by (1 - oks). Mutates ``scores`` in the linear branch, as the reference
    does."""
    assert overlap.shape[0] == scores.shape[0]
    if type == 'linear':
        inds = np.where(overlap >= thresh)[0]
        scores[inds] = scores[inds] * (1 - overlap[inds])
    else:
        scores = scores * np.exp(-overlap ** 2 / thresh)
    return scores


def soft_oks_nms(kpts_db, thresh, sigmas=None, in_vis_thre=None,
                 max_dets: int = 20, rescore_type: str = 'gaussian'):
    """Soft OKS-NMS (misc/nms/nms.py:136-177) with both rescore modes."""
    if len(kpts_db) == 0:
        return []
    scores = np.array([k['score'] for k in kpts_db])
    kpts = np.array([np.asarray(k['keypoints']).flatten() for k in kpts_db])
    areas = np.array([k['area'] for k in kpts_db])

    order = scores.argsort()[::-1]
    scores = scores[order]
    keep = np.zeros(max_dets, np.intp)
    keep_cnt = 0
    while order.size > 0 and keep_cnt < max_dets:
        i = order[0]
        ovr = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]],
                      sigmas, in_vis_thre)
        order = order[1:]
        scores = rescore(ovr, scores[1:], thresh, type=rescore_type)
        tmp = scores.argsort()[::-1]
        order = order[tmp]
        scores = scores[tmp]
        keep[keep_cnt] = i
        keep_cnt += 1
    return keep[:keep_cnt].tolist()
