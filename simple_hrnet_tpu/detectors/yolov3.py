"""YOLOv3 person detector — the TPU-native analogue of the reference's
``models_/detectors/YOLOv3.py`` adapter.

Everything after the frame lands on device is one jitted computation:
letterbox resize -> darknet forward -> box decode -> top-K candidate select
-> class-aware greedy NMS -> coordinate rescale to the original frame. No
host round-trip mid-pipeline; outputs are static-shape (max_det, 7) with a
validity count, unpadded only at the API boundary.

Output row format matches the reference chain the pose facade consumes
(YOLOv3.py:135-139): (x1, y1, x2, y2, conf, cls_conf, cls_pred).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.detectors import darknet
from simple_hrnet_tpu.ops import nms as nms_ops

# COCO class names index 0 == person (the default filter, SimpleHRNet.py:160).
PERSON_CLASS_ID = 0


def letterbox_params(shape_hw: Tuple[int, int], new_shape: int = 416
                     ) -> Tuple[float, float, float, Tuple[int, int]]:
    """Square letterbox geometry, exact port of YOLOv3.py:23-45 (mode='square').

    Returns (ratio, dw, dh, (new_w, new_h)) where dw/dh are the float half
    paddings the reference computes (top = round(dh - 0.1), etc.).
    """
    h, w = shape_hw
    ratio = float(new_shape) / max(h, w)
    new_unpad = (int(round(w * ratio)), int(round(h * ratio)))
    dw = (new_shape - new_unpad[0]) / 2
    dh = (new_shape - new_unpad[1]) / 2
    return ratio, dw, dh, new_unpad


@partial(jax.jit, static_argnames=('img_size', 'in_h', 'in_w'))
def letterbox_device(frames: jnp.ndarray, img_size: int, in_h: int, in_w: int
                     ) -> jnp.ndarray:
    """(N, H, W, 3) RGB uint8/float -> (N, S, S, 3) float in [0,1], grey-padded.

    Matches the reference's cv2 INTER_LINEAR resize + 127.5 border
    (YOLOv3.py:43-44) with the same integer rounding of the pad offsets.
    The resize is two dense matmuls (MXU) + a static grey pad — the
    original gather-based sampler dominated the fused detect graph on TPU
    (the same 3-orders-of-magnitude gather penalty the person crops hit,
    PERF.md), and it blended a <1 px grey fringe into the border pixels
    where cv2 resizes first and pads after.
    """
    from simple_hrnet_tpu.ops import image as I

    ratio, dw, dh, (nw, nh) = letterbox_params((in_h, in_w), img_size)
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))

    x = I.resize_linear(frames.astype(jnp.float32), (nh, nw))
    out = jnp.pad(x, ((0, 0), (top, img_size - top - nh),
                      (left, img_size - left - nw), (0, 0)),
                  constant_values=127.5)
    return out / 255.0


@partial(jax.jit, static_argnames=('img_size', 'in_h', 'in_w'))
def letterbox_device_phase(frames: jnp.ndarray, img_size: int, in_h: int,
                           in_w: int) -> jnp.ndarray:
    """``letterbox_device`` emitting the (N, S/2, S/2, 12) phase tensor
    (ops/phase.py) instead of (N, S, S, 3) — same pixel values, relayout
    only, produced for FREE by the resize matmuls.

    The grey pad is folded into the static weight matrices: rows/cols
    outside the resized rectangle are zero rows of the (S, in) matrix plus
    a constant grey field added in the epilogue — this handles odd pad
    offsets (where the resized rectangle straddles a phase row) with no
    special casing. Each interior pixel is the same 2-tap dot product as
    ``letterbox_device``; values agree to a couple of f32 ulp (the compiler
    may FMA-associate the differently-shaped matmul differently — pinned at
    1e-6 in tests/test_detector.py). Reference: YOLOv3.py:23-45.
    """
    from simple_hrnet_tpu.ops import image as I
    from simple_hrnet_tpu.ops import phase as P

    ratio, dw, dh, (nw, nh) = letterbox_params((in_h, in_w), img_size)
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))

    wy = np.zeros((img_size, in_h), np.float32)
    wy[top:top + nh] = I._linear_weights(in_h, nh)
    wx = np.zeros((img_size, in_w), np.float32)
    wx[left:left + nw] = I._linear_weights(in_w, nw)
    grey = np.full((img_size, img_size, 1), 127.5, np.float32)
    grey[top:top + nh, left:left + nw] = 0.0

    wyb = jnp.asarray(P.blocked_rows(wy))
    wxb = jnp.asarray(P.blocked_rows(wx))
    # grey field in the same blocked row/col layout, built at trace time
    grey_b = np.concatenate([grey[0::2], grey[1::2]], axis=0)
    grey_b = np.concatenate([grey_b[:, 0::2], grey_b[:, 1::2]], axis=1)

    x = frames.astype(jnp.float32)
    t = jnp.einsum('Qh,bhwc->bQwc', wyb, x)
    u = jnp.einsum('Pw,bqwc->bqPc', wxb, t)
    u = u + jnp.asarray(grey_b)
    return P.phase_quadrants(u) / 255.0


def scale_coords_params(img_size: int, shape_hw: Tuple[int, int]
                        ) -> Tuple[float, float, float]:
    """gain/pad used to map letterboxed coords back (YOLOv3.py:49-56)."""
    gain = img_size / max(shape_hw)
    pad_x = (img_size - shape_hw[1] * gain) / 2
    pad_y = (img_size - shape_hw[0] * gain) / 2
    return gain, pad_x, pad_y


def _chunked_detect(fn, params, frames, max_batch_size: int):
    """Run the jitted detect over frame chunks of at most ``max_batch_size``
    (the reference's chunking, YOLOv3.py:128-133). The last chunk is padded
    up to the full chunk size so only ONE extra compile shape exists; pad
    rows are sliced off. Single-chunk batches pass straight through.
    """
    n = frames.shape[0]
    if n <= max_batch_size:
        return fn(params, frames)
    rows_l, valid_l = [], []
    for s in range(0, n, max_batch_size):
        chunk = frames[s:s + max_batch_size]
        pad = max_batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate(
                [jnp.asarray(chunk),
                 jnp.zeros((pad, *chunk.shape[1:]), jnp.asarray(chunk).dtype)])
        r, v = fn(params, chunk)
        rows_l.append(r[:max_batch_size - pad])
        valid_l.append(v[:max_batch_size - pad])
    return jnp.concatenate(rows_l), jnp.concatenate(valid_l)


class YOLOv3:
    """Person detector with the reference adapter's constructor surface.

    ``model_def`` may be 'yolov3', 'yolov3-tiny', or a path to a darknet
    .cfg; ``weights_path`` a darknet ``.weights`` binary (or None / missing
    file for random weights, useful in tests).
    """

    def __init__(self,
                 model_def: str = 'yolov3',
                 class_path: Optional[str] = None,
                 weights_path: Optional[str] = None,
                 conf_thres: float = 0.2,
                 nms_thres: float = 0.4,
                 img_size: int = 416,
                 classes: Sequence[str] = ('person',),
                 max_batch_size: int = 16,
                 max_detections: int = 32,
                 device=None,
                 dtype=None,
                 phase_stem: Optional[bool] = None,
                 quantize_int8: Optional[bool] = None):
        import os

        if quantize_int8 is not None and dtype != 'int8':
            raise ValueError("quantize_int8 only applies with dtype='int8'")

        if model_def.endswith('.cfg') and os.path.exists(model_def):
            self.blocks = darknet.parse_cfg(model_def)
        elif 'tiny' in model_def:
            self.blocks = darknet.yolov3_tiny_blocks()
        else:
            self.blocks = darknet.yolov3_blocks()

        if weights_path and os.path.exists(weights_path):
            if weights_path.endswith('.weights'):
                self.params = darknet.load_darknet_weights(weights_path,
                                                           self.blocks)
            else:
                from simple_hrnet_tpu.utils import checkpoint as ckpt
                self.params = ckpt.load(weights_path)
        else:
            self.params = darknet.init(jax.random.PRNGKey(0), self.blocks)
        self.params = darknet.fold_weights(self.params)

        # Producer-fused space-to-depth stem (ops/phase.py): the letterbox
        # matmuls emit the phase layout for free and conv0 runs at 12 input
        # lanes instead of 3 — measured 2.5-2.7x on letterbox+conv0+down1
        # (PERF.md round 4/5). Auto-on when the graph's stem qualifies.
        # Under dtype='int8' the transformed conv_1 (2,2,128,64) falls
        # outside the quantize policy and runs bf16 (one fewer node
        # quantized than the plain stem — tests/test_quantize.py
        # test_yolov3_int8_phase_stem); the phase chain is the measured
        # net win either way.
        if phase_stem is None:
            phase_stem = darknet.stem_phaseable(self.blocks) \
                and img_size % 2 == 0
        self.phase_stem = bool(phase_stem)
        if self.phase_stem:
            if img_size % 2:
                raise ValueError('phase_stem needs an even img_size '
                                 f'(got {img_size})')
            self.params = darknet.phase_stem_params(self.params,
                                                    self.blocks)

        if dtype == 'int8':
            # TRT-style PTQ on the detector's MXU-bound convs (the
            # high-resolution early layers; models/quantize.py policy) —
            # remaining convs run bf16. Small darknet graphs skip the
            # quantization entirely: on yolov3-tiny (13 convs) the few
            # policy-eligible convs lose to Q/DQ VPU traffic — measured
            # b8 640x480: bf16 3.00 ms vs int8 3.40 plain, 1.98 vs 2.25
            # with the phase stem (PERF.md round 5) — so "int8" there
            # means the fastest mixed precision, which IS pure bf16
            # (same best-tactic semantics as a TRT engine).
            # ``quantize_int8=True/False`` overrides the measured policy
            # either way (e.g. a custom .cfg where the race goes the
            # other direction).
            n_convs = sum(1 for b in self.blocks
                          if b['type'] == 'convolutional')
            if quantize_int8 is None:
                quantize_int8 = n_convs >= 20
            if quantize_int8:
                self.params = self._quantize_int8(self.params, img_size)
            dtype = jnp.bfloat16

        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        self.img_size = img_size
        self.max_detections = max_detections
        self.max_batch_size = max(1, max_batch_size)
        self.dtype = dtype
        # class names: default COCO ordering; only used for the person filter
        self.class_ids = (PERSON_CLASS_ID,) if 'person' in classes else tuple(
            range(80))

        self._detect_jit = {}

    def _quantize_int8(self, params, img_size):
        """Calibrate on a smooth synthetic letterboxed batch and quantize
        policy-accepted convs; see models/quantize.py. In phase-stem mode
        calibration runs the shipped (phase) graph — the transformed stem
        convs fall outside the int8 policy and stay bf16."""
        from simple_hrnet_tpu.models import quantize as Q
        from simple_hrnet_tpu.ops import phase as P

        cal = np.asarray(Q.smooth_frames((img_size, img_size)))
        if self.phase_stem:
            cal = P.space_to_depth_host(cal)
        amax = Q.calibrate_cpu(
            lambda p, v: darknet.apply(p, self.blocks, v, img_size,
                                       phase_stem=self.phase_stem),
            params, [cal])
        qp = Q.quantize_folded(params, amax)
        return jax.tree_util.tree_map(jnp.asarray, qp)

    # -- jitted pipeline ----------------------------------------------------

    def pure_fn(self, in_hw: Tuple[int, int]):
        """The un-jitted detect pipeline (params, frames_rgb) -> (rows,
        valid) for composing into larger fused computations (the facade's
        single-jit video path)."""
        return self._build(in_hw, jit=False)

    def _build(self, in_hw: Tuple[int, int], jit: bool = True):
        img_size = self.img_size
        blocks = self.blocks
        conf_thres = self.conf_thres
        nms_thres = self.nms_thres
        max_det = self.max_detections
        class_ids = jnp.asarray(self.class_ids)
        dtype = self.dtype
        phase = self.phase_stem

        def detect(params, frames):  # frames (N, H, W, 3) RGB
            n = frames.shape[0]
            if phase:
                inp = letterbox_device_phase(frames, img_size,
                                             in_hw[0], in_hw[1])
            else:
                inp = letterbox_device(frames, img_size, in_hw[0], in_hw[1])
            preds = darknet.apply(params, blocks, inp, img_size, dtype=dtype,
                                  phase_stem=phase)

            def per_image(p):  # (A, 5+C)
                obj = p[:, 4]
                cls_conf = jnp.max(p[:, 5:], axis=1)
                cls_pred = jnp.argmax(p[:, 5:], axis=1)
                keep_cls = jnp.isin(cls_pred, class_ids)
                score = jnp.where((obj >= conf_thres) & keep_cls, obj, 0.0)
                k = min(256, p.shape[0])
                top_scores, top_idx = jax.lax.top_k(score, k)
                boxes_xywh = p[top_idx, :4]
                boxes = jnp.stack([
                    boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2,
                    boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2,
                    boxes_xywh[:, 0] + boxes_xywh[:, 2] / 2,
                    boxes_xywh[:, 1] + boxes_xywh[:, 3] / 2], axis=1)
                # class-aware NMS: offset boxes per class so classes don't
                # suppress each other
                offset = cls_pred[top_idx].astype(jnp.float32)[:, None] * (
                    2.0 * img_size)
                keep_idx, keep_valid = nms_ops.nms_ingraph(
                    boxes + offset, top_scores, nms_thres, max_det)
                rows = jnp.concatenate([
                    boxes[keep_idx],
                    top_scores[keep_idx][:, None],
                    cls_conf[top_idx][keep_idx][:, None],
                    cls_pred[top_idx][keep_idx].astype(jnp.float32)[:, None],
                ], axis=1)
                # rescale to original frame coords (YOLOv3.py:49-56)
                gain, pad_x, pad_y = scale_coords_params(img_size, in_hw)
                rows = rows.at[:, 0].add(-pad_x).at[:, 2].add(-pad_x)
                rows = rows.at[:, 1].add(-pad_y).at[:, 3].add(-pad_y)
                rows = rows.at[:, :4].set(
                    jnp.maximum(rows[:, :4] / gain, 0.0))
                return rows, keep_valid

            return jax.vmap(per_image)(preds)

        return jax.jit(detect) if jit else detect

    def _detect(self, frames_rgb):
        in_hw = frames_rgb.shape[1:3]
        if in_hw not in self._detect_jit:
            self._detect_jit[in_hw] = self._build(in_hw)
        fn = self._detect_jit[in_hw]
        return _chunked_detect(fn, self.params, frames_rgb,
                               self.max_batch_size)

    # -- reference-compatible API ------------------------------------------

    def predict_single(self, image: np.ndarray, color_mode: str = 'BGR'):
        """Single frame -> (n_det, 7) array or None (reference YOLOv3.py:120)."""
        return self.predict(image[None], color_mode=color_mode)[0]

    def predict(self, images: np.ndarray, color_mode: str = 'BGR'
                ) -> List[Optional[np.ndarray]]:
        """Batch of frames -> list of per-image (n_det, 7) arrays (or None)."""
        if color_mode == 'BGR':
            images = images[..., ::-1]
        rows, valid = self._detect(np.ascontiguousarray(images))
        rows = np.asarray(rows)
        valid = np.asarray(valid)
        out: List[Optional[np.ndarray]] = []
        for i in range(rows.shape[0]):
            n = int(valid[i].sum())
            out.append(rows[i, :n] if n > 0 else None)
        return out

    # device-native variant for fused pipelines: returns padded arrays
    def detect_padded(self, frames_rgb) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._detect(frames_rgb)
