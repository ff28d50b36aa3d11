"""SimpleHRNet — the user-facing inference facade (TPU-native).

Drop-in equivalent of the reference's ``SimpleHRNet`` class
(/root/reference/SimpleHRNet.py:21-210): same constructor surface, same
``predict(image)`` contract (single HWC BGR frame or NHWC stack; returns
(people, joints, 3) arrays of (y, x, conf), optionally heatmaps and
bounding boxes) — but the execution model is rebuilt for TPU:

  * the frame is shipped to the device once (uint8); detection, letterbox,
    per-person affine crop-resize-normalize, pose forward and heatmap decode
    all run inside jitted XLA computations (the reference round-trips
    host<->device at least twice per frame, SURVEY.md §3.1);
  * people counts are padded to power-of-two buckets so XLA sees only a
    handful of static shapes (vs torch's per-shape eager dispatch);
  * BN is folded into conv weights at load time; optional bf16 compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet, poseresnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.ops import decode as D
from simple_hrnet_tpu.ops import image as I


def _buckets(n: int, max_batch: int, multiple: int = 1) -> int:
    """Next power-of-two bucket (caps compile count at log2(max_batch)).

    ``multiple`` forces divisibility (mesh size for sharded inference).
    """
    b = max(1, multiple)
    cap = max(max_batch, multiple)
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


class SimpleHRNet:
    """Multi-person 2D pose estimation on TPU.

    Args mirror the reference (SimpleHRNet.py:21-82). Differences:
      * ``device``: a jax.Device, 'tpu'/'cpu', or None (default backend) —
        replaces torch.device; multi-chip replication is exposed via
        ``simple_hrnet_tpu.parallel`` rather than a 'cuda:0,1' string.
      * ``yolo_model_def``: 'yolov3', 'yolov3-tiny', or a darknet .cfg path.
      * ``enable_tensorrt`` is accepted for API compatibility; the XLA jit
        path *is* the optimized engine (see cli/export.py for AOT export).
      * extra ``dtype``: None (f32) or 'bfloat16' for bf16 conv compute;
        ``use_fused_kernels`` (default True) enables the block-diagonal
        fast chains for HRNet inference (f32-exact; see PERF.md) —
        set False for the plain reference-shaped graph.
    """

    def __init__(self,
                 c: int,
                 nof_joints: int,
                 checkpoint_path: str,
                 model_name: str = 'HRNet',
                 resolution: Tuple[int, int] = (384, 288),
                 interpolation: Union[str, int, None] = 'cubic',
                 multiperson: bool = True,
                 return_heatmaps: bool = False,
                 return_bounding_boxes: bool = False,
                 max_batch_size: int = 32,
                 yolo_version: str = 'v3',
                 yolo_model_def: str = 'yolov3',
                 yolo_class_path: Optional[str] = None,
                 yolo_weights_path: Optional[str] = None,
                 device=None,
                 enable_tensorrt: bool = False,
                 dtype: Union[str, None] = None,
                 use_fused_kernels: bool = True,
                 mesh=None):
        self.c = c
        self.nof_joints = nof_joints
        self.checkpoint_path = checkpoint_path
        self.model_name = model_name
        self.resolution = tuple(resolution)  # (height, width)
        self.interpolation = interpolation
        self.multiperson = multiperson
        self.return_heatmaps = return_heatmaps
        self.return_bounding_boxes = return_bounding_boxes
        self.max_batch_size = max_batch_size
        self.device = self._resolve_device(device)
        self.dtype = jnp.bfloat16 if dtype in ('bfloat16', 'bf16') else None
        # Multi-chip data-parallel inference (the reference's DataParallel
        # analogue, SimpleHRNet.py:123-135): crop batches are sharded over
        # the mesh's 'data' axis, params replicated; XLA handles the rest.
        self.mesh = mesh

        if enable_tensorrt or checkpoint_path.endswith('.jaxpose'):
            # AOT engine path (the TensorRT analogue, utils/export.py):
            # a pre-lowered StableHLO module with bound folded params.
            from simple_hrnet_tpu.utils.export import Engine
            engine = Engine(checkpoint_path)
            if tuple(engine.resolution) != self.resolution:
                raise ValueError(
                    f'engine resolution {engine.resolution} != requested '
                    f'{self.resolution}')
            params = engine.params

            def engine_apply(p, x, dtype=None):
                n = x.shape[0]
                eb = engine.batch_size
                if n == eb:
                    return engine._call(p, x)
                import jax.numpy as _jnp
                pad = (-n) % eb
                xp = _jnp.concatenate(
                    [x, _jnp.zeros((pad, *x.shape[1:]), x.dtype)]) \
                    if pad else x
                outs = [engine._call(p, xp[i:i + eb])
                        for i in range(0, xp.shape[0], eb)]
                return _jnp.concatenate(outs)[:n]

            self._apply = engine_apply
        else:
            from simple_hrnet_tpu.utils import checkpoint as ckpt
            params = L.fold_batch_norm(ckpt.load(checkpoint_path))

            if model_name in ('HRNet', 'hrnet'):
                # under a mesh the batch-halves packing would concat across
                # the sharded axis (ICI traffic) — keep the plain graph there
                if use_fused_kernels and mesh is None:
                    # grouped trunk (PERF.md): block-diagonal batch-halves
                    # packing of branch0 + transitions + fuse layers. The
                    # packed weights travel as part of the params bundle
                    # (jit ARGUMENT, not closure — closures bake them into
                    # the HLO as constants).
                    from simple_hrnet_tpu.models import hrnet_fast
                    params = {'p': params,
                              'packed': hrnet_fast.pack_grouped(params)}

                    def grouped_apply(bundle, x, dtype=None):
                        return hrnet_fast.apply_grouped(
                            bundle['p'], bundle['packed'], x, dtype=dtype)

                    self._apply = grouped_apply
                else:
                    self._apply = hrnet.apply
            elif model_name in ('PoseResNet', 'poseresnet', 'ResNet',
                                'resnet'):
                self._apply = partial(poseresnet.apply, resnet_size=c)
            else:
                raise ValueError('Wrong model name.')

        self.params = params
        if self.mesh is not None:
            from simple_hrnet_tpu.parallel import replicate
            self.params = replicate(self.params, self.mesh)
        elif self.device is not None:
            self.params = jax.device_put(self.params, self.device)

        self.detector = None
        if multiperson:
            if yolo_version == 'v3':
                from simple_hrnet_tpu.detectors.yolov3 import YOLOv3
                self.detector = YOLOv3(model_def=yolo_model_def,
                                       class_path=yolo_class_path,
                                       weights_path=yolo_weights_path,
                                       max_batch_size=max_batch_size,
                                       dtype=self.dtype)
            elif yolo_version == 'v5':
                from simple_hrnet_tpu.detectors.yolov5 import YOLOv5
                self.detector = YOLOv5(model_def=yolo_model_def,
                                       dtype=self.dtype)
            else:
                raise ValueError('Unsupported YOLO version.')

        self._single_jit: Dict[tuple, Any] = {}
        self._crop_jit: Dict[int, Any] = {}
        self._fused_jit: Dict[tuple, Any] = {}

    @staticmethod
    def _resolve_device(device):
        if device is None or hasattr(device, 'platform'):
            return device
        name = str(device)
        if name in ('cpu', 'tpu'):
            for d in jax.devices():
                if (name == 'cpu') == (d.platform == 'cpu'):
                    return d
            return jax.devices(name)[0] if name == 'cpu' else jax.devices()[0]
        raise ValueError(f'Wrong device name: {device!r}')

    # ------------------------------------------------------------------
    # jitted pipelines
    # ------------------------------------------------------------------

    def _get_single(self, in_hw: Tuple[int, int], batch: int):
        """Whole-frame pipeline for multiperson=False."""
        key = (in_hw, batch)
        if key in self._single_jit:
            return self._single_jit[key]
        res_h, res_w = self.resolution
        apply_fn = self._apply
        dtype = self.dtype
        cubic = self.interpolation in ('cubic', None) or self.interpolation == 2

        @jax.jit
        def run(params, frames_bgr):  # (B, H, W, 3) uint8 BGR
            rgb = frames_bgr[..., ::-1].astype(jnp.float32)
            if (res_h, res_w) != in_hw:
                if cubic:
                    resized = I.resize_cubic(rgb, (res_h, res_w))
                else:
                    resized = I.resize_bilinear(rgb, (res_h, res_w))
                # the reference resizes the uint8 frame (cv2 saturate-casts
                # back to uint8, SimpleHRNet.py:216-220) before ToTensor
                resized = jnp.round(resized)
            else:
                resized = rgb
            x = I.normalize(jnp.clip(resized, 0.0, 255.0))
            hm = apply_fn(params, x, dtype=dtype)  # (B, h/4, w/4, J)
            boxes = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, in_hw[1], in_hw[0]], jnp.float32),
                (frames_bgr.shape[0], 4))
            pts = D.argmax_decode(hm, boxes)
            return hm, pts

        if self.mesh is not None:
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(replicated_sharding(self.mesh),
                                        data_sharding(self.mesh)))
        self._single_jit[key] = run
        return run

    def _get_crop(self, bucket: int, clamp_hw: Optional[tuple] = None):
        """Crop-batch pipeline: boxes -> aspect pad -> crop -> pose -> decode.

        ``clamp_hw=(H, W)`` switches to the reference's BATCH-path semantics
        (SimpleHRNet.py:393-410): the aspect-corrected box is clamped to the
        image bounds and real pixels are cropped. Default (None) is the
        single-image semantics: unclamped box, zero-filled padding outside
        the original detection (SimpleHRNet.py:243-276).
        """
        key = (bucket, clamp_hw)
        if key in self._crop_jit:
            return self._crop_jit[key]
        res_h, res_w = self.resolution
        aspect = res_h / res_w
        apply_fn = self._apply
        dtype = self.dtype

        @jax.jit
        def run(params, frames_bgr, frame_idx, boxes):
            # frames (B, H, W, 3) uint8 BGR; frame_idx (P,); boxes (P, 4) xyxy
            boxes = jnp.round(boxes)
            padded = I.pad_to_aspect(boxes, aspect, clamp_hw=clamp_hw)
            rgb = frames_bgr[..., ::-1]

            def crop_one(fi, box, orig_box):
                return I.crop_resize(
                    rgb[fi], box, (res_h, res_w),
                    valid_box=None if clamp_hw is not None else orig_box)

            crops = jax.vmap(crop_one)(frame_idx, padded, boxes)
            # reference crops go through PIL as uint8 before ToTensor
            crops = jnp.round(crops)
            x = I.normalize(jnp.clip(crops, 0.0, 255.0))
            hm = apply_fn(params, x, dtype=dtype)
            pts = D.argmax_decode(hm, padded)
            return hm, padded, pts

        if self.mesh is not None:
            # shard the crop batch over 'data'; frames replicated (every
            # device gathers its own crops from the full frame)
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            repl = replicated_sharding(self.mesh)
            data = data_sharding(self.mesh)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(repl, repl, data, data))
        self._crop_jit[key] = run
        return run

    def _get_fused_frame(self, in_hw: Tuple[int, int], max_people: int):
        """The north-star path: detect -> crop -> pose -> decode for one
        frame as a SINGLE jitted computation — no host synchronization
        anywhere between stages, so consecutive frames pipeline freely on
        the device queue (the reference crosses host<->device >= 2x per
        frame, SURVEY.md §3.1). People count is static (max_people slots,
        masked by validity)."""
        key = (in_hw, max_people)
        if key in self._fused_jit:
            return self._fused_jit[key]

        det_fn = self.detector.pure_fn(in_hw)
        res_h, res_w = self.resolution
        aspect = res_h / res_w
        apply_fn = self._apply
        dtype = self.dtype

        @jax.jit
        def run(pose_params, det_params, frame_bgr):  # (H, W, 3) uint8 BGR
            rgb_frame = frame_bgr[..., ::-1]
            rows, valid = det_fn(det_params, rgb_frame[None].astype(
                jnp.float32))
            rows = rows[0][:max_people]
            valid = valid[0][:max_people]
            boxes = jnp.round(rows[:, :4])
            padded = I.pad_to_aspect(boxes, aspect)

            def crop_one(box, orig_box):
                return I.crop_resize(rgb_frame, box, (res_h, res_w),
                                     valid_box=orig_box)

            crops = jax.vmap(crop_one)(padded, boxes)
            crops = jnp.round(crops)
            x = I.normalize(jnp.clip(crops, 0.0, 255.0))
            hm = apply_fn(pose_params, x, dtype=dtype)
            pts = D.argmax_decode(hm, padded)
            return valid, padded, hm, pts

        self._fused_jit[key] = run
        return run

    def predict_stream(self, frames, max_people: int = 16,
                       prefetch: int = 2):
        """Pipelined video inference: yields (boxes, pts) per frame
        (plus heatmaps first if return_heatmaps).

        Frames are dispatched to the device ``prefetch`` ahead of result
        consumption; because the whole per-frame pipeline is one jitted
        computation (no host sync), decode of frame i overlaps compute of
        frames i+1..i+prefetch. Requires multiperson=True.
        """
        import collections

        if self.detector is None:
            # single-person whole-frame streaming: the _get_single pipeline
            # is already one jit; just dispatch ahead.
            pending = collections.deque()

            def finish_sp(entry):
                hm, pts, shape = entry
                res = []
                if self.return_heatmaps:
                    res.append(np.transpose(np.asarray(hm), (0, 3, 1, 2)))
                if self.return_bounding_boxes:
                    res.append(np.asarray(
                        [[0, 0, shape[1], shape[0]]], np.float32))
                res.append(np.asarray(pts, np.float32))
                return res if len(res) > 1 else res[0]

            for frame in frames:
                run = self._get_single(frame.shape[:2], 1)
                hm, pts = run(self.params, frame[None])
                pending.append((hm, pts, frame.shape))
                if len(pending) > prefetch:
                    yield finish_sp(pending.popleft())
            while pending:
                yield finish_sp(pending.popleft())
            return

        pending = collections.deque()

        def finish(entry):
            valid, boxes, hm, pts = entry
            n = int(np.asarray(valid).sum())
            out_boxes = np.asarray(boxes)[:n].astype(np.int32)
            out_pts = np.asarray(pts)[:n].astype(np.float32)
            res = []
            if self.return_heatmaps:
                res.append(np.transpose(np.asarray(hm)[:n], (0, 3, 1, 2)))
            if self.return_bounding_boxes:
                res.append(out_boxes)
            res.append(out_pts)
            return res if len(res) > 1 else res[0]

        for frame in frames:
            run = self._get_fused_frame(frame.shape[:2], max_people)
            pending.append(run(self.params, self.detector.params,
                               np.ascontiguousarray(frame)))
            if len(pending) > prefetch:
                yield finish(pending.popleft())
        while pending:
            yield finish(pending.popleft())

    # ------------------------------------------------------------------
    # public API (reference SimpleHRNet.py:174-210 contract)
    # ------------------------------------------------------------------

    def predict(self, image: np.ndarray):
        """Estimate poses on one HWC BGR frame or an NHWC stack.

        Returns (people, nof_joints, 3) float32 of (y, x, conf) per frame —
        a single array for one frame, a list for a stack — optionally
        preceded by heatmaps and/or bounding boxes (reference
        SimpleHRNet.py:188-203).
        """
        if image.ndim == 3:
            return self._predict_single(image)
        if image.ndim == 4:
            return self._predict_batch(image)
        raise ValueError('Wrong image format.')

    def _assemble(self, heatmaps, boxes, pts):
        res = []
        if self.return_heatmaps:
            res.append(heatmaps)
        if self.return_bounding_boxes:
            res.append(boxes)
        res.append(pts)
        return res if len(res) > 1 else res[0]

    def _predict_single(self, image: np.ndarray):
        hm_h, hm_w = self.resolution[0] // 4, self.resolution[1] // 4

        if not self.multiperson:
            run = self._get_single(image.shape[:2], 1)
            hm, pts = run(self.params, image[None])
            heatmaps = np.transpose(np.asarray(hm), (0, 3, 1, 2))
            boxes = np.asarray(
                [[0, 0, image.shape[1], image.shape[0]]], np.float32)
            return self._assemble(heatmaps, boxes,
                                  np.asarray(pts, np.float32))

        rows, valid = self.detector.detect_padded(
            np.ascontiguousarray(image[..., ::-1])[None])
        n_people = int(np.asarray(valid[0]).sum())
        if n_people == 0:
            empty_hm = np.zeros((0, self.nof_joints, hm_h, hm_w), np.float32)
            return self._assemble(empty_hm, np.empty((0, 4), np.int32),
                                  np.empty((0, 0, 3), np.float32))

        boxes = np.asarray(rows[0])[:n_people, :4]
        bucket = _buckets(n_people, self.max_batch_size,
                          self.mesh.size if self.mesh else 1)
        hm_list, box_list, pts_list = [], [], []
        for start in range(0, n_people, bucket):
            chunk = boxes[start:start + bucket]
            pad = bucket - chunk.shape[0]
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
            run = self._get_crop(bucket)
            hm, pboxes, pts = run(self.params, image[None],
                                  np.zeros((bucket,), np.int32), chunk)
            take = bucket - pad
            hm_list.append(np.asarray(hm)[:take])
            box_list.append(np.asarray(pboxes)[:take])
            pts_list.append(np.asarray(pts)[:take])

        heatmaps = np.transpose(np.concatenate(hm_list), (0, 3, 1, 2))
        out_boxes = np.concatenate(box_list).astype(np.int32)
        pts = np.concatenate(pts_list).astype(np.float32)
        return self._assemble(heatmaps, out_boxes, pts)

    def _predict_batch(self, images: np.ndarray):
        hm_h, hm_w = self.resolution[0] // 4, self.resolution[1] // 4
        n_img = images.shape[0]

        if not self.multiperson:
            run = self._get_single(images.shape[1:3], n_img)
            hm, pts = run(self.params, images)
            heatmaps = np.transpose(np.asarray(hm), (0, 3, 1, 2))
            boxes = np.repeat(np.asarray(
                [[0, 0, images.shape[2], images.shape[1]]], np.float32),
                n_img, axis=0)
            pts = np.expand_dims(np.asarray(pts, np.float32), axis=1)
            return self._assemble(heatmaps, boxes, pts)

        rows, valid = self.detector.detect_padded(
            np.ascontiguousarray(images[..., ::-1]))
        rows = np.asarray(rows)
        valid = np.asarray(valid)
        counts = valid.sum(axis=1).astype(int)

        # flatten (frame, box) pairs
        frame_idx = np.repeat(np.arange(n_img), counts).astype(np.int32)
        all_boxes = np.concatenate(
            [rows[i, :counts[i], :4] for i in range(n_img)], axis=0) \
            if counts.sum() else np.zeros((0, 4), np.float32)

        total = int(counts.sum())
        hm_all = np.zeros((total, hm_h, hm_w, self.nof_joints), np.float32)
        boxes_all = np.zeros((total, 4), np.float32)
        pts_all = np.zeros((total, self.nof_joints, 3), np.float32)
        if total:
            bucket = _buckets(total, self.max_batch_size,
                              self.mesh.size if self.mesh else 1)
            for start in range(0, total, bucket):
                chunk_b = all_boxes[start:start + bucket]
                chunk_f = frame_idx[start:start + bucket]
                pad = bucket - chunk_b.shape[0]
                chunk_b = np.pad(chunk_b, ((0, pad), (0, 0)))
                chunk_f = np.pad(chunk_f, (0, pad))
                # reference batch path clamps corrected boxes to the frame
                # and crops real pixels (SimpleHRNet.py:393-410)
                run = self._get_crop(
                    bucket, clamp_hw=(int(images.shape[1]),
                                      int(images.shape[2])))
                hm, pboxes, pts = run(self.params, images, chunk_f, chunk_b)
                take = bucket - pad
                hm_all[start:start + take] = np.asarray(hm)[:take]
                boxes_all[start:start + take] = np.asarray(pboxes)[:take]
                pts_all[start:start + take] = np.asarray(pts)[:take]

        # re-split by image (reference SimpleHRNet.py:445-475)
        heatmaps_b, boxes_b, pts_b = [], [], []
        index = 0
        for i in range(n_img):
            n = counts[i]
            pts_b.append(pts_all[index:index + n])
            heatmaps_b.append(
                np.transpose(hm_all[index:index + n], (0, 3, 1, 2)))
            boxes_b.append(boxes_all[index:index + n].astype(np.int32))
            index += n

        res = []
        if self.return_heatmaps:
            res.append(heatmaps_b)
        if self.return_bounding_boxes:
            res.append(boxes_b)
        res.append(pts_b)
        return res if len(res) > 1 else res[0]
