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
    # round the cap DOWN to a multiple so the clamped bucket stays
    # mesh-divisible (max_batch_size=20 on an 8-device mesh would
    # otherwise return 20, which the 'data' axis cannot shard)
    cap = max(multiple, (max_batch // multiple) * multiple) \
        if multiple > 1 else max(max_batch, 1)
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def _slot_ladder(cap: int):
    """Empty rung + power-of-two people-slot rungs up to ``cap`` (always
    included): cap=16 -> [0, 2, 4, 8, 16]. The adaptive stream walks this
    ladder so the pose batch — 84%+ of the fused graph at serving batch
    sizes, PERF.md — tracks the scene's actual person count instead of
    the worst case. Rung 0 is the idle-camera tier: a detect-only graph
    (no pose batch at all, ~3x cheaper than rung 2) that escalates on the
    first detection."""
    ladder = [0]
    s = 2
    while s < cap:
        ladder.append(s)
        s *= 2
    ladder.append(cap)
    return ladder


class _SlotController:
    """Hysteresis controller for adaptive people-slot sizing.

    Escalation is handled by the caller (it must re-run the saturated
    launch); this object tracks the current rung and steps DOWN only after
    a full window of observed per-launch people counts fits strictly
    below the next rung down (strictly: landing exactly at a rung's
    capacity would immediately saturate it and re-escalate — thrash)."""

    def __init__(self, cap: int, window: int):
        import collections
        self.ladder = _slot_ladder(cap)
        # start at the smallest POSE rung, not the empty rung: most streams
        # open on a populated scene, and a rung-0 first frame with people
        # would always pay a double launch. Rung 0 is reached by descent
        # after a full window of empty frames.
        self.idx = min(1, len(self.ladder) - 1)
        self.cap = cap
        self.counts = collections.deque(maxlen=max(1, window))

    @property
    def slots(self) -> int:
        return self.ladder[self.idx]

    def escalate(self, saturated_slots: int) -> int:
        """Move to the first rung ABOVE a saturated launch's slot count
        (a saturated count means the detector's row truncation may have
        dropped real people — SURVEY.md §3.1's dynamic-people problem)."""
        while self.ladder[self.idx] <= saturated_slots:
            self.idx += 1
        self.counts.clear()
        return self.ladder[self.idx]

    def observe(self, n: int) -> None:
        self.counts.append(n)
        # descend when the window fits strictly below the next rung down;
        # the rung-0 threshold is 1 (descend only after an ALL-EMPTY
        # window — any detection at rung 0 forces an escalation re-run)
        if (self.idx > 0 and len(self.counts) == self.counts.maxlen
                and max(self.counts) < max(1, self.ladder[self.idx - 1])):
            self.idx -= 1
            self.counts.clear()


def _pose_tail(apply_fn, params, crops, padded_boxes, dtype):
    """Shared tail of every fused pipeline: uint8-rounded crops ->
    ImageNet normalize -> pose forward -> heatmap argmax decode into the
    padded-box frame coordinates (SimpleHRNet.py:279-296 semantics)."""
    x = I.normalize(jnp.clip(jnp.round(crops), 0.0, 255.0))
    hm = apply_fn(params, x, dtype=dtype)
    pts = D.argmax_decode(hm, padded_boxes)
    return hm, pts


class SimpleHRNet:
    """Multi-person 2D pose estimation on TPU.

    Args mirror the reference (SimpleHRNet.py:21-82). Differences:
      * ``device``: a jax.Device, 'tpu'/'cpu', or None (default backend) —
        replaces torch.device; multi-chip replication is exposed via
        ``simple_hrnet_tpu.parallel`` rather than a 'cuda:0,1' string.
      * ``yolo_model_def``: 'yolov3', 'yolov3-tiny', or a darknet .cfg path.
      * ``yolo_max_detections``: the detector's static row capacity
        (default 32); ``predict_stream(max_people=N)`` requires N <= this
        (the fused graphs raise otherwise — larger caps cost detector NMS
        time, so it is explicit rather than auto-grown).
      * ``enable_tensorrt`` is accepted for API compatibility; the XLA jit
        path *is* the optimized engine (see cli/export.py for AOT export).
      * extra ``dtype``: None (f32), 'bfloat16' for bf16 conv compute, or
        'int8' for TRT-style post-training quantization (per-channel int8
        weights + calibrated static activation scales on the MXU-bound
        trunk convs, bf16 elsewhere — models/quantize.py; measured 1.4-2x
        on the W48 bottleneck convs, PERF.md round 2c); with
        ``calibration_images`` (iterable of HWC RGB frames) the int8
        activation scales calibrate on real data instead of the synthetic
        default, and ``int8_exclude`` (path prefixes, e.g. ('stage4',))
        keeps named param groups bf16 — the accuracy-policy knob from the
        per-stage sensitivity sweep (PERF.md round 5);
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
                 mesh=None,
                 calibration_images=None,
                 int8_exclude=(),
                 yolo_max_detections: int = 32):
        self.c = c
        # int8 calibration data: iterable of HWC RGB uint8/float frames
        # (resized internally); None -> smooth synthetic frames
        self.calibration_images = calibration_images
        if calibration_images is not None and dtype != 'int8':
            raise ValueError("calibration_images only applies with "
                             "dtype='int8' (nothing is calibrated "
                             'otherwise)')
        if interpolation not in ('cubic', None, 2, 'linear', 'bilinear', 1,
                                 'bilinear_aa'):
            raise ValueError(
                f'Unsupported interpolation {interpolation!r}: expected '
                "'cubic'/cv2.INTER_CUBIC (default, the reference's "
                "SimpleHRNet.py:216), 'linear'/cv2.INTER_LINEAR, or "
                "'bilinear_aa' (PIL transforms.Resize semantics)")
        # accuracy-policy knob (PERF.md round-5 sensitivity sweep): param
        # groups kept OUT of int8, e.g. int8_exclude=('stage4',) keeps the
        # decode-head-adjacent stage bf16 (the measured accuracy-hot group)
        # at ~40% lower heatmap error for -15% W48 int8 b32 throughput
        # (1514 -> 1282 img/s measured)
        self.int8_exclude = tuple(int8_exclude)
        if self.int8_exclude and dtype != 'int8':
            raise ValueError("int8_exclude only applies with dtype='int8' "
                             '(nothing is quantized otherwise)')
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
        self.quantize_int8 = dtype == 'int8'
        self.dtype = jnp.bfloat16 \
            if dtype in ('bfloat16', 'bf16', 'int8') else None
        # Multi-chip data-parallel inference (the reference's DataParallel
        # analogue, SimpleHRNet.py:123-135): crop batches are sharded over
        # the mesh's 'data' axis, params replicated; XLA handles the rest.
        self.mesh = mesh

        if enable_tensorrt or checkpoint_path.endswith('.jaxpose'):
            # AOT engine path (the TensorRT analogue, utils/export.py):
            # a pre-lowered StableHLO module with bound folded params.
            if self.int8_exclude:
                raise ValueError(
                    'int8_exclude has no effect on a prebuilt .jaxpose '
                    'engine (its precision mix was baked at export time; '
                    'pass --int8_exclude to export-model.py instead)')
            from simple_hrnet_tpu.utils.export import Engine
            engine = Engine(checkpoint_path)
            if tuple(engine.resolution) != self.resolution:
                raise ValueError(
                    f'engine resolution {engine.resolution} != requested '
                    f'{self.resolution}')
            params = engine.params
            eb = engine.batch_size

            if mesh is not None:
                # Engines are compiled for one device; under a mesh each
                # device runs the SAME module on its per-device slice of a
                # (devices x engine_batch) super-batch — the TPU-native
                # "TensorRT engine under DataParallel"
                # (reference SimpleHRNet.py:123-147 combination).
                from jax.sharding import PartitionSpec as P
                call = jax.jit(jax.shard_map(
                    engine._exported.call, mesh=mesh,
                    in_specs=(P(), P('data')), out_specs=P('data')))
                chunk = eb * int(mesh.devices.size)
            else:
                call, chunk = engine._call, eb

            def engine_apply(p, x, dtype=None):
                n = x.shape[0]
                if n == chunk:
                    return call(p, x)
                import jax.numpy as _jnp
                pad = (-n) % chunk
                xp = _jnp.concatenate(
                    [x, _jnp.zeros((pad, *x.shape[1:]), x.dtype)]) \
                    if pad else x
                outs = [call(p, xp[i:i + chunk])
                        for i in range(0, xp.shape[0], chunk)]
                return _jnp.concatenate(outs)[:n]

            self._apply = engine_apply
        else:
            from simple_hrnet_tpu.utils import checkpoint as ckpt
            params = L.fold_batch_norm(ckpt.load(checkpoint_path))

            amax = None
            if self.quantize_int8:
                if model_name in ('HRNet', 'hrnet'):
                    cal_apply = hrnet.apply
                elif model_name in ('PoseResNet', 'poseresnet', 'ResNet',
                                    'resnet'):
                    cal_apply = partial(poseresnet.apply, resnet_size=c)
                else:
                    raise ValueError('Wrong model name.')
                amax = self._calibrate_int8(cal_apply, params)
                if self.int8_exclude:
                    from simple_hrnet_tpu.models import quantize as Q
                    amax = Q.filter_amax(params, amax, self.int8_exclude)

            if model_name in ('HRNet', 'hrnet'):
                # under a mesh the batch-halves packing would concat across
                # the sharded axis (ICI traffic) — keep the plain graph there
                if use_fused_kernels and mesh is None:
                    # grouped trunk (PERF.md): block-diagonal batch-halves
                    # packing of branch0 + transitions + fuse layers. The
                    # packed weights travel as part of the params bundle
                    # (jit ARGUMENT, not closure — closures bake them into
                    # the HLO as constants). Group so the packed branch-0
                    # width approaches the 128 MXU lanes (W48: G=2 -> 96,
                    # W32: G=4 -> 128); when it hits 128 EXACTLY, the
                    # Pallas chain + fuse_up kernels run on the hot path
                    # (measured W32-256x192 b16 bf16: 3305 img/s vs 2007
                    # plain / 2854 grouped-conv — PERF.md round 2; at 96
                    # lanes both kernels lose to XLA and stay off).
                    from simple_hrnet_tpu.models import hrnet_fast
                    group = min(4, max(2, 128 // c))
                    lanes_exact = (group * c == 128)
                    packed = hrnet_fast.pack_grouped(params, group=group,
                                                     int8_amax=amax)
                    if amax is not None:
                        from simple_hrnet_tpu.models import quantize as Q
                        params = Q.quantize_folded(params, amax)
                    params = {'p': params, 'packed': packed}

                    def grouped_apply(bundle, x, dtype=None,
                                      _fu=lanes_exact):
                        return hrnet_fast.apply_grouped(
                            bundle['p'], bundle['packed'], x, dtype=dtype,
                            fuse_up_pallas=_fu)

                    self._apply = grouped_apply
                else:
                    if amax is not None:
                        from simple_hrnet_tpu.models import quantize as Q
                        params = Q.quantize_folded(params, amax)
                    self._apply = hrnet.apply
            elif model_name in ('PoseResNet', 'poseresnet', 'ResNet',
                                'resnet'):
                if amax is not None:
                    from simple_hrnet_tpu.models import quantize as Q
                    params = Q.quantize_folded(params, amax)
                self._apply = partial(poseresnet.apply, resnet_size=c)
            else:
                raise ValueError('Wrong model name.')

        if self.quantize_int8:
            # calibration turned the leaves into numpy in place; move the
            # final tree (quantized + packed) back to device arrays so jit
            # calls don't re-transfer per predict
            params = jax.tree_util.tree_map(jnp.asarray, params)

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
                                       max_detections=yolo_max_detections,
                                       dtype='int8' if self.quantize_int8
                                       else self.dtype)
            elif yolo_version == 'v5':
                from simple_hrnet_tpu.detectors.yolov5 import YOLOv5
                self.detector = YOLOv5(model_def=yolo_model_def,
                                       max_batch_size=max_batch_size,
                                       max_detections=yolo_max_detections,
                                       dtype='int8' if self.quantize_int8
                                       else self.dtype)
            else:
                raise ValueError('Unsupported YOLO version.')

        self._single_jit: Dict[tuple, Any] = {}
        self._crop_jit: Dict[int, Any] = {}
        self._fused_jit: Dict[tuple, Any] = {}

    def _calibrate_int8(self, apply_fn, params):
        """Activation-scale calibration for int8 (models/quantize.py).

        Runs one EAGER forward (on the CPU backend — eager op dispatch
        through the TPU relay would pay one RTT per conv) on the
        ``calibration_images`` constructor argument (HWC RGB frames,
        resized to the model resolution — TRT-style real-data
        calibration), or on a smooth synthetic batch when none given;
        either way normalized exactly like production inputs. The
        synthetic default keeps argmax parity on random weights
        (test_quantize.py); real-weight AP should be validated with
        scripts/validate_goldens.py.
        """
        import numpy as np
        from simple_hrnet_tpu.models import quantize as Q
        from simple_hrnet_tpu.ops import image as I
        if self.calibration_images is not None:
            import cv2
            h, w = self.resolution
            imgs = np.stack([
                cv2.resize(np.asarray(im), (w, h),
                           interpolation=cv2.INTER_LINEAR).astype(np.float64)
                for im in self.calibration_images])
        else:
            imgs = Q.smooth_frames(self.resolution, n=2, lo=0.0, hi=255.0)
        # same subtract-then-multiply convention as the serving graph's
        # I.normalize (ops/image.py), so calibration sees the exact
        # activation distribution inference will
        batch = ((imgs.astype(np.float32) - I.MEAN255)
                 * I.INV255_STD).astype(np.float32)
        # calibrate_cpu converts leaves to numpy IN PLACE (amax is keyed by
        # node-dict identity, which pack/quantize re-use) and runs the
        # eager pass on the CPU backend; __init__ re-devices the final
        # tree afterwards.
        return Q.calibrate_cpu(apply_fn, params, [batch])

    @staticmethod
    def _resolve_device(device):
        if device is None or hasattr(device, 'platform'):
            return device
        name = str(device)
        if name in ('cpu', 'tpu'):
            for d in jax.devices():
                if (name == 'cpu') == (d.platform == 'cpu'):
                    return d
            if name == 'cpu':
                return jax.devices('cpu')[0]
            # never silently serve on CPU when a TPU was requested —
            # the benchmarked numbers would be wrong by orders of
            # magnitude with no error anywhere
            raise RuntimeError(
                "device='tpu' requested but no accelerator device is "
                f'visible (jax.devices() = {jax.devices()}); pass '
                "device='cpu' explicitly to run on the host")
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
        # 'bilinear_aa' = PIL transforms.Resize semantics (antialiased on
        # downscale), the reference's actual crop/frame resampler — see
        # PARITY.md #6 and ops/image.resize_bilinear_aa
        bilinear_aa = self.interpolation == 'bilinear_aa'

        @jax.jit
        def run(params, frames_bgr):  # (B, H, W, 3) uint8 BGR
            rgb = frames_bgr[..., ::-1].astype(jnp.float32)
            if (res_h, res_w) != in_hw:
                if bilinear_aa:
                    resized = I.resize_bilinear_aa(rgb, (res_h, res_w))
                elif cubic:
                    resized = I.resize_cubic(rgb, (res_h, res_w))
                else:
                    # 'linear'/cv2.INTER_LINEAR (__init__ validated the
                    # set): the cv2-exact edge-clamped matmul resampler,
                    # not the zero-filling gather fallback
                    resized = I.resize_linear(rgb, (res_h, res_w))
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

    def _get_gather_crop(self, bucket: int, clamp_hw: Optional[tuple] = None):
        """Fused compaction pipeline: (rows, valid) from the detector stay ON
        DEVICE; valid (frame, box) pairs are compacted frame-major via a
        stable argsort, a ``bucket``-sized window of them is cropped, posed
        and decoded — all in one jit. The total people count is returned as
        an output, so the host's first (and usually only) readback happens
        AFTER the pose forward: no host synchronization between detection
        and pose (the round-trip the reference pays per frame,
        SimpleHRNet.py:228-296 / SURVEY.md §3.1).
        """
        key = ('gather', bucket, clamp_hw)
        if key in self._crop_jit:
            return self._crop_jit[key]
        res_h, res_w = self.resolution
        aspect = res_h / res_w
        apply_fn = self._apply
        dtype = self.dtype

        @jax.jit
        def run(params, frames_bgr, rows, valid, start):
            # frames (B, H, W, 3) uint8 BGR; rows (B, D, 7); valid (B, D)
            d = valid.shape[1]
            flat_valid = valid.reshape(-1)
            counts = valid.sum(axis=1).astype(jnp.int32)
            total = flat_valid.sum().astype(jnp.int32)
            # valid entries first, frame-major order preserved; pad so the
            # dynamic window never clamps (garbage slots beyond `total` are
            # computed but discarded by the host unpad)
            order = jnp.argsort(jnp.logical_not(flat_valid),
                                stable=True).astype(jnp.int32)
            order = jnp.pad(order, (0, bucket))
            sel = jax.lax.dynamic_slice(order, (start,), (bucket,))
            fi = (sel // d).astype(jnp.int32)
            boxes = jnp.round(rows.reshape(-1, rows.shape[-1])[sel][:, :4])
            padded = I.pad_to_aspect(boxes, aspect, clamp_hw=clamp_hw)
            rgb = frames_bgr[..., ::-1]

            # person crops ALWAYS use the dense-matmul PIL resampler: it
            # is the reference's exact crop arithmetic (transforms.Resize
            # on a PIL image, SimpleHRNet.py:167-172 — the reference's
            # `interpolation` flag never applied to crops either) AND the
            # fast formulation on TPU: 5.5 us/crop vs 3100 us for the
            # gather-based 4-tap sampler (PERF.md round 3 — XLA gathers
            # are the single most expensive op in the old fused graph).
            # The rgb[f] frame select costs one frame copy per crop slot
            # (~0.07 ms), dwarfed by the gather alternative.
            def crop_one(f, box, orig_box):
                return I.crop_resize_pil(
                    rgb[f], box, (res_h, res_w),
                    valid_box=None if clamp_hw is not None else orig_box)

            crops = jax.vmap(crop_one)(fi, padded, boxes)
            hm, pts = _pose_tail(apply_fn, params, crops, padded, dtype)
            return total, counts, hm, padded, pts

        if self.mesh is not None:
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            repl = replicated_sharding(self.mesh)
            data = data_sharding(self.mesh)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(repl, repl, repl, repl, repl),
                          out_shardings=(repl, repl, data, data, data))
        self._crop_jit[key] = run
        return run

    def _run_gathered(self, frames_bgr: np.ndarray, rows, valid,
                      clamp_hw: Optional[tuple]):
        """Run the gather-crop pipeline over all detections.

        The first launch uses an optimistic bucket (2 people/frame prior) and
        carries the total count as an output — in the common case there is
        exactly one fused launch and one readback, after pose. Overflow
        people are covered by follow-up launches at offset windows (count
        now known, standard power-of-two buckets).
        """
        n_frames = frames_bgr.shape[0]
        mult = self.mesh.size if self.mesh else 1
        frames_dev = frames_bgr if not isinstance(frames_bgr, np.ndarray) \
            else jax.device_put(np.ascontiguousarray(frames_bgr), self.device)

        bucket0 = _buckets(2 * n_frames, self.max_batch_size, mult)
        run = self._get_gather_crop(bucket0, clamp_hw)
        total_d, counts_d, hm, pboxes, pts = run(
            self.params, frames_dev, rows, valid, np.int32(0))
        total = int(total_d)  # first host sync — pose already computed
        counts = np.asarray(counts_d)
        take = min(bucket0, total)
        hm_l = [np.asarray(hm)[:take]]
        box_l = [np.asarray(pboxes)[:take]]
        pts_l = [np.asarray(pts)[:take]]
        start = take
        while start < total:
            b = _buckets(total - start, self.max_batch_size, mult)
            run = self._get_gather_crop(b, clamp_hw)
            _, _, hm, pboxes, pts = run(self.params, frames_dev, rows, valid,
                                        np.int32(start))
            take = min(b, total - start)
            hm_l.append(np.asarray(hm)[:take])
            box_l.append(np.asarray(pboxes)[:take])
            pts_l.append(np.asarray(pts)[:take])
            start += take
        return (counts, np.concatenate(hm_l), np.concatenate(box_l),
                np.concatenate(pts_l))

    def _get_fused_frame(self, in_hw: Tuple[int, int], max_people: int):
        """The north-star path: detect -> crop -> pose -> decode for one
        frame as a SINGLE jitted computation — no host synchronization
        anywhere between stages, so consecutive frames pipeline freely on
        the device queue (the reference crosses host<->device >= 2x per
        frame, SURVEY.md §3.1). People count is static (max_people slots,
        masked by validity).

        Thin per-frame view over ``_get_fused_frames(n_frames=1)`` — one
        traced body for the single and batched serving paths, so parity
        fixes land in both by construction."""
        key = (in_hw, max_people)
        if key in self._fused_jit:
            return self._fused_jit[key]
        batched = self._get_fused_frames(in_hw, max_people, 1)

        def run(pose_params, det_params, frame_bgr):  # (H, W, 3) uint8 BGR
            valid, boxes, hm, pts = batched(pose_params, det_params,
                                            frame_bgr[None])
            return valid[0], boxes[0], hm[0], pts[0]

        self._fused_jit[key] = run
        return run

    def _get_fused_frames(self, in_hw: Tuple[int, int], max_people: int,
                          n_frames: int):
        """Batched variant of the fused per-frame graph: ``n_frames``
        frames detect+crop+pose+decode in ONE jit launch with
        ``n_frames * max_people`` static crop slots. The aggregate-
        throughput serving shape — the pose batch (e.g. 8 frames x 8
        slots = 64 crops) rides the large-batch forward numbers instead
        of the single-frame 8-crop batch that leaves the MXU idle
        (PERF.md multi-person e2e)."""
        key = (in_hw, max_people, n_frames)
        if key in self._fused_jit:
            return self._fused_jit[key]

        det_cap = getattr(self.detector, 'max_detections', max_people)
        if max_people > det_cap:
            raise ValueError(
                f'max_people={max_people} exceeds the detector\'s '
                f'max_detections={det_cap} — the detector can never fill '
                f'those slots; construct SimpleHRNet('
                f'yolo_max_detections={max_people}) or lower max_people')
        det_fn = self.detector.pure_fn(in_hw)
        res_h, res_w = self.resolution
        aspect = res_h / res_w
        apply_fn = self._apply
        dtype = self.dtype

        @jax.jit
        def run(pose_params, det_params, frames_bgr):  # (F, H, W, 3) BGR
            rgb = frames_bgr[..., ::-1]
            rows, valid = det_fn(det_params, rgb.astype(jnp.float32))
            rows = rows[:, :max_people]
            valid = valid[:, :max_people]
            boxes = jnp.round(rows[..., :4]).reshape(-1, 4)
            padded = I.pad_to_aspect(boxes, aspect)

            # nested vmap: outer maps the FRAME axis of rgb itself, inner
            # the people slots — no dynamic rgb[f] indexing; crops via the
            # PIL dense-matmul resampler (see _get_gather_crop)
            def crop_frame(img, pb, ob):
                return jax.vmap(lambda b, o: I.crop_resize_pil(
                    img, b, (res_h, res_w), valid_box=o))(pb, ob)

            crops = jax.vmap(crop_frame)(
                rgb, padded.reshape(n_frames, max_people, 4),
                boxes.reshape(n_frames, max_people, 4))
            crops = crops.reshape(-1, res_h, res_w, 3)
            hm, pts = _pose_tail(apply_fn, pose_params, crops, padded, dtype)
            shp = (n_frames, max_people)
            return (valid, padded.reshape(*shp, 4),
                    hm.reshape(*shp, *hm.shape[1:]),
                    pts.reshape(*shp, *pts.shape[1:]))

        if self.mesh is not None and n_frames % self.mesh.size == 0:
            # SPMD serving: frames shard over the 'data' axis (params
            # replicated); the detector forward, the (n_frames *
            # max_people) crop/pose batch and the decode all inherit the
            # frame-axis sharding, so each chip serves n_frames/n_devices
            # frames per launch — the SURVEY §5.8 "batch-sharded crops"
            # layout. Indivisible n_frames (notably the n_frames=1 view
            # behind _get_fused_frame) run unsharded on the default device.
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            repl = replicated_sharding(self.mesh)
            data = data_sharding(self.mesh)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(repl, repl, data),
                          out_shardings=(data, data, data, data))
        self._fused_jit[key] = run
        return run

    def _get_detect_rows(self, in_hw: Tuple[int, int], n_frames: int,
                         max_people: int):
        """Detect-only jit for the compacted-crop stream: returns the
        score-ordered detector rows, validity and per-frame counts,
        truncated to ``max_people`` per frame exactly like
        ``_get_fused_frames`` — so downstream compaction yields the same
        people the fixed-slot stream would. Outputs stay on device
        (replicated under a mesh, matching ``_get_gather_crop``'s input
        shardings)."""
        key = ('rows', in_hw, n_frames, max_people)
        if key in self._fused_jit:
            return self._fused_jit[key]

        det_cap = getattr(self.detector, 'max_detections', max_people)
        if max_people > det_cap:
            # same guard as _get_fused_frames: rows[:, :max_people] would
            # silently truncate at det_cap, diverging from the fixed-slot
            # stream this path promises to match
            raise ValueError(
                f'max_people={max_people} exceeds the detector\'s '
                f'max_detections={det_cap}; construct SimpleHRNet('
                f'yolo_max_detections={max_people}) or lower max_people')
        det_fn = self.detector.pure_fn(in_hw)

        @jax.jit
        def run(det_params, frames_bgr):  # (F, H, W, 3) BGR
            rgb = frames_bgr[..., ::-1]
            rows, valid = det_fn(det_params, rgb.astype(jnp.float32))
            rows = rows[:, :max_people]
            valid = valid[:, :max_people]
            return rows, valid, valid.sum(axis=1).astype(jnp.int32)

        if self.mesh is not None and n_frames % self.mesh.size == 0:
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            repl = replicated_sharding(self.mesh)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(repl, data_sharding(self.mesh)),
                          out_shardings=(repl, repl, repl))
        self._fused_jit[key] = run
        return run

    def _get_detect_counts(self, in_hw: Tuple[int, int], n_frames: int):
        """Rung 0 of the adaptive slot ladder: a detect-ONLY jit that
        returns the per-frame valid-detection count (F,) int32 — no crop
        slots, no pose batch. The pose batch is 84%+ of the fused graph
        (PERF.md), so an idle camera served at this rung costs only the
        detector (~3x cheaper than the smallest pose rung); any non-zero
        count escalates and re-runs the full fused graph, keeping results
        identical to the fixed-slot stream. Cached under slot key 0."""
        key = (in_hw, 0, n_frames)
        if key in self._fused_jit:
            return self._fused_jit[key]

        det_fn = self.detector.pure_fn(in_hw)

        @jax.jit
        def run(det_params, frames_bgr):  # (F, H, W, 3) BGR
            rgb = frames_bgr[..., ::-1]
            _, valid = det_fn(det_params, rgb.astype(jnp.float32))
            return valid.sum(axis=1).astype(jnp.int32)

        if self.mesh is not None and n_frames % self.mesh.size == 0:
            from simple_hrnet_tpu.parallel import (data_sharding,
                                                   replicated_sharding)
            run = jax.jit(run.__wrapped__,
                          in_shardings=(replicated_sharding(self.mesh),
                                        data_sharding(self.mesh)),
                          out_shardings=data_sharding(self.mesh))
        self._fused_jit[key] = run
        return run

    def _finish_empty(self):
        """The per-frame predict() return structure for a frame with zero
        people — what ``_finish_fused`` produces when no slot is valid,
        built host-side so rung-0 (detect-only) launches need no pose
        outputs. Both model families emit input/4 heatmaps in f32."""
        res = []
        if self.return_heatmaps:
            res.append(np.zeros((0, self.nof_joints, self.resolution[0] // 4,
                                 self.resolution[1] // 4), np.float32))
        if self.return_bounding_boxes:
            res.append(np.zeros((0, 4), np.int32))
        res.append(np.zeros((0, self.nof_joints, 3), np.float32))
        return res if len(res) > 1 else res[0]

    def _finish_fused(self, entry):
        """Convert one frame's fused-graph outputs (device arrays) to the
        reference's per-frame predict() return structure."""
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

    def predict_stream(self, frames, max_people: int = 16,
                       prefetch: int = 2, batch_frames: int = 1,
                       adaptive_slots: bool = False, slot_window: int = 16,
                       compact_crops: bool = False):
        """Pipelined video inference: yields (boxes, pts) per frame
        (plus heatmaps first if return_heatmaps).

        Frames are dispatched to the device ``prefetch`` ahead of result
        consumption; because the whole per-frame pipeline is one jitted
        computation (no host sync), decode of frame i overlaps compute of
        frames i+1..i+prefetch. Requires multiperson=True.

        ``batch_frames > 1`` runs the detector+pose over chunks of that
        many frames in one launch (``_get_fused_frames``): higher
        aggregate fps (the pose batch is batch_frames * max_people crops
        — at one frame the 8-slot pose batch leaves the MXU mostly idle,
        PERF.md), at the cost of batching latency. Results still yield
        per frame, in order; a trailing partial chunk is padded
        internally and only real frames are yielded.

        ``adaptive_slots=True`` treats ``max_people`` as a CAP and sizes
        the static people-slot count to the scene: launches run at the
        smallest power-of-two rung that recent frames fit in, a saturated
        launch (every slot valid below the cap — the detector's row
        truncation may have dropped people) is re-run at the next rung
        up, and the rung steps back down after ``slot_window`` launches
        fit strictly below it. The pose batch is 84%+ of the fused graph
        (PERF.md), so sparse scenes run ~slots/cap of the worst-case
        work; after a full window of EMPTY frames the stream drops to
        rung 0 — a detect-only graph with no pose batch at all (~3x
        cheaper again, the idle-camera tier) that escalates directly to
        a fitting rung on the first detection. Results are identical to
        the fixed-slot stream (detector rows are score-ordered, so
        non-saturated truncation is exact). Each rung compiles its own
        graph on first use (see ``warmup``).

        ``compact_crops=True`` (requires ``batch_frames > 1`` and a
        detector) sizes the pose batch to the window's TOTAL detected
        people instead of ``batch_frames * max_people`` slots: detections
        from all frames in the launch window compact frame-major
        (``_get_gather_crop``'s stable-argsort gather) into one
        power-of-two-bucketed pose batch — a mixed-density window runs
        only the crops it actually holds. Includes a detect-only idle
        tier after an all-empty window. Results are identical to the
        fixed-slot stream; supersedes ``adaptive_slots`` for chunked
        serving (the rung ladder approximates what compaction computes
        exactly), so combining both is an error.
        """
        import collections

        if compact_crops:
            if self.detector is None or batch_frames <= 1:
                raise ValueError('compact_crops=True requires multiperson '
                                 'detection and batch_frames > 1')
            if adaptive_slots:
                raise ValueError('compact_crops already adapts the pose '
                                 'batch to the scene; drop adaptive_slots')
            yield from self._stream_compact(frames, max_people, prefetch,
                                            batch_frames)
            return

        if adaptive_slots and self.detector is not None:
            yield from self._stream_adaptive(frames, max_people, prefetch,
                                             batch_frames, slot_window)
            return

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

            # under a mesh the batch axis must divide the 'data' axis:
            # replicate the frame across devices, keep row 0 (same scheme
            # as _predict_single)
            mult = self.mesh.size if self.mesh is not None else 1
            for frame in frames:
                run = self._get_single(frame.shape[:2], mult)
                hm, pts = run(self.params,
                              np.broadcast_to(frame, (mult, *frame.shape)))
                pending.append((hm[:1], pts[:1], frame.shape))
                if len(pending) > prefetch:
                    yield finish_sp(pending.popleft())
            while pending:
                yield finish_sp(pending.popleft())
            return

        pending = collections.deque()
        finish = self._finish_fused

        if batch_frames <= 1:
            for frame in frames:
                run = self._get_fused_frame(frame.shape[:2], max_people)
                pending.append(run(self.params, self.detector.params,
                                   np.ascontiguousarray(frame)))
                if len(pending) > prefetch:
                    yield finish(pending.popleft())
            while pending:
                yield finish(pending.popleft())
            return

        if self.mesh is not None and batch_frames % self.mesh.size:
            raise ValueError(
                f'batch_frames={batch_frames} must divide the mesh '
                f'({self.mesh.size} devices) so frames shard evenly')

        # chunked dispatch: one launch per batch_frames frames; pending
        # holds (chunk_outputs, row, n_real) so results yield per frame
        def finish_row(entry):
            (valid, boxes, hm, pts), i = entry
            return finish((valid[i], boxes[i], hm[i], pts[i]))

        def dispatch(buf):
            # short chunks (trailing frames, or a mid-stream resolution
            # change) pad by repeating the last frame; only real rows are
            # queued for yield
            n_real = len(buf)
            pad = buf + [buf[-1]] * (batch_frames - n_real)
            run = self._get_fused_frames(pad[0].shape[:2], max_people,
                                         batch_frames)
            out = run(self.params, self.detector.params, np.stack(pad))
            pending.extend((out, i) for i in range(n_real))

        buf = []
        for frame in frames:
            f = np.ascontiguousarray(frame)
            if buf and f.shape != buf[0].shape:
                # heterogeneous stream (camera switch / mixed sources):
                # flush the current chunk so every launch is one geometry,
                # matching the batch_frames=1 path's per-shape support
                dispatch(buf)
                buf = []
            buf.append(f)
            if len(buf) == batch_frames:
                dispatch(buf)
                buf = []
            while len(pending) > prefetch * batch_frames:
                yield finish_row(pending.popleft())
        if buf:
            dispatch(buf)
        while pending:
            yield finish_row(pending.popleft())

    def _stream_adaptive(self, frames, cap: int, prefetch: int,
                         batch_frames: int, slot_window: int):
        """predict_stream's adaptive-slot engine (see its docstring).

        Both the per-frame and the chunked serving modes keep the same
        dispatch-ahead pipelining as the fixed-slot paths; the only
        synchronous extra work is re-running a SATURATED launch (all
        slots valid below the cap) at a bigger rung, which hysteresis
        makes rare. Escalation loops until the launch is unsaturated or
        at the cap, so yielded results match the fixed-slot stream
        exactly."""
        import collections

        if self.mesh is not None and batch_frames > 1 \
                and batch_frames % self.mesh.size:
            raise ValueError(
                f'batch_frames={batch_frames} must divide the mesh '
                f'({self.mesh.size} devices) so frames shard evenly')

        ctl = _SlotController(cap, slot_window)
        pending = collections.deque()

        if batch_frames <= 1:
            def resolve(entry):
                out, slots, frame = entry
                if slots == 0:
                    # detect-only rung: escalate straight to the first
                    # rung that fits the TRUE count (the counts graph sees
                    # every detector row, not a slot truncation), so one
                    # re-run lands where the saturation cascade would
                    n = int(np.asarray(out)[0])
                    if n == 0:
                        ctl.observe(0)
                        return self._finish_empty()
                    slots = ctl.escalate(min(n, cap - 1))
                    run = self._get_fused_frame(frame.shape[:2], slots)
                    out = run(self.params, self.detector.params, frame)
                n = int(np.asarray(out[0]).sum())
                while n >= slots and slots < cap:
                    slots = ctl.escalate(slots)
                    run = self._get_fused_frame(frame.shape[:2], slots)
                    out = run(self.params, self.detector.params, frame)
                    n = int(np.asarray(out[0]).sum())
                ctl.observe(n)
                return self._finish_fused(out)

            for frame in frames:
                f = np.ascontiguousarray(frame)
                if ctl.slots == 0:
                    out = self._get_detect_counts(f.shape[:2], 1)(
                        self.detector.params, f[None])
                else:
                    out = self._get_fused_frame(f.shape[:2], ctl.slots)(
                        self.params, self.detector.params, f)
                pending.append((out, ctl.slots, f))
                if len(pending) > prefetch:
                    yield resolve(pending.popleft())
            while pending:
                yield resolve(pending.popleft())
            return

        # chunked serving: escalation decisions are per LAUNCH (the max
        # count over the chunk's frames), resolved when the chunk's first
        # frame is consumed; rows then yield per frame as usual
        def dispatch(buf):
            n_real = len(buf)
            pad = buf + [buf[-1]] * (batch_frames - n_real)
            stacked = np.stack(pad)
            if ctl.slots == 0:
                out = self._get_detect_counts(pad[0].shape[:2],
                                              batch_frames)(
                    self.detector.params, stacked)
            else:
                out = self._get_fused_frames(pad[0].shape[:2], ctl.slots,
                                             batch_frames)(
                    self.params, self.detector.params, stacked)
            pending.append([out, ctl.slots, stacked, n_real])

        def resolve_chunk(ch):
            out, slots, stacked, n_real = ch
            if slots == 0:
                m = int(np.asarray(out).max())
                if m == 0:
                    ctl.observe(0)
                    return [self._finish_empty() for _ in range(n_real)]
                slots = ctl.escalate(min(m, cap - 1))
                out = self._get_fused_frames(stacked.shape[1:3], slots,
                                             batch_frames)(
                    self.params, self.detector.params, stacked)
            m = int(np.asarray(out[0]).sum(axis=1).max())
            while m >= slots and slots < cap:
                slots = ctl.escalate(slots)
                run = self._get_fused_frames(stacked.shape[1:3], slots,
                                             batch_frames)
                out = run(self.params, self.detector.params, stacked)
                m = int(np.asarray(out[0]).sum(axis=1).max())
            ctl.observe(m)
            valid, boxes, hm, pts = out
            return [self._finish_fused((valid[i], boxes[i], hm[i], pts[i]))
                    for i in range(n_real)]

        buf, ready = [], collections.deque()
        for frame in frames:
            f = np.ascontiguousarray(frame)
            if buf and f.shape != buf[0].shape:
                dispatch(buf)
                buf = []
            buf.append(f)
            if len(buf) == batch_frames:
                dispatch(buf)
                buf = []
            while len(pending) > prefetch:
                ready.extend(resolve_chunk(pending.popleft()))
            while ready:
                yield ready.popleft()
        if buf:
            dispatch(buf)
        while pending:
            ready.extend(resolve_chunk(pending.popleft()))
        while ready:
            yield ready.popleft()

    def _finish_slice(self, hm, boxes, pts):
        """Per-frame predict() return structure from compacted-order
        slices (the cross-frame analogue of ``_finish_fused``)."""
        res = []
        if self.return_heatmaps:
            res.append(np.transpose(hm, (0, 3, 1, 2)))
        if self.return_bounding_boxes:
            res.append(boxes.astype(np.int32))
        res.append(pts.astype(np.float32))
        return res if len(res) > 1 else res[0]

    def _stream_compact(self, frames, max_people: int, prefetch: int,
                        batch_frames: int):
        """predict_stream's cross-frame crop-compaction engine.

        The fixed-slot chunked stream pays ``batch_frames * max_people``
        pose crops per launch whatever the scene holds — a window of
        seven 1-person frames plus one 8-person frame runs 64 crops for
        15 people, and the pose batch is 84%+ of the fused graph
        (PERF.md). Here each window runs TWO launches: a detect-only jit
        (rows/valid stay on device, truncated to ``max_people`` like the
        fixed-slot graph), then ``_get_gather_crop`` — the stable-argsort
        compaction the batched ``predict`` already uses
        (SimpleHRNet.py:345-496's per-image re-split, done once across
        the whole window) — with the pose batch sized to a power-of-two
        bucket of the window's TOTAL detected people. The first pose
        launch is sized optimistically from the previous window's total,
        so the one host sync per window still happens AFTER the pose
        forward; shortfalls run exact follow-up windows (rare, and only
        when density jumps). A window following an all-empty window runs
        the detector alone (the rung-0 idle tier) and sizes the wake-up
        pose launch exactly from the synced counts."""
        import collections

        if self.mesh is not None and batch_frames % self.mesh.size:
            raise ValueError(
                f'batch_frames={batch_frames} must divide the mesh '
                f'({self.mesh.size} devices) so frames shard evenly')

        mult = self.mesh.size if self.mesh else 1
        pending = collections.deque()
        ready = collections.deque()
        # previous window's total people — sizes the next optimistic
        # pose launch; 0 = idle (detect-only until people reappear)
        prior = [2 * batch_frames]

        def dispatch(buf):
            n_real = len(buf)
            pad = buf + [buf[-1]] * (batch_frames - n_real)
            stacked = np.stack(pad)
            frames_dev = stacked if self.mesh is not None else \
                jax.device_put(stacked, self.device)
            rows, valid, counts_d = self._get_detect_rows(
                pad[0].shape[:2], batch_frames, max_people)(
                self.detector.params, frames_dev)
            if prior[0] == 0:
                # idle tier: no pose launch; resolve syncs the detector
                # counts and wakes up with an exactly-sized launch
                pending.append((frames_dev, rows, valid, counts_d,
                                0, None, n_real))
                return
            bucket0 = _buckets(prior[0], self.max_batch_size, mult)
            out = self._get_gather_crop(bucket0, None)(
                self.params, frames_dev, rows, valid, np.int32(0))
            pending.append((frames_dev, rows, valid, counts_d,
                            bucket0, out, n_real))

        def resolve(entry):
            frames_dev, rows, valid, counts_d, bucket0, out, n_real = entry
            if out is None:
                counts = np.asarray(counts_d)  # sync: detector output only
                needed = int(counts[:n_real].sum())
                if needed == 0:
                    prior[0] = 0
                    return [self._finish_empty() for _ in range(n_real)]
                hm_l, box_l, pts_l, start = [], [], [], 0
            else:
                total_d, counts_d, hm, pboxes, pts = out
                total = int(total_d)  # sync AFTER the window's pose launch
                counts = np.asarray(counts_d)
                # padded duplicate frames append their crops AFTER every
                # real frame's (frame-major order) — consume only the real
                needed = int(counts[:n_real].sum())
                take = min(bucket0, needed)
                hm_l = [np.asarray(hm)[:take]]
                box_l = [np.asarray(pboxes)[:take]]
                pts_l = [np.asarray(pts)[:take]]
                start = take
            while start < needed:
                b = _buckets(needed - start, self.max_batch_size, mult)
                _, _, hm, pboxes, pts = self._get_gather_crop(b, None)(
                    self.params, frames_dev, rows, valid, np.int32(start))
                take = min(b, needed - start)
                hm_l.append(np.asarray(hm)[:take])
                box_l.append(np.asarray(pboxes)[:take])
                pts_l.append(np.asarray(pts)[:take])
                start += take
            prior[0] = needed
            hm_all = np.concatenate(hm_l) if hm_l else \
                np.zeros((0, self.resolution[0] // 4,
                          self.resolution[1] // 4, self.nof_joints),
                         np.float32)
            box_all = np.concatenate(box_l) if box_l else \
                np.zeros((0, 4), np.float32)
            pts_all = np.concatenate(pts_l) if pts_l else \
                np.zeros((0, self.nof_joints, 3), np.float32)
            results, index = [], 0
            for i in range(n_real):
                n = int(counts[i])
                results.append(self._finish_slice(
                    hm_all[index:index + n], box_all[index:index + n],
                    pts_all[index:index + n]))
                index += n
            return results

        buf = []
        for frame in frames:
            f = np.ascontiguousarray(frame)
            if buf and f.shape != buf[0].shape:
                dispatch(buf)
                buf = []
            buf.append(f)
            if len(buf) == batch_frames:
                dispatch(buf)
                buf = []
            while len(pending) > prefetch:
                ready.extend(resolve(pending.popleft()))
            while ready:
                yield ready.popleft()
        if buf:
            dispatch(buf)
        while pending:
            ready.extend(resolve(pending.popleft()))
        while ready:
            yield ready.popleft()

    # ------------------------------------------------------------------
    # public API (reference SimpleHRNet.py:174-210 contract)
    # ------------------------------------------------------------------

    def warmup(self, frame_hw: Tuple[int, int], batch_sizes=(1,),
               stream_max_people=None, stream_batch_frames=(1,)) -> dict:
        """Precompile the inference pipelines for a frame geometry.

        The serving analogue of building a fixed-shape TensorRT engine:
        first-request latency drops from XLA-compile time (tens of
        seconds) to execution time. Runs each listed frame-batch size
        through ``predict`` on a zero frame (compiling the whole-frame or
        detect->crop->pose->decode graph, detector included); with
        ``stream_max_people`` (an int, an iterable of ints,
        ``('adaptive', cap)`` to cover every rung the adaptive stream can
        visit, or ``('compact', cap)`` to cover the compact_crops
        stream's detect-rows graph and every power-of-two people bucket
        up to a full window) also compiles the ``predict_stream`` fused
        graph(s), one per entry of ``stream_batch_frames`` (pass the
        ``batch_frames`` values you will serve with). Combine with JAX's
        persistent compilation cache to amortize across processes.

        Returns {'single': n, 'gather': n, 'fused': n} executable-cache
        sizes (follow-up people-bucket shapes beyond the optimistic first
        launch still compile lazily — they depend on detection counts).
        """
        h, w = int(frame_hw[0]), int(frame_hw[1])
        for b in batch_sizes:
            dummy = np.zeros((b, h, w, 3), np.uint8)
            self.predict(dummy[0] if b == 1 else dummy)
        if stream_max_people is not None and self.detector is not None:
            compact_cap = None
            if isinstance(stream_max_people, int):
                slot_counts = [stream_max_people]
            elif (len(stream_max_people) == 2
                  and stream_max_people[0] == 'adaptive'):
                slot_counts = _slot_ladder(int(stream_max_people[1]))
            elif (len(stream_max_people) == 2
                  and stream_max_people[0] == 'compact'):
                compact_cap = int(stream_max_people[1])
                slot_counts = []
            else:
                slot_counts = [int(s) for s in stream_max_people]
            if compact_cap is not None:
                mult = self.mesh.size if self.mesh else 1
                for nf in stream_batch_frames:
                    nf = max(int(nf), 1)
                    rows_run = self._get_detect_rows((h, w), nf, compact_cap)
                    rows, valid, _ = rows_run(
                        self.detector.params,
                        np.zeros((nf, h, w, 3), np.uint8))
                    # every power-of-two people bucket a window can need,
                    # executed (not lower().compile()d — see below) so the
                    # stream's dispatch cache is the one warmed
                    b = _buckets(1, self.max_batch_size, mult)
                    seen = set()
                    while True:
                        if b not in seen:
                            seen.add(b)
                            out = self._get_gather_crop(b, None)(
                                self.params,
                                np.zeros((nf, h, w, 3), np.uint8),
                                rows, valid, np.int32(0))
                            jax.block_until_ready(out)
                        if b >= _buckets(compact_cap * nf,
                                         self.max_batch_size, mult):
                            break
                        b = _buckets(b + 1, self.max_batch_size, mult)
            for slots in slot_counts:
                for nf in stream_batch_frames:
                    # execute once on zero frames: lower().compile() would
                    # build an executable OUTSIDE jit's dispatch cache and
                    # the stream's later calls would compile again
                    if slots == 0:
                        # the adaptive ladder's detect-only idle rung
                        run = self._get_detect_counts((h, w), max(nf, 1))
                        out = run(self.detector.params,
                                  np.zeros((max(nf, 1), h, w, 3), np.uint8))
                    elif nf <= 1:
                        run = self._get_fused_frame((h, w), slots)
                        out = run(self.params, self.detector.params,
                                  np.zeros((h, w, 3), np.uint8))
                    else:
                        run = self._get_fused_frames((h, w), slots, nf)
                        out = run(self.params, self.detector.params,
                                  np.zeros((nf, h, w, 3), np.uint8))
                    jax.block_until_ready(out)
        return {'single': len(self._single_jit),
                'gather': len(self._crop_jit),
                'fused': len(self._fused_jit)}

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
            # under a mesh the frame batch must divide the 'data' axis:
            # replicate the frame across devices and keep row 0
            mult = self.mesh.size if self.mesh is not None else 1
            run = self._get_single(image.shape[:2], mult)
            hm, pts = run(self.params,
                          np.broadcast_to(image, (mult, *image.shape)))
            hm, pts = hm[:1], pts[:1]
            heatmaps = np.transpose(np.asarray(hm), (0, 3, 1, 2))
            boxes = np.asarray(
                [[0, 0, image.shape[1], image.shape[0]]], np.float32)
            return self._assemble(heatmaps, boxes,
                                  np.asarray(pts, np.float32))

        # detection stays on device; _run_gathered fuses crop+pose+decode
        # with it (the only host sync is AFTER the first pose forward)
        rows, valid = self.detector.detect_padded(
            np.ascontiguousarray(image[..., ::-1])[None])
        counts, hm_all, boxes_all, pts_all = self._run_gathered(
            image[None], rows, valid, clamp_hw=None)
        if int(counts[0]) == 0:
            empty_hm = np.zeros((0, self.nof_joints, hm_h, hm_w), np.float32)
            return self._assemble(empty_hm, np.empty((0, 4), np.int32),
                                  np.empty((0, 0, 3), np.float32))

        heatmaps = np.transpose(hm_all, (0, 3, 1, 2))
        return self._assemble(heatmaps, boxes_all.astype(np.int32),
                              pts_all.astype(np.float32))

    def _predict_batch(self, images: np.ndarray):
        hm_h, hm_w = self.resolution[0] // 4, self.resolution[1] // 4
        n_img = images.shape[0]

        if not self.multiperson:
            # pad the frame batch to a mesh-divisible count (same trailing-
            # frame padding the bucket paths use), slice back after
            mult = self.mesh.size if self.mesh is not None else 1
            pad = (-n_img) % mult
            imgs = np.concatenate(
                [images, np.repeat(images[-1:], pad, axis=0)]) \
                if pad else images
            run = self._get_single(images.shape[1:3], n_img + pad)
            hm, pts = run(self.params, imgs)
            hm, pts = hm[:n_img], pts[:n_img]
            heatmaps = np.transpose(np.asarray(hm), (0, 3, 1, 2))
            boxes = np.repeat(np.asarray(
                [[0, 0, images.shape[2], images.shape[1]]], np.float32),
                n_img, axis=0)
            pts = np.expand_dims(np.asarray(pts, np.float32), axis=1)
            return self._assemble(heatmaps, boxes, pts)

        # detection stays on device; the gather pipeline compacts all valid
        # (frame, box) pairs frame-major and fuses crop+pose+decode with it.
        # reference batch path clamps corrected boxes to the frame and crops
        # real pixels (SimpleHRNet.py:393-410) -> clamp_hw
        rows, valid = self.detector.detect_padded(
            np.ascontiguousarray(images[..., ::-1]))
        counts, hm_all, boxes_all, pts_all = self._run_gathered(
            images, rows, valid,
            clamp_hw=(int(images.shape[1]), int(images.shape[2])))

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
