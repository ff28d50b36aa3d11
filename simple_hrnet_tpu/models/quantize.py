"""Post-training int8 quantization — the TensorRT-int8 analogue.

The reference's deployment story tops out at TensorRT fp16 engines
(/root/reference/scripts/export-tensorrt-model.py:41 ``--half``); the
standard step beyond fp16 in TRT is post-training int8 with an activation
calibration pass. This module brings that to the TPU path, where the MXU's
int8 mode doubles the bf16 peak (measured 1.96x on the W48 branch-0 conv
that bottlenecks the whole model — PERF.md round 2c).

Recipe (classic TRT-style PTQ, symmetric/per-channel):

  1. ``calibrate(apply_fn, params, batches)`` runs the model EAGERLY on a
     few batches while ``layers._QCAL`` records each conv's input amax,
     keyed by the identity of its param node (call order and tree order
     differ; node identity is stable for both).
  2. ``quantize_folded(params, amax)`` rewrites selected conv nodes:
     ``kernel`` (f32 HWIO) -> ``kernel_q`` (int8) + ``wscale``
     (per-output-channel, amax/127) + ``ascale`` (input amax/127).
     ``layers.conv2d`` detects ``kernel_q`` and runs the int8 MXU path.

Selection policy: int8 only wins where the conv is MXU-bound at full
lanes — measured on v5e: 3x3 C<=128 convs gain 1.9-2x; 1x1 convs and
C>=192 lose to the quantize/dequantize VPU traffic (PERF.md). The default
policy quantizes k>=3 convs with 16 <= C_in, C_out <= 128, skipping the
image stem (C_in=3) and the decode-sensitive final 1x1 layer.

Accuracy: symmetric 8-bit on smooth conv stacks costs ~0.5-1% relative
error per layer (test_quantize.py pins end-to-end heatmap argmax parity
on random-weight HRNet); with real weights the COCO AP cost of TRT-style
PTQ on HRNet-class CNNs is typically <1 AP — validate with
scripts/validate_goldens.py when real weights exist.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from simple_hrnet_tpu.models import layers as L

Params = Dict[str, Any]


def default_policy(kernel_shape) -> bool:
    """Quantize 3x3(+) convs with both channel dims in [16, 128]."""
    kh, kw, ci, co = kernel_shape
    return kh >= 3 and kw >= 3 and 16 <= ci <= 128 and 16 <= co <= 128


@contextlib.contextmanager
def collecting(store: Dict[int, float]):
    """Install ``store`` as the conv-input amax collector."""
    prev = L._QCAL
    L._QCAL = store
    try:
        yield store
    finally:
        L._QCAL = prev


def calibrate(apply_fn: Callable, params: Params,
              batches: Iterable[np.ndarray], **kw) -> Dict[int, float]:
    """Run ``apply_fn(params, batch, **kw)`` eagerly over ``batches`` and
    return {id(conv_node): input amax}. ``apply_fn`` must NOT be jitted
    (tracers carry no values); the model's plain ``apply`` works.
    """
    amax: Dict[int, float] = {}
    with collecting(amax):
        for b in batches:
            apply_fn(params, jnp.asarray(b))
    return amax


def quantize_folded(params: Params, amax: Dict[int, float],
                    policy: Optional[Callable] = None) -> Params:
    """Rewrite calibrated conv nodes of a FOLDED tree for the int8 path.

    Nodes keep their position in the tree (state_dict-mirroring paths are
    preserved); only ``kernel`` is replaced by ``kernel_q``/``wscale``/
    ``ascale``. Uncalibrated or policy-rejected nodes pass through
    untouched and keep running in f32/bf16 — mixed-precision per layer,
    exactly like a TRT engine mixing int8 and fp16 tactics.
    """
    policy = policy or default_policy

    def walk(node):
        if not isinstance(node, dict):
            return node
        if 'kernel' in node and id(node) in amax \
                and policy(node['kernel'].shape):
            a = amax[id(node)]
            if a <= 0.0:
                return node
            k = np.asarray(node['kernel'], np.float32)
            ws = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
            ws = np.where(ws == 0.0, 1.0, ws)
            kq = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
            out = {kk: vv for kk, vv in node.items() if kk != 'kernel'}
            out['kernel_q'] = jnp.asarray(kq)
            out['wscale'] = jnp.asarray(ws, jnp.float32)
            out['ascale'] = jnp.float32(a / 127.0)
            return out
        return {kk: walk(vv) for kk, vv in node.items()}

    return walk(params)


def node_paths(tree: Params, prefix=()) -> Dict[int, str]:
    """{id(conv_node): 'dotted.path'} for every node holding a kernel.

    The amax map is keyed by node identity; this gives those keys a
    human/stage-addressable name (e.g. 'stage4.2.branches.0.0.conv1')."""
    out: Dict[int, str] = {}
    if isinstance(tree, dict):
        if 'kernel' in tree or 'kernel_q' in tree:
            out[id(tree)] = '.'.join(prefix)
        for k, v in tree.items():
            out.update(node_paths(v, prefix + (str(k),)))
    return out


def filter_amax(params: Params, amax: Dict[int, float],
                exclude: Iterable[str]) -> Dict[int, float]:
    """Drop calibration entries whose param path is under an excluded
    prefix, so those convs stay bf16/f32.

    ``exclude`` entries are dotted path prefixes matched on component
    boundaries — ('stage4',) excludes every conv under the stage4 group.
    The accuracy-policy knob from the per-stage sensitivity sweep
    (PERF.md round 5: stage4 feeds the decode head directly and is the
    int8-accuracy-hot group; scripts/bench_int8_sensitivity.py)."""
    exclude = tuple(exclude)
    if not exclude:
        return amax
    paths = node_paths(params)

    def matches(path: str, e: str) -> bool:
        return path == e or path.startswith(e + '.')

    # A prefix that matches nothing is a silent accuracy-policy no-op
    # (typo'd 'stage_4', wrong model) — fail loudly instead.
    unmatched = [e for e in exclude
                 if not any(matches(p, e) for p in paths.values())]
    if unmatched:
        groups = sorted({p.split('.')[0] for p in paths.values()})
        raise ValueError(
            f'int8_exclude prefixes {unmatched} match no conv param path '
            f'in this model (top-level groups: {groups})')

    return {i: a for i, a in amax.items()
            if not any(matches(paths.get(i, ''), e) for e in exclude)}


def quantize_model(apply_fn: Callable, params: Params,
                   batches: Iterable[np.ndarray],
                   policy: Optional[Callable] = None) -> Params:
    """calibrate + quantize_folded in one call."""
    return quantize_folded(params, calibrate(apply_fn, params, batches),
                           policy=policy)


def calibrate_cpu(apply_fn: Callable, params: Params,
                  batches: Iterable[np.ndarray]) -> Dict[int, float]:
    """``calibrate`` with leaves converted to numpy IN PLACE (node-dict ids
    preserved — they key the amax map) and the eager forward pinned to the
    CPU backend: eager dispatch through a TPU relay would pay one RTT per
    conv. Callers re-device the tree afterwards (jnp.asarray tree_map)."""
    import jax

    def to_np(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                to_np(v)
            else:
                tree[k] = np.asarray(v)
    to_np(params)
    try:
        cpu = jax.local_devices(backend='cpu')[0]
    except RuntimeError:
        cpu = None
    if cpu is not None and jax.default_backend() != 'cpu':
        with jax.default_device(cpu):
            return calibrate(apply_fn, params, batches)
    return calibrate(apply_fn, params, batches)


def smooth_frames(shape_hw, n: int = 1, lo: float = 0.0, hi: float = 1.0,
                  seed: int = 0) -> np.ndarray:
    """Smooth synthetic calibration frames: coarse noise upsampled 8x.

    Smoothness matters — white noise under-excites deep activations and
    would under-estimate amax ranges."""
    rng = np.random.default_rng(seed)
    h, w = shape_hw
    coarse = rng.uniform(lo, hi, (n, h // 8, w // 8, 3))
    return np.kron(coarse.transpose(0, 3, 1, 2),
                   np.ones((8, 8))).transpose(0, 2, 3, 1).astype(np.float32)
