"""Darknet network definition, cfg parsing and ``.weights`` loading in JAX.

The reference outsources person detection to external torch repos (a git
submodule for YOLOv3 — .gitmodules:1-3 — and torch.hub for YOLOv5:
models_/detectors/YOLOv3.py:12, YOLOv5.py:61-66). This framework owns the
detector: the canonical YOLOv3 / YOLOv3-tiny graphs are built natively
(block lists identical to the official cfgs), user-supplied ``.cfg`` files
are parsed with the same parser, and original darknet ``.weights`` binaries
load directly into the JAX pytree, so the standard pretrained person
detectors work out of the box.

All shapes are static: a fixed square input (default 416) yields the fixed
10647x85 (yolov3) / 2535x85 (tiny) prediction tensor the reference pipeline
assumes (models_/detectors/YOLOv3.py:131).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
Block = Dict[str, Any]


# ---------------------------------------------------------------------------
# Canonical architectures (public YOLOv3 / YOLOv3-tiny layer graphs)
# ---------------------------------------------------------------------------

def _conv(filters: int, size: int, stride: int = 1, bn: bool = True,
          activation: str = 'leaky') -> Block:
    return {'type': 'convolutional', 'filters': filters, 'size': size,
            'stride': stride, 'pad': (size - 1) // 2, 'bn': bn,
            'activation': activation}


def _res(filters: int) -> List[Block]:
    """Darknet-53 residual unit: 1x1 half-width, 3x3 full, shortcut -3."""
    return [_conv(filters // 2, 1), _conv(filters, 3),
            {'type': 'shortcut', 'from': -3}]


YOLOV3_ANCHORS = [(10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
                  (59, 119), (116, 90), (156, 198), (373, 326)]
TINY_ANCHORS = [(10, 14), (23, 27), (37, 58), (81, 82), (135, 169),
                (344, 319)]


def yolov3_blocks(num_classes: int = 80) -> List[Block]:
    """The YOLOv3 graph (Darknet-53 + FPN heads), identical to yolov3.cfg."""
    nf = 3 * (num_classes + 5)
    b: List[Block] = [_conv(32, 3)]
    # backbone stages: (downsample filters, residual repeats)
    for filters, repeats in [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]:
        b.append(_conv(filters, 3, stride=2))
        for _ in range(repeats):
            b.extend(_res(filters))
    # indices of the 256- and 512-channel stage outputs (official cfg: 36, 61)
    idx_36 = 1 + (1 + 3 * 1) + (1 + 3 * 2) + (1 + 3 * 8) - 1        # = 36
    idx_61 = idx_36 + (1 + 3 * 8)                                    # = 61
    # head 1 (stride 32)
    for _ in range(2):
        b.extend([_conv(512, 1), _conv(1024, 3)])
    b.append(_conv(512, 1))
    b.extend([_conv(1024, 3), _conv(nf, 1, bn=False, activation='linear')])
    b.append({'type': 'yolo', 'mask': [6, 7, 8], 'anchors': YOLOV3_ANCHORS,
              'classes': num_classes})
    # head 2 (stride 16)
    b.append({'type': 'route', 'layers': [-4]})
    b.extend([_conv(256, 1), {'type': 'upsample', 'stride': 2},
              {'type': 'route', 'layers': [-1, idx_61]}])
    for _ in range(2):
        b.extend([_conv(256, 1), _conv(512, 3)])
    b.append(_conv(256, 1))
    b.extend([_conv(512, 3), _conv(nf, 1, bn=False, activation='linear')])
    b.append({'type': 'yolo', 'mask': [3, 4, 5], 'anchors': YOLOV3_ANCHORS,
              'classes': num_classes})
    # head 3 (stride 8)
    b.append({'type': 'route', 'layers': [-4]})
    b.extend([_conv(128, 1), {'type': 'upsample', 'stride': 2},
              {'type': 'route', 'layers': [-1, idx_36]}])
    for _ in range(2):
        b.extend([_conv(128, 1), _conv(256, 3)])
    b.append(_conv(128, 1))
    b.extend([_conv(256, 3), _conv(nf, 1, bn=False, activation='linear')])
    b.append({'type': 'yolo', 'mask': [0, 1, 2], 'anchors': YOLOV3_ANCHORS,
              'classes': num_classes})
    return b


def yolov3_tiny_blocks(num_classes: int = 80) -> List[Block]:
    """The YOLOv3-tiny graph, identical to yolov3-tiny.cfg."""
    nf = 3 * (num_classes + 5)
    b: List[Block] = []
    for filters in [16, 32, 64, 128, 256]:
        b.append(_conv(filters, 3))
        b.append({'type': 'maxpool', 'size': 2, 'stride': 2})
    # layer index 8 = the 256-filter conv (route target in the official cfg)
    b.append(_conv(512, 3))
    b.append({'type': 'maxpool', 'size': 2, 'stride': 1})  # 'same' maxpool
    b.append(_conv(1024, 3))
    b.append(_conv(256, 1))        # index 13, route -4 target
    b.append(_conv(512, 3))
    b.append(_conv(nf, 1, bn=False, activation='linear'))
    b.append({'type': 'yolo', 'mask': [3, 4, 5], 'anchors': TINY_ANCHORS,
              'classes': num_classes})
    b.append({'type': 'route', 'layers': [-4]})
    b.append(_conv(128, 1))
    b.append({'type': 'upsample', 'stride': 2})
    b.append({'type': 'route', 'layers': [-1, 8]})
    b.append(_conv(256, 3))
    b.append(_conv(nf, 1, bn=False, activation='linear'))
    b.append({'type': 'yolo', 'mask': [0, 1, 2], 'anchors': TINY_ANCHORS,
              'classes': num_classes})
    return b


# ---------------------------------------------------------------------------
# cfg parsing (for user-supplied darknet cfg files)
# ---------------------------------------------------------------------------

def parse_cfg(path: str) -> List[Block]:
    """Parse a darknet .cfg into the same block-list format as above."""
    sections: List[Tuple[str, Dict[str, str]]] = []
    with open(path) as f:
        current: Optional[Dict[str, str]] = None
        for line in f:
            line = line.strip()
            if not line or line.startswith(('#', ';')):
                continue
            if line.startswith('['):
                current = {}
                sections.append((line[1:-1].strip(), current))
            elif current is not None and '=' in line:
                k, v = line.split('=', 1)
                current[k.strip()] = v.strip()

    blocks: List[Block] = []
    anchors: List[Tuple[float, float]] = []
    for name, sec in sections:
        if name in ('net', 'network'):
            continue
        if name == 'convolutional':
            act = sec.get('activation', 'linear')
            if act not in ('linear', 'leaky', 'relu', 'logistic', 'mish',
                           'swish', 'silu'):
                # fail at parse time — an unknown activation silently
                # treated as linear produces garbage detections
                raise ValueError(
                    f'Unsupported darknet activation {act!r} (supported: '
                    'linear, leaky, relu, logistic, mish, swish/silu)')
            size = int(sec['size'])
            if 'padding' in sec:  # darknet's explicit padding= overrides
                pad = int(sec['padding'])
            else:
                pad = (size - 1) // 2 if sec.get('pad') == '1' else 0
            blocks.append({
                'type': 'convolutional',
                'filters': int(sec['filters']),
                'size': size,
                'stride': int(sec.get('stride', 1)),
                'pad': pad,
                'bn': sec.get('batch_normalize') == '1',
                'activation': act,
            })
        elif name == 'shortcut':
            blocks.append({'type': 'shortcut', 'from': int(sec['from'])})
        elif name == 'route':
            layers = [int(x) for x in sec['layers'].split(',')]
            blk: Block = {'type': 'route', 'layers': layers}
            if 'groups' in sec:  # yolov4-tiny channel-split routes
                blk['groups'] = int(sec['groups'])
                blk['group_id'] = int(sec.get('group_id', 0))
            blocks.append(blk)
        elif name == 'upsample':
            blocks.append({'type': 'upsample', 'stride': int(sec['stride'])})
        elif name == 'maxpool':
            blocks.append({'type': 'maxpool', 'size': int(sec.get('size', 2)),
                           'stride': int(sec.get('stride', 2))})
        elif name == 'yolo':
            a = [float(x) for x in sec['anchors'].split(',')]
            anchors = [(a[i], a[i + 1]) for i in range(0, len(a), 2)]
            blocks.append({'type': 'yolo',
                           'mask': [int(x) for x in sec['mask'].split(',')],
                           'anchors': anchors,
                           'classes': int(sec.get('classes', 80))})
        else:
            raise ValueError(f'Unsupported darknet section [{name}]')
    return blocks


# ---------------------------------------------------------------------------
# Build / init / forward
# ---------------------------------------------------------------------------

def output_channels(blocks: List[Block]) -> List[int]:
    """Static per-layer channel bookkeeping (for init and weight loading)."""
    chans: List[int] = []
    for i, blk in enumerate(blocks):
        t = blk['type']
        if t == 'convolutional':
            chans.append(blk['filters'])
        elif t in ('shortcut', 'upsample', 'maxpool', 'yolo'):
            chans.append(chans[i - 1])
        elif t == 'route':
            total = 0
            for l in blk['layers']:
                total += chans[l if l >= 0 else i + l]
            chans.append(total // blk.get('groups', 1))
    return chans


def init(key, blocks: List[Block], in_channels: int = 3) -> Params:
    """Random params for a darknet graph; keys are ``conv_<layer_idx>``."""
    from simple_hrnet_tpu.models import layers as L
    chans = output_channels(blocks)
    params: Params = {}
    prev_c = in_channels
    for i, blk in enumerate(blocks):
        if blk['type'] == 'convolutional':
            key, sub = jax.random.split(key)
            # shared torch-default init (models/layers.py — one home for
            # the kaiming_uniform(a=sqrt(5)) bound arithmetic)
            node: Params = dict(L.init_conv(sub, blk['size'], prev_c,
                                            blk['filters'],
                                            bias=not blk['bn']))
            if blk['bn']:
                node['bn'] = L.init_bn(blk['filters'])
            params[f'conv_{i}'] = node
        prev_c = chans[i]
    return params


def load_darknet_weights(path: str, blocks: List[Block],
                         in_channels: int = 3) -> Params:
    """Load an original darknet ``.weights`` binary into a params tree.

    Format (as consumed by the reference's submodule loader,
    YOLOv3.py:103-105): 5 int32 header, then per conv layer either
    [bn_bias, bn_scale, bn_mean, bn_var] or [conv_bias], followed by conv
    weights in OIHW order.
    """
    chans = output_channels(blocks)
    data = np.fromfile(path, dtype=np.float32, offset=5 * 4)
    ptr = 0
    params: Params = {}
    prev_c = in_channels
    for i, blk in enumerate(blocks):
        if blk['type'] == 'convolutional':
            f, k = blk['filters'], blk['size']
            node: Params = {}
            if blk['bn']:
                bias = data[ptr:ptr + f]; ptr += f
                scale = data[ptr:ptr + f]; ptr += f
                mean = data[ptr:ptr + f]; ptr += f
                var = data[ptr:ptr + f]; ptr += f
                node['bn'] = {'scale': jnp.asarray(scale),
                              'bias': jnp.asarray(bias),
                              'mean': jnp.asarray(mean),
                              'var': jnp.asarray(var)}
            else:
                node['bias'] = jnp.asarray(data[ptr:ptr + f]); ptr += f
            n_w = f * prev_c * k * k
            w = data[ptr:ptr + n_w].reshape(f, prev_c, k, k); ptr += n_w
            node['kernel'] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
            params[f'conv_{i}'] = node
        prev_c = chans[i]
    if ptr != data.size:
        raise ValueError(
            f'weights file size mismatch: consumed {ptr} of {data.size} floats '
            f'— cfg/graph does not match the weights')
    return params


def fold_weights(params: Params) -> Params:
    """Fold darknet BN into conv kernels for inference (see layers.fold_batch_norm)."""
    from simple_hrnet_tpu.models import layers as L
    out: Params = {}
    for name, node in params.items():
        if 'bn' in node:
            out[name] = L._fold_pair({'kernel': node['kernel']}, node['bn'])
        else:
            out[name] = node
    return out


def stem_phaseable(blocks: List[Block]) -> bool:
    """True when the first two blocks are a phaseable darknet stem — a
    stride-1 3x3 conv followed by EITHER a stride-2 3x3 downsample conv
    (yolov3 proper) or a 2x2 stride-2 maxpool (yolov3-tiny; a 2x2 s2
    maxpool in phase space is an elementwise max over the 4 phase channel
    blocks — exact, PERF.md round 5) — and no later block routes back to
    block 0 (whose output would be in phase layout under the
    space-to-depth stem, ops/phase.py)."""
    if len(blocks) < 2:
        return False
    b0, b1 = blocks[0], blocks[1]
    if not (b0['type'] == 'convolutional' and b0['size'] == 3
            and b0['stride'] == 1 and b0['pad'] == 1):
        return False
    down_conv = (b1['type'] == 'convolutional' and b1['size'] == 3
                 and b1['stride'] == 2 and b1['pad'] == 1)
    down_pool = (b1['type'] == 'maxpool' and b1['size'] == 2
                 and b1['stride'] == 2)
    if not (down_conv or down_pool):
        return False
    for i, blk in enumerate(blocks):
        if blk['type'] == 'shortcut':
            f = blk['from']
            if (f if f >= 0 else i + f) == 0:
                return False
        if blk['type'] == 'route':
            if any((l if l >= 0 else i + l) == 0 for l in blk['layers']):
                return False
    return True


def phase_stem_params(params: Params, blocks: List[Block] = None) -> Params:
    """Rewrite the FOLDED stem convs into their exact phase-space forms
    (ops/phase.py): conv_0 (3,3,ci,co) -> (3,3,4ci,4co) with a 4-tiled
    bias (phase-space output); and, for the conv+conv stem, conv_1
    (3,3,co,c1) -> (2,2,4co,c1) whose output is the standard layout (the
    conv+maxpool stem exits phase space via the block-max in ``apply``
    instead — no conv_1 rewrite). Must run BEFORE int8 quantization so
    calibration sees the shipped kernels (the transformed convs fall
    outside the int8 policy and run bf16, the measured-fastest form).

    Pass ``blocks`` to validate the graph actually qualifies
    (``stem_phaseable``) — an explicit ``phase_stem=True`` on a custom
    non-3x3/pad-1 stem fails loudly here instead of producing silently
    wrong numerics."""
    from simple_hrnet_tpu.ops import phase as P

    if blocks is not None and not stem_phaseable(blocks):
        raise ValueError(
            'phase_stem requested but the graph stem does not qualify '
            '(need conv 3x3 s1 pad1 -> conv 3x3 s2 pad1 | maxpool 2x2 s2, '
            'with no later route/shortcut back to block 0)')
    pool_stem = blocks is not None and blocks[1]['type'] == 'maxpool'
    if 'conv_0' not in params or (not pool_stem and 'conv_1' not in params):
        raise ValueError('phase_stem_params needs conv_0 (+ conv_1 for the '
                         'conv+conv stem); pass blocks= for maxpool stems')
    out = dict(params)
    c0 = params['conv_0']
    c1 = None if pool_stem else params['conv_1']
    for node in filter(None, (c0, c1)):
        if 'bn' in node or 'kernel_q' in node:
            raise ValueError('phase_stem_params expects folded, '
                             'unquantized stem convs')
        if np.asarray(node['kernel']).shape[:2] != (3, 3):
            raise ValueError('phase_stem_params expects 3x3 stem kernels, '
                             f"got {np.asarray(node['kernel']).shape}")
    k0, _ = P.phase_kernel_s1(np.asarray(c0['kernel']), pad=1)
    out['conv_0'] = {'kernel': jnp.asarray(k0),
                     'bias': jnp.asarray(P.tile_phase_bias(c0['bias']))}
    if c1 is not None:
        k1, _ = P.phase_kernel_s2(np.asarray(c1['kernel']), pad=1)
        out['conv_1'] = {'kernel': jnp.asarray(k1), 'bias': c1['bias']}
    return out


def _yolo_decode(x: jnp.ndarray, blk: Block, img_size: int) -> jnp.ndarray:
    """Decode one YOLO head: (N, g, g, A*(5+C)) -> (N, A*g*g, 5+C) where
    A = len(mask) (3 for every yolov3-family head).

    Box decode (cx, cy, w, h in input pixels), sigmoid objectness and class
    scores — the format the reference's non_max_suppression consumes.
    """
    n, gh, gw, _ = x.shape
    n_cls = blk['classes']
    anchors = jnp.asarray([blk['anchors'][m] for m in blk['mask']], jnp.float32)
    na = len(blk['mask'])
    stride = img_size / gw
    x = x.reshape(n, gh, gw, na, 5 + n_cls)
    cy = jnp.arange(gh, dtype=jnp.float32)[None, :, None, None]
    cx = jnp.arange(gw, dtype=jnp.float32)[None, None, :, None]
    bx = (jax.nn.sigmoid(x[..., 0]) + cx) * stride
    by = (jax.nn.sigmoid(x[..., 1]) + cy) * stride
    bw = jnp.exp(x[..., 2]) * anchors[None, None, None, :, 0]
    bh = jnp.exp(x[..., 3]) * anchors[None, None, None, :, 1]
    obj = jax.nn.sigmoid(x[..., 4])
    cls = jax.nn.sigmoid(x[..., 5:])
    out = jnp.concatenate(
        [jnp.stack([bx, by, bw, bh, obj], axis=-1), cls], axis=-1)
    # match the darknet flatten order: (anchor, gy, gx)
    return out.transpose(0, 3, 1, 2, 4).reshape(n, na * gh * gw, 5 + n_cls)


def apply(params: Params, blocks: List[Block], x: jnp.ndarray,
          img_size: int, dtype=None, phase_stem: bool = False) -> jnp.ndarray:
    """Forward the darknet graph. x: (N, S, S, 3) in [0, 1] — or, with
    ``phase_stem=True``, the (N, S/2, S/2, 12) phase tensor (ops/phase.py)
    with ``phase_stem_params``-transformed weights: conv_0 runs phase-to-
    phase and conv_1 exits to the standard layout (asymmetric top/left
    pad), after which the graph is unchanged. Returns the concatenated
    prediction tensor (N, total_anchors, 5 + classes)."""
    from simple_hrnet_tpu.models import layers as L

    outputs: List[jnp.ndarray] = []
    detections: List[jnp.ndarray] = []
    for i, blk in enumerate(blocks):
        t = blk['type']
        if t == 'convolutional':
            node = params[f'conv_{i}']
            pad = blk['pad']
            stride = blk['stride']
            if phase_stem and i <= 1:
                # paddings come from the kernel rewrite itself
                # (phase_paddings derives them from phase_kernel_s1/s2)
                from simple_hrnet_tpu.ops import phase as P
                s1p, s2p = P.phase_paddings(blk['size'], blk['size'],
                                            blk['pad'])
                pad = s1p if i == 0 else s2p
                stride = 1
            y = L.conv2d(x, node, stride=stride, padding=pad,
                         dtype=dtype)
            if 'bn' in node:
                y = L.batch_norm(y, node['bn'])
            act = blk['activation']
            if act == 'leaky':
                y = jax.nn.leaky_relu(y, 0.1)
            elif act == 'relu':
                y = jnp.maximum(y, 0)
            elif act == 'logistic':
                y = jax.nn.sigmoid(y)
            elif act == 'mish':
                y = y * jnp.tanh(jax.nn.softplus(y))
            elif act in ('swish', 'silu'):
                y = y * jax.nn.sigmoid(y)
            # 'linear': identity; parse_cfg rejects anything else
            x = y
        elif t == 'shortcut':
            # darknet semantics: negative from = relative, >=0 = absolute
            f = blk['from']
            x = x + outputs[f if f >= 0 else i + f]
        elif t == 'route':
            feats = [outputs[l if l >= 0 else i + l] for l in blk['layers']]
            x = feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)
            g = blk.get('groups', 1)
            if g > 1:  # yolov4-tiny: route keeps one channel group
                cg = x.shape[-1] // g
                gid = blk.get('group_id', 0)
                x = x[..., gid * cg:(gid + 1) * cg]
        elif t == 'upsample':
            x = L.upsample_nearest(x, blk['stride'])
        elif t == 'maxpool':
            if phase_stem and i == 1:
                # phase-space 2x2 s2 maxpool: the 4 phase channel blocks
                # of a position ARE its 2x2 full-res window, so the pool
                # is an elementwise max over 4 contiguous lane slices —
                # exits phase space to the standard (S/2, S/2, C) layout
                # (exact; tests/test_detector.py tiny phase parity)
                c4 = x.shape[-1] // 4
                q = [x[..., k * c4:(k + 1) * c4] for k in range(4)]
                x = jnp.maximum(jnp.maximum(q[0], q[1]),
                                jnp.maximum(q[2], q[3]))
            elif blk['stride'] == 1:
                # darknet 'same' maxpool (tiny): pad right/bottom
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max,
                    (1, blk['size'], blk['size'], 1), (1, 1, 1, 1),
                    [(0, 0), (0, blk['size'] - 1), (0, blk['size'] - 1), (0, 0)])
            else:
                # torch-submodule semantics (the parity target): MaxPool2d
                # with padding=(size-1)//2 — 0 for the even windows the
                # built-in cfgs use, but non-zero for e.g. size-3 pools
                # in user cfgs
                mp = (blk['size'] - 1) // 2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max,
                    (1, blk['size'], blk['size'], 1),
                    (1, blk['stride'], blk['stride'], 1),
                    [(0, 0), (mp, mp), (mp, mp), (0, 0)])
        elif t == 'yolo':
            detections.append(_yolo_decode(x.astype(jnp.float32), blk, img_size))
        outputs.append(x)
    return jnp.concatenate(detections, axis=1)
