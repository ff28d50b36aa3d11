"""Grouped-trunk HRNet inference: the whole multi-branch trunk runs on
batch-halves-grouped tensors with block-diagonal weights.

Why (PERF.md): at W48, branch-0/1 convs and most fusion/transition convs
have 48-96 output channels — far below the 128-lane MXU width — and
grouping G images into the channel dim trades G-fold redundant FLOPs for
full lanes. `blockdiag_chain` applies this per branch-chain (regrouping at
each chain boundary); this module groups ONCE after layer1 and ungroups
once before the head, so all transitions and fuse layers run grouped too.
The large-channel branches (C >= 192), where grouping loses, are computed
ungrouped inside the grouped flow — their tensors are small, so the
regroup concats are negligible.

Numerically exact vs models/hrnet.apply in f32 (zero blocks contribute
exact zeros); bf16 shows only reduction-reorder drift. Inference only
(folded BN).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from . import hrnet
from . import layers as L

Params = Dict[str, Any]

# branches computed ungrouped inside the grouped flow. Measured (PERF.md):
# grouping branch 0 + transitions + fuse layers wins (1154 img/s W48-b16);
# grouping branch 1 (C=96) or the big-C branches loses.
UNGROUPED_BRANCHES = (1, 2, 3)


def _blockdiag_conv(node: Params, group: int,
                    amax: Optional[Dict[int, float]] = None) -> Params:
    """{'kernel' (k,k,Ci,Co), 'bias' (Co,)} -> block-diagonal G-grouped.

    With ``amax`` (calibration map keyed by id(node)), 3x3+ packed convs
    whose packed dims stay BELOW the 128 MXU lanes are emitted quantized
    (per-output-channel int8 + the original conv's static activation
    scale — per-tensor amax is invariant under the batch-halves channel
    packing), so e.g. W48's 96-lane grouped transitions ride the int8 MXU
    path too. At >=128 packed lanes int8 measured at-or-below bf16 for
    single convs (quant/dequant VPU traffic on full-lane tensors —
    PERF.md round 2c; W32's 128-lane packed trunk regressed 3926->3140
    img/s before this gate), so those stay bf16.
    """
    k = np.asarray(node['kernel'], np.float32)
    kh, kw, ci, co = k.shape
    w = np.zeros((kh, kw, group * ci, group * co), np.float32)
    for g in range(group):
        w[:, :, g * ci:(g + 1) * ci, g * co:(g + 1) * co] = k
    out: Params = {}
    a = amax.get(id(node)) if amax is not None else None
    if a is not None and a > 0.0 and kh >= 3 and kw >= 3 \
            and max(group * ci, group * co) < 128:
        ws = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        ws = np.where(ws == 0.0, 1.0, ws)
        out['kernel_q'] = jnp.asarray(
            np.clip(np.round(w / ws), -127, 127).astype(np.int8))
        out['wscale'] = jnp.asarray(ws, jnp.float32)
        out['ascale'] = jnp.float32(a / 127.0)
    else:
        out['kernel'] = jnp.asarray(w)
    if 'bias' in node:
        out['bias'] = jnp.asarray(np.tile(np.asarray(node['bias'],
                                                     np.float32), group))
    return out


def _pack_tree(tree: Params, group: int,
               amax: Optional[Dict[int, float]] = None) -> Params:
    if not isinstance(tree, dict):
        return tree
    if 'kernel' in tree:
        return _blockdiag_conv(tree, group, amax)
    return {k: _pack_tree(v, group, amax) for k, v in tree.items()}


def pack_grouped(folded_params: Params, group: int = 2,
                 group_stem: bool = False,
                 pallas_chains: bool = True,
                 int8_amax: Optional[Dict[int, float]] = None) -> Params:
    """Block-diagonal weights for the trunk (transitions + stages).

    Call on FOLDED params. Branch blocks listed in UNGROUPED_BRANCHES are
    not packed (they run on ungrouped tensors with the original weights).
    ``group_stem`` additionally packs conv2 + layer1 (C=64 convs, half the
    MXU lanes ungrouped — PERF.md round 2), so grouping starts right after
    the 3-channel conv1.

    ``pallas_chains``: when a grouped branch's width hits the 128 MXU
    lanes exactly (W32 branch 0: C=32 x G=4), also stack its 4-BasicBlock
    chain weights for the VMEM-resident Pallas kernel (measured 1.5x over
    the XLA blockdiag chain at that shape — PERF.md round 2); the apply
    falls back to per-block convs when the spatial width is unaligned.

    ``int8_amax``: calibration amaxes ({id(conv_node): input amax} from
    models/quantize.calibrate on ``folded_params``). When given, grouped
    branch chains whose packed width is NOT 128 lanes (where the Pallas
    bf16 kernel would win instead) are additionally packed as int8
    (``chain{b}_q``) — measured 1.41x over the bf16 blockdiag at W48's
    96 lanes (PERF.md round 2c).
    """
    packed: Params = {}
    for key in ('transition1', 'transition2', 'transition3'):
        packed[key] = _pack_tree(folded_params[key], group, int8_amax)
    if group_stem:
        packed['conv2'] = _blockdiag_conv(folded_params['conv2'], group,
                                          int8_amax)
        packed['layer1'] = _pack_tree(folded_params['layer1'], group,
                                      int8_amax)
    for stage, (n_mod, n_br) in hrnet.STAGE_CFG.items():
        ps: Params = {}
        for m in range(n_mod):
            sp = folded_params[stage][str(m)]
            branches: Params = {}
            for b in range(n_br):
                if b in UNGROUPED_BRANCHES:
                    continue
                branches[str(b)] = _pack_tree(sp['branches'][str(b)], group)
                blocks = [sp['branches'][str(b)][str(i)] for i in range(4)]
                c = blocks[0]['conv1']['kernel'].shape[2]
                if int8_amax is not None and all(
                        id(blk[ck]) in int8_amax
                        for blk in blocks for ck in ('conv1', 'conv2')):
                    # int8 chains win at every pack width: XLA blockdiag
                    # formulation below 128 lanes (1.41x bf16 at W48's 96),
                    # the VMEM-resident Pallas int8 kernel at exactly 128
                    # (0.141 vs 0.180 ms pallas-bf16 — PERF.md round 2c).
                    # The key encodes Pallas eligibility STRUCTURALLY so
                    # portable engine exports (pallas_chains=False) never
                    # bake a Mosaic custom call: _q may run the kernel,
                    # _qx is XLA-only.
                    from simple_hrnet_tpu.ops.pallas.fused_block import (
                        pack_chain_weights_int8)
                    suffix = '_q' if pallas_chains else '_qx'
                    branches[f'chain{b}{suffix}'] = pack_chain_weights_int8(
                        blocks, int8_amax, group=group)
                elif pallas_chains and group * c == 128:
                    from simple_hrnet_tpu.ops.pallas.fused_block import (
                        pack_chain_weights)
                    from simple_hrnet_tpu.ops.pallas.winograd_chain import (
                        pack_winograd_weights)
                    # stored f32; the kernels cast to the activation dtype
                    w, bias = pack_chain_weights(blocks, jnp.float32,
                                                 group=group)
                    # 'ww': Winograd-H transformed weights — measured
                    # 1.09x over chain v3 at the 128-lane pack (PERF.md
                    # round 4); the apply prefers it when H is even
                    branches[f'chain{b}'] = {'w': w, 'b': bias,
                                             'ww': pack_winograd_weights(
                                                 w, jnp.float32)}
            ps[str(m)] = {'branches': branches,
                          'fuse_layers': _pack_tree(sp['fuse_layers'], group,
                                                    int8_amax)}
        packed[stage] = ps
    return packed


def _group(x: jnp.ndarray, group: int) -> jnp.ndarray:
    b = x.shape[0]
    step = b // group
    return jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                           axis=-1)


def _ungroup(x: jnp.ndarray, group: int, c: int) -> jnp.ndarray:
    return jnp.concatenate([x[..., g * c:(g + 1) * c] for g in range(group)],
                           axis=0)


def _stage_module_grouped(packed_m: Params, orig_m: Params,
                          xs: List[jnp.ndarray], n_branches: int, n_out: int,
                          group: int, c_base: int, dtype,
                          fuse_up_pallas: bool = False) -> List[jnp.ndarray]:
    """StageModule on grouped tensors; big-C branches computed ungrouped."""
    kw = dict(train=False, stats=None, axis_name=None, dtype=dtype)
    xs = list(xs)
    for b in range(n_branches):
        if b in UNGROUPED_BRANCHES:
            c = c_base * (2 ** b)
            xu = _ungroup(xs[b], group, c)
            for blk in range(4):
                xu = L.basic_block(orig_m['branches'][str(b)][str(blk)], xu,
                                   **kw)
            xs[b] = _group(xu, group)
        else:
            chain_q = packed_m['branches'].get(f'chain{b}_q')
            chain_qx = packed_m['branches'].get(f'chain{b}_qx')
            if chain_q is not None or chain_qx is not None:
                from simple_hrnet_tpu.ops.pallas.fused_block import (
                    blockdiag_chain_int8_grouped, chain_pallas_int8_ok,
                    chain_pallas_int8_grouped)
                q = chain_q if chain_q is not None else chain_qx
                if chain_q is not None and chain_pallas_int8_ok(
                        xs[b].shape[2], chain_q['wq'].shape[-1]):
                    xs[b] = chain_pallas_int8_grouped(xs[b], chain_q)
                else:
                    xs[b] = blockdiag_chain_int8_grouped(
                        xs[b], q, dtype=dtype or jnp.float32)
                continue
            chain = packed_m['branches'].get(f'chain{b}')
            if chain is not None:
                from simple_hrnet_tpu.ops.pallas.fused_block import (
                    chain_pallas_grouped, chain_pallas_ok)
                from simple_hrnet_tpu.ops.pallas.winograd_chain import (
                    chain_pallas_grouped_wino, wino_pallas_ok)
                if 'ww' in chain and wino_pallas_ok(
                        xs[b].shape[1], xs[b].shape[2], xs[b].dtype):
                    # Winograd-H chain: 2/3 the MXU MACs of v3 in the
                    # same taps-on-lanes layout — measured 0.155 vs
                    # 0.168 ms at the W32 128-lane pack (PERF.md round 4)
                    xs[b] = chain_pallas_grouped_wino(xs[b], chain['ww'],
                                                      chain['b'])
                    continue
                if chain_pallas_ok(xs[b].shape[2], xs[b].dtype):
                    # VMEM-resident Pallas chain on the grouped tensor (128
                    # lanes exactly; see ops/pallas/fused_block.py)
                    xs[b] = chain_pallas_grouped(xs[b], chain['w'],
                                                 chain['b'])
                    continue
            bp = packed_m['branches'][str(b)]
            for blk in range(4):
                xs[b] = L.basic_block(bp[str(blk)], xs[b], **kw)

    fused = []
    fl = packed_m['fuse_layers']
    for i in range(n_out):
        if i == 0 and n_branches > 1 and hrnet._fuse_up_ok(
                fl, xs, n_branches, fuse_up_pallas, kw):
            from simple_hrnet_tpu.ops.pallas.fuse_up import fuse_up
            srcs = [fl['0'][str(j)]['0'] for j in range(1, n_branches)]
            fused.append(fuse_up(
                xs[0], xs[1:n_branches],
                [s['kernel'] for s in srcs],
                [s.get('bias', jnp.zeros(xs[0].shape[-1])) for s in srcs]))
            continue
        acc: Optional[jnp.ndarray] = None
        for j in range(n_branches):
            if i == j:
                y = xs[j]
            elif i < j:
                y = hrnet._fuse_up(fl[str(i)][str(j)], xs[j], 2 ** (j - i),
                                   **kw)
            else:
                y = hrnet._fuse_down(fl[str(i)][str(j)], xs[j], i - j, **kw)
            acc = y if acc is None else acc + y
        fused.append(L.relu(acc))
    return fused


def apply_grouped(params: Params, packed: Params, x: jnp.ndarray,
                  dtype=None, fuse_up_pallas: bool = False,
                  upto: Optional[str] = None) -> jnp.ndarray:
    """Forward with the grouped trunk (pads odd batches internally).

    ``upto`` ('stem'|'t1'|'stage2'|'stage3'|'stage4') returns the
    intermediate activation(s) at that point instead of heatmaps —
    nested-prefix profiling support (scripts/bench_int8_breakdown.py);
    production callers leave it None.
    """
    # group is static (derived from shapes, safe under jit tracing);
    # ``params`` may carry int8-quantized nodes (kernel_q) — models/quantize
    t1n = params['transition1']['0']['0']
    c_base = (t1n['kernel'] if 'kernel' in t1n else t1n['kernel_q']).shape[3]
    t1p = packed['transition1']['0']['0']
    group = (t1p['kernel'] if 'kernel' in t1p
             else t1p['kernel_q']).shape[3] // c_base
    orig_b = x.shape[0]
    pad = (-orig_b) % group
    if pad:
        x = jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
    kw = dict(train=False, stats=None, axis_name=None, dtype=dtype)

    # conv1 (3->C) is contraction-starved either way; everything after it
    # can run grouped (conv2 + layer1 are C=64 convs — half the MXU lanes
    # ungrouped), controlled by pack_grouped(group_stem=...)
    h = L.conv_bn(x, params, 'conv1', 'bn1', stride=2, padding=1, act=True,
                  **kw)
    if 'conv2' in packed:
        hg = _group(h, group)
        hg = L.conv_bn(hg, packed, 'conv2', 'bn2', stride=2, padding=1,
                       act=True, **kw)
        for i in range(4):
            hg = L.bottleneck(packed['layer1'][str(i)], hg, **kw)
    else:
        h = L.conv_bn(h, params, 'conv2', 'bn2', stride=2, padding=1,
                      act=True, **kw)
        for i in range(4):
            h = L.bottleneck(params['layer1'][str(i)], h, **kw)
        hg = _group(h, group)
    if upto == 'stem':
        return hg
    t1 = packed['transition1']
    xs = [
        L.conv_bn(hg, t1['0'], '0', '1', stride=1, padding=1, act=True, **kw),
        L.conv_bn(hg, t1['1']['0'], '0', '1', stride=2, padding=1, act=True,
                  **kw),
    ]
    if upto == 't1':
        return xs

    n_mod, n_br = hrnet.STAGE_CFG['stage2']
    for m in range(n_mod):
        xs = _stage_module_grouped(packed['stage2'][str(m)],
                                   params['stage2'][str(m)], xs, n_br, n_br,
                                   group, c_base, dtype,
                                   fuse_up_pallas=fuse_up_pallas)
    if upto == 'stage2':
        return xs
    xs = xs + [L.conv_bn(xs[-1], packed['transition2']['2']['0'], '0', '1',
                         stride=2, padding=1, act=True, **kw)]

    n_mod, n_br = hrnet.STAGE_CFG['stage3']
    for m in range(n_mod):
        xs = _stage_module_grouped(packed['stage3'][str(m)],
                                   params['stage3'][str(m)], xs, n_br, n_br,
                                   group, c_base, dtype,
                                   fuse_up_pallas=fuse_up_pallas)
    if upto == 'stage3':
        return xs
    xs = xs + [L.conv_bn(xs[-1], packed['transition3']['3']['0'], '0', '1',
                         stride=2, padding=1, act=True, **kw)]

    n_mod, n_br = hrnet.STAGE_CFG['stage4']
    for m in range(n_mod):
        n_out = 1 if m == n_mod - 1 else n_br
        xs = _stage_module_grouped(packed['stage4'][str(m)],
                                   params['stage4'][str(m)], xs, n_br, n_out,
                                   group, c_base, dtype,
                                   fuse_up_pallas=fuse_up_pallas)

    if upto == 'stage4':
        return xs
    out = _ungroup(xs[0], group, c_base).astype(jnp.float32)
    out = L.conv2d(out, params['final_layer'], stride=1, padding=0)
    return out[:orig_b]
