"""Grouped-trunk HRNet TRAINING: the inference fast path's block-diagonal
batch-halves packing (models/hrnet_fast.py), made differentiable and
BN-correct so the same MXU-shape win applies to the train step.

Why: the W48 train step's time is dominated by the same small-channel
high-resolution convs as inference (PERF.md "Where the time goes"); the
grouped trunk bought inference 895 -> 1181 img/s by trading G-fold
redundant FLOPs for full 128-lane MXU tiles. Training could not reuse it
because (a) the packed weights were built host-side (no gradient flow) and
(b) train-mode BN statistics over a grouped tensor mix image subsets.
Here:

  * block-diagonal kernels are built IN-GRAPH from the base parameters
    (`_bd`), so wgrads flow back through the scatter and accumulate over
    the G diagonal blocks — exactly the ungrouped weight gradient;
  * train-mode BN on a grouped tensor pools the per-lane-block moments
    across the G blocks (equal sub-batch sizes -> the pooled mean/E[x^2]
    equal the full-batch moments), normalizes with the pooled stats tiled
    back to G*C lanes, and records them under the SAME paths as
    models/hrnet.apply so `layers.update_running_stats` applies unchanged.

Forward/loss/gradients match the plain path to f32 reduction-reorder
tolerance (tests/test_train_grouped.py). Branches 1..3 run ungrouped
inside the grouped flow exactly like inference (their full-batch BN is
then trivially correct). Reference semantics being accelerated:
/root/reference/models_/hrnet.py:74-189 + training/COCO.py:136-144.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.models import layers as L

Params = Dict[str, Any]

UNGROUPED_BRANCHES = (1, 2, 3)  # same choice as hrnet_fast (PERF.md)


def _bd(kernel: jnp.ndarray, group: int) -> jnp.ndarray:
    """(kh, kw, Ci, Co) -> block-diagonal (kh, kw, G*Ci, G*Co), in-graph.

    Built as kernel ⊗ eye(G) via einsum (a broadcast multiply): its
    transpose is a dense masked reduction over the G diagonal blocks —
    exactly the ungrouped weight gradient — which XLA fuses far better
    than the scatter/gather pair an ``.at[].set`` formulation emits."""
    kh, kw, ci, co = kernel.shape
    eye = jnp.eye(group, dtype=kernel.dtype)
    out = jnp.einsum('hwio,gf->hwgifo', kernel, eye)
    return out.reshape(kh, kw, group * ci, group * co)


def _group(x: jnp.ndarray, group: int) -> jnp.ndarray:
    b = x.shape[0]
    step = b // group
    return jnp.concatenate([x[g * step:(g + 1) * step] for g in range(group)],
                           axis=-1)


def _ungroup(x: jnp.ndarray, group: int, c: int) -> jnp.ndarray:
    return jnp.concatenate([x[..., g * c:(g + 1) * c] for g in range(group)],
                           axis=0)


def _conv_grouped(x: jnp.ndarray, conv_p: Params, group: int, *,
                  stride: int = 1, padding: int = 0, dtype=None
                  ) -> jnp.ndarray:
    kernel = _bd(conv_p['kernel'], group)
    if dtype is not None:
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=(jnp.promote_types(x.dtype, jnp.float32)
                                if dtype is None else None))
    if 'bias' in conv_p:
        out = out + jnp.tile(conv_p['bias'], group).astype(out.dtype)
    return out


def _bn_grouped(x: jnp.ndarray, p: Params, group: int, *, train: bool,
                stats: Optional[dict], path: str,
                axis_name: Optional[str]) -> jnp.ndarray:
    """BatchNorm on a (B/G, H, W, G*C) grouped tensor with FULL-batch
    statistics: per-lane-block moments are pooled across the G blocks
    (equal sub-batches -> exact full-batch mean/E[x^2])."""
    c = p['mean'].shape[0]
    if train:
        x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        m_blocks = jnp.mean(x32, axis=(0, 1, 2)).reshape(group, c)
        sq_blocks = jnp.mean(jnp.square(x32), axis=(0, 1, 2)).reshape(group,
                                                                      c)
        mean = m_blocks.mean(axis=0)
        mean_sq = sq_blocks.mean(axis=0)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        if stats is not None:
            n = x.shape[0] * group * x.shape[1] * x.shape[2]
            if axis_name is not None:
                n = n * jax.lax.psum(1, axis_name)
            stats[path] = (mean, var, n)
    else:
        mean, var = p['mean'], p['var']
    inv = jax.lax.rsqrt(var + L.BN_EPS) * p['scale']
    mean_t = jnp.tile(mean, group).astype(x.dtype)
    inv_t = jnp.tile(inv, group).astype(x.dtype)
    bias_t = jnp.tile(p['bias'], group).astype(x.dtype)
    return (x - mean_t) * inv_t + bias_t


def _conv_bn_g(x, node: Params, conv_key: str, bn_key: str, group: int, *,
               stride: int = 1, padding: int = 0, act: bool = False,
               train: bool = False, stats=None, path: str = '',
               axis_name=None, dtype=None) -> jnp.ndarray:
    out = _conv_grouped(x, node[conv_key], group, stride=stride,
                        padding=padding, dtype=dtype)
    if bn_key in node:
        out = _bn_grouped(out, node[bn_key], group, train=train, stats=stats,
                          path=f'{path}.{bn_key}' if path else bn_key,
                          axis_name=axis_name)
    if act:
        out = L.relu(out)
    return out


def _basic_block_g(p: Params, x: jnp.ndarray, group: int, *, path: str,
                   **kw) -> jnp.ndarray:
    residual = x
    out = _conv_bn_g(x, p, 'conv1', 'bn1', group, stride=1, padding=1,
                     act=True, path=path, **kw)
    out = _conv_bn_g(out, p, 'conv2', 'bn2', group, stride=1, padding=1,
                     act=False, path=path, **kw)
    return L.relu(out + residual)


def _stage_module_g(p: Params, xs: List[jnp.ndarray], n_branches: int,
                    n_out: int, group: int, c_base: int, path: str,
                    **kw) -> List[jnp.ndarray]:
    xs = list(xs)
    for b in range(n_branches):
        bp = p['branches'][str(b)]
        if b in UNGROUPED_BRANCHES:
            c = c_base * (2 ** b)
            xu = _ungroup(xs[b], group, c)
            for blk in range(4):
                xu = L.basic_block(bp[str(blk)], xu,
                                   path=f'{path}.branches.{b}.{blk}', **kw)
            xs[b] = _group(xu, group)
        else:
            for blk in range(4):
                xs[b] = _basic_block_g(bp[str(blk)], xs[b], group,
                                       path=f'{path}.branches.{b}.{blk}',
                                       **kw)

    fused = []
    fl = p['fuse_layers']
    for i in range(n_out):
        acc = None
        for j in range(n_branches):
            if i == j:
                y = xs[j]
            elif i < j:
                y = _conv_bn_g(xs[j], fl[str(i)][str(j)], '0', '1', group,
                               stride=1, padding=0, act=False,
                               path=f'{path}.fuse_layers.{i}.{j}', **kw)
                y = L.upsample_nearest(y, 2 ** (j - i))
            else:
                y = xs[j]
                steps = i - j
                for k in range(steps):
                    last = (k == steps - 1)
                    y = _conv_bn_g(y, fl[str(i)][str(j)][str(k)], '0', '1',
                                   group, stride=2, padding=1, act=not last,
                                   path=f'{path}.fuse_layers.{i}.{j}.{k}',
                                   **kw)
            acc = y if acc is None else acc + y
        fused.append(L.relu(acc))
    return fused


def apply_grouped(params: Params, x: jnp.ndarray, *, group: int = 2,
                  train: bool = False, stats: Optional[dict] = None,
                  axis_name: Optional[str] = None, dtype=None
                  ) -> jnp.ndarray:
    """HRNet forward with the grouped trunk, training-capable.

    Same contract as models/hrnet.apply (NHWC in, heatmaps out; train-mode
    batch stats recorded into ``stats`` under hrnet.apply's paths). The
    batch must be divisible by ``group`` (the trainer's fixed batch sizes
    are; odd inference batches should use the inference path).
    """
    if x.shape[0] % group:
        raise ValueError(f'batch {x.shape[0]} not divisible by '
                         f'group {group}')
    kw = dict(train=train, stats=stats, axis_name=axis_name, dtype=dtype)
    t1n = params['transition1']['0']['0']
    c_base = t1n['kernel'].shape[3]

    h = L.conv_bn(x, params, 'conv1', 'bn1', stride=2, padding=1, act=True,
                  **kw)
    h = L.conv_bn(h, params, 'conv2', 'bn2', stride=2, padding=1, act=True,
                  **kw)
    for i in range(4):
        h = L.bottleneck(params['layer1'][str(i)], h, path=f'layer1.{i}',
                         **kw)
    hg = _group(h, group)

    t1 = params['transition1']
    xs = [
        _conv_bn_g(hg, t1['0'], '0', '1', group, stride=1, padding=1,
                   act=True, path='transition1.0', **kw),
        _conv_bn_g(hg, t1['1']['0'], '0', '1', group, stride=2, padding=1,
                   act=True, path='transition1.1.0', **kw),
    ]

    n_mod, n_br = hrnet.STAGE_CFG['stage2']
    for m in range(n_mod):
        xs = _stage_module_g(params['stage2'][str(m)], xs, n_br, n_br,
                             group, c_base, f'stage2.{m}', **kw)
    xs = xs + [_conv_bn_g(xs[-1], params['transition2']['2']['0'], '0', '1',
                          group, stride=2, padding=1, act=True,
                          path='transition2.2.0', **kw)]

    n_mod, n_br = hrnet.STAGE_CFG['stage3']
    for m in range(n_mod):
        xs = _stage_module_g(params['stage3'][str(m)], xs, n_br, n_br,
                             group, c_base, f'stage3.{m}', **kw)
    xs = xs + [_conv_bn_g(xs[-1], params['transition3']['3']['0'], '0', '1',
                          group, stride=2, padding=1, act=True,
                          path='transition3.3.0', **kw)]

    n_mod, n_br = hrnet.STAGE_CFG['stage4']
    for m in range(n_mod):
        n_out = 1 if m == n_mod - 1 else n_br
        xs = _stage_module_g(params['stage4'][str(m)], xs, n_br, n_out,
                             group, c_base, f'stage4.{m}', **kw)

    out = _ungroup(xs[0], group, c_base)
    out = out.astype(jnp.promote_types(out.dtype, jnp.float32))
    return L.conv2d(out, params['final_layer'], stride=1, padding=0)


def make_apply(group: int = 2):
    """An hrnet.apply-compatible forward running the grouped trunk (drop
    into train.steps.make_train_step / Train(use_grouped_trunk=True)).

    Batches not divisible by ``group`` (e.g. a val loader's last partial
    batch) fall back to the plain path — the shape is static under jit,
    so this is a trace-time dispatch, not graph control flow.
    """
    def apply_fn(params, x, *, train=False, stats=None, axis_name=None,
                 dtype=None, **_ignored):
        if x.shape[0] % group:
            return hrnet.apply(params, x, train=train, stats=stats,
                               axis_name=axis_name, dtype=dtype)
        return apply_grouped(params, x, group=group, train=train,
                             stats=stats, axis_name=axis_name, dtype=dtype)
    return apply_fn
