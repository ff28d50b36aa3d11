"""HRNet pose network — functional JAX/XLA implementation (NHWC).

Re-implements the architecture of /root/reference/models_/hrnet.py:74-189
(stem -> 4 Bottlenecks -> transitions creating 2/3/4 resolution branches ->
repeated StageModules with all-to-all fusion -> 1x1 head) as pure functions
over a params pytree whose structure mirrors the official ``pose_hrnet_*``
state_dict names, so checkpoint conversion is bit-faithful.

TPU-first choices:
  * NHWC activations / HWIO kernels (MXU-friendly; channels ride the lanes).
  * One forward definition serves both folded-BN inference (fast path) and
    unfolded training (batch-stats collection) — see models/layers.py.
  * No Python-level dynamic control flow: branch/stage structure is static,
    everything jits to a single XLA computation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]

# (n_modules, n_branches) per stage; stage4's last module emits 1 branch
# (reference hrnet.py:112-152).
STAGE_CFG = {
    'stage2': (1, 2),
    'stage3': (4, 3),
    'stage4': (3, 4),
}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fuse_down(p: Params, x: jnp.ndarray, steps: int, **kw) -> jnp.ndarray:
    """i > j fusion path: chain of stride-2 3x3 conv+BN(+ReLU) blocks.

    Reference hrnet.py:36-51 — intermediate links have ReLU, the final one
    does not (the sum is ReLU'd afterwards).
    """
    path = kw.pop('path', '')
    for k in range(steps):
        last = (k == steps - 1)
        x = L.conv_bn(x, p[str(k)], '0', '1', stride=2, padding=1,
                      act=not last, path=f'{path}.{k}', **kw)
    return x


def _fuse_up(p: Params, x: jnp.ndarray, factor: int, **kw) -> jnp.ndarray:
    """i < j fusion path: 1x1 conv + BN + nearest upsample (hrnet.py:31-35)."""
    x = L.conv_bn(x, p, '0', '1', stride=1, padding=0, act=False, **kw)
    return L.upsample_nearest(x, factor)


def apply_stage_module(p: Params, xs: List[jnp.ndarray], n_branches: int,
                       n_out: int, fused_chains: Optional[dict] = None,
                       fuse_up_pallas: bool = False,
                       **kw) -> List[jnp.ndarray]:
    """One StageModule: per-branch 4x BasicBlock then O(branches^2) fusion.

    Reference hrnet.py:55-71. ``fused_chains`` optionally maps
    '<path>.branches.<b>' -> (packed_weights, biases) to route a branch's
    block chain through the Pallas fused kernel (inference fast path,
    see ops/pallas/fused_block.py and PERF.md). ``fuse_up_pallas`` routes
    the high-res output's resize-add fusion through the Pallas fuse_up
    kernel (12x over the XLA fuse at W48 scale — PERF.md; folded-BN
    inference only).
    """
    path = kw.pop('path', '')
    xs = list(xs)
    for b in range(n_branches):
        chain_key = f'{path}.branches.{b}'
        # inference-only: the packed weights are frozen folded-BN
        # constants — routing a TRAINING forward through them would
        # record no batch stats and zero the branch's gradients
        if (fused_chains is not None and chain_key in fused_chains
                and not kw.get('train')):
            from simple_hrnet_tpu.ops.pallas.fused_block import (
                blockdiag_chain, fused_basic_chain)
            mode, wts, bias = fused_chains[chain_key]
            if mode == 'pallas':
                xs[b] = fused_basic_chain(xs[b], wts, bias)
            else:
                xs[b] = blockdiag_chain(xs[b], wts, bias,
                                        dtype=kw.get('dtype') or xs[b].dtype)
            continue
        bp = p['branches'][str(b)]
        for blk in range(4):
            xs[b] = L.basic_block(bp[str(blk)], xs[b],
                                  path=f'{path}.branches.{b}.{blk}', **kw)

    fused = []
    fl = p['fuse_layers']
    for i in range(n_out):
        if i == 0 and n_branches > 1 and _fuse_up_ok(fl, xs, n_branches,
                                                     fuse_up_pallas, kw):
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
                y = _fuse_up(fl[str(i)][str(j)], xs[j], 2 ** (j - i),
                             path=f'{path}.fuse_layers.{i}.{j}', **kw)
            else:
                y = _fuse_down(fl[str(i)][str(j)], xs[j], i - j,
                               path=f'{path}.fuse_layers.{i}.{j}', **kw)
            acc = y if acc is None else acc + y
        fused.append(L.relu(acc))
    return fused


def _fuse_up_ok(fl: Params, xs: List[jnp.ndarray], n_branches: int,
                enabled: bool, kw: dict) -> bool:
    """Gate for the Pallas fuse_up path: inference, folded BN, shapes ok.
    On CPU the kernel would run interpreted (very slow) — opt-in only
    (SHT_PALLAS_CPU_INTERPRET=1, same switch as the chain kernel)."""
    if not enabled or kw.get('train'):
        return False
    import jax as _jax
    if _jax.default_backend() == 'cpu':
        from simple_hrnet_tpu.ops.pallas.fused_block import (
            cpu_interpret_enabled)
        if not cpu_interpret_enabled():
            return False
    for j in range(1, n_branches):
        if '1' in fl['0'][str(j)]:  # unfolded BN present
            return False
    from simple_hrnet_tpu.ops.pallas.fuse_up import fuse_up_supported
    return fuse_up_supported(xs[0].shape, [x.shape for x in xs[1:n_branches]])


def _transition_new_branch(p: Params, x: jnp.ndarray, **kw) -> jnp.ndarray:
    """Double-nested stride-2 conv+BN+ReLU creating a new, lower branch.

    The double nesting ('0' inside the transition slot) mirrors the official
    weights layout (reference hrnet.py:104,120,140).
    """
    path = kw.pop('path', '')
    return L.conv_bn(x, p['0'], '0', '1', stride=2, padding=1, act=True,
                     path=f'{path}.0', **kw)


def apply(params: Params, x: jnp.ndarray, *, train: bool = False,
          stats: Optional[dict] = None, axis_name: Optional[str] = None,
          dtype=None, fused_chains: Optional[dict] = None,
          fuse_up_pallas: bool = False) -> jnp.ndarray:
    """HRNet forward: NHWC in, (N, H/4, W/4, nof_joints) heatmaps out.

    Mirrors reference hrnet.py:157-189. ``dtype=jnp.bfloat16`` runs the conv
    stack in bf16 with f32 accumulation (MXU native); the head output is f32.
    ``fused_chains`` (from ``pack_fused_chains``) routes high-res branch
    block chains through the Pallas fused kernel (inference only);
    ``fuse_up_pallas`` does the same for the high-res resize-add fusion.
    """
    kw = dict(train=train, stats=stats, axis_name=axis_name, dtype=dtype)
    stage_kw = dict(kw, fused_chains=fused_chains,
                    fuse_up_pallas=fuse_up_pallas)

    # Stem: two stride-2 3x3 convs (hrnet.py:79-83) -> H/4.
    x = L.conv_bn(x, params, 'conv1', 'bn1', stride=2, padding=1, act=True, **kw)
    x = L.conv_bn(x, params, 'conv2', 'bn2', stride=2, padding=1, act=True, **kw)

    # layer1: 4 Bottlenecks, first with 64->256 downsample (hrnet.py:86-95).
    for i in range(4):
        x = L.bottleneck(params['layer1'][str(i)], x,
                         path=f'layer1.{i}', **kw)

    # transition1 creates the two initial branches (hrnet.py:98-109).
    t1 = params['transition1']
    xs = [
        L.conv_bn(x, t1['0'], '0', '1', stride=1, padding=1, act=True,
                  path='transition1.0', **kw),
        _transition_new_branch(t1['1'], x, path='transition1.1', **kw),
    ]

    n_mod, n_br = STAGE_CFG['stage2']
    for m in range(n_mod):
        xs = apply_stage_module(params['stage2'][str(m)], xs, n_br, n_br,
                                path=f'stage2.{m}', **stage_kw)

    # transition2: new branch derives from the lowest branch (hrnet.py:170-174).
    xs = xs + [_transition_new_branch(params['transition2']['2'], xs[-1],
                                      path='transition2.2', **kw)]

    n_mod, n_br = STAGE_CFG['stage3']
    for m in range(n_mod):
        xs = apply_stage_module(params['stage3'][str(m)], xs, n_br, n_br,
                                path=f'stage3.{m}', **stage_kw)

    xs = xs + [_transition_new_branch(params['transition3']['3'], xs[-1],
                                      path='transition3.3', **kw)]

    n_mod, n_br = STAGE_CFG['stage4']
    for m in range(n_mod):
        n_out = 1 if m == n_mod - 1 else n_br
        xs = apply_stage_module(params['stage4'][str(m)], xs, n_br, n_out,
                                path=f'stage4.{m}', **stage_kw)

    # Head: 1x1 conv with bias (hrnet.py:155), computed in at-least-f32
    # (bf16 mixed precision upcasts; f64 parity checks stay f64).
    out = L.conv2d(
        xs[0].astype(jnp.promote_types(xs[0].dtype, jnp.float32)),
        params['final_layer'], stride=1, padding=0)
    return out


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_stage_module(key, n_branches: int, n_out: int, c: int) -> Params:
    keys = iter(jax.random.split(key, 4 * n_branches + n_out * n_branches * 4))
    branches = {}
    for b in range(n_branches):
        w = c * (2 ** b)
        branches[str(b)] = {str(i): L.init_basic_block(next(keys), w, w)
                            for i in range(4)}
    fuse: Params = {}
    for i in range(n_out):
        fi: Params = {}
        for j in range(n_branches):
            ci, cj = c * (2 ** i), c * (2 ** j)
            if i < j:
                fi[str(j)] = {'0': L.init_conv(next(keys), 1, cj, ci),
                              '1': L.init_bn(ci)}
            elif i > j:
                chain = {}
                for k in range(i - j):
                    c_out = cj if k < i - j - 1 else ci
                    chain[str(k)] = {'0': L.init_conv(next(keys), 3, cj, c_out),
                                     '1': L.init_bn(c_out)}
                fi[str(j)] = chain
        fuse[str(i)] = fi
    return {'branches': branches, 'fuse_layers': fuse}


def init(key, c: int = 48, nof_joints: int = 17) -> Params:
    """Fresh HRNet params (torch-default init), matching state_dict layout."""
    keys = iter(jax.random.split(key, 64))
    p: Params = {
        'conv1': L.init_conv(next(keys), 3, 3, 64),
        'bn1': L.init_bn(64),
        'conv2': L.init_conv(next(keys), 3, 64, 64),
        'bn2': L.init_bn(64),
    }
    layer1 = {'0': L.init_bottleneck(next(keys), 64, 64, downsample=True)}
    for i in range(1, 4):
        layer1[str(i)] = L.init_bottleneck(next(keys), 256, 64)
    p['layer1'] = layer1

    p['transition1'] = {
        '0': {'0': L.init_conv(next(keys), 3, 256, c), '1': L.init_bn(c)},
        '1': {'0': {'0': L.init_conv(next(keys), 3, 256, 2 * c),
                    '1': L.init_bn(2 * c)}},
    }
    p['stage2'] = {'0': _init_stage_module(next(keys), 2, 2, c)}
    p['transition2'] = {
        '2': {'0': {'0': L.init_conv(next(keys), 3, 2 * c, 4 * c),
                    '1': L.init_bn(4 * c)}},
    }
    p['stage3'] = {str(m): _init_stage_module(next(keys), 3, 3, c)
                   for m in range(4)}
    p['transition3'] = {
        '3': {'0': {'0': L.init_conv(next(keys), 3, 4 * c, 8 * c),
                    '1': L.init_bn(8 * c)}},
    }
    p['stage4'] = {str(m): _init_stage_module(next(keys), 4, 1 if m == 2 else 4, c)
                   for m in range(3)}
    p['final_layer'] = L.init_conv(next(keys), 1, c, nof_joints, bias=True)
    return p


def pack_fused_chains(folded_params: Params, dtype=jnp.bfloat16,
                      branches=(0,), mode: str = 'auto') -> dict:
    """Pre-pack fast-path chain weights for every stage module.

    Call on FOLDED params (inference). ``branches`` selects which branch
    indices use the fast chain (default: branch 0, the small-channel
    high-res bottleneck — see PERF.md). ``mode``:

      * 'blockdiag' — pure-XLA image-group packing;
      * 'pallas'    — VMEM-resident fused kernel;
      * 'auto'      — 'pallas' exactly when the packed width fills the 128
        MXU lanes (W32 branch0: C=32 x G=4 — measured 1.5x over blockdiag
        there), 'blockdiag' otherwise (at 96 lanes the kernel loses to
        XLA; PERF.md round-2 post-mortem).
    """
    from simple_hrnet_tpu.ops.pallas.fused_block import pack_chain_weights

    chains = {}
    for stage, (n_mod, n_br) in STAGE_CFG.items():
        for m in range(n_mod):
            sp = folded_params[stage][str(m)]
            for b in branches:
                if b >= n_br:
                    continue
                blocks = [sp['branches'][str(b)][str(i)] for i in range(4)]
                c = blocks[0]['conv1']['kernel'].shape[2]
                # pick the group that brings channels near the 128-lane
                # width (W48 branch0: G=2 -> 96ch; W32 branch0: G=4 -> 128ch)
                group = max(1, min(4, 128 // c)) if c < 96 else 1
                if group == 1:
                    continue
                m_eff = mode
                if mode == 'auto':
                    m_eff = 'pallas' if group * c == 128 else 'blockdiag'
                wts, bias = pack_chain_weights(blocks, dtype, group=group)
                chains[f'{stage}.{m}.branches.{b}'] = (m_eff, wts, bias)
    return chains
