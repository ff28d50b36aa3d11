#!/usr/bin/env python3
"""Backward-pass ceiling analysis for the W48 train step (VERDICT r3 #4).

The round-3 breakdown showed backward = 64% of the step (34.3 ms of 53.2
grouped-b16) but never looked inside it. This script does, in three parts:

  A. step-level split: fwd / +dgrad-chain / +wgrads, for the plain and
     grouped-trunk paths.  dgrad = grad wrt the IMAGE (runs the full
     cotangent chain but no weight gradients); wgrad = grad wrt params
     minus that.
  B. per-conv-family standalone timings: forward, dgrad, wgrad at every
     dominant conv shape of the W48-384x288 b16 graph, with achieved
     TF/s vs the lane-utilization MXU ceiling for each contraction
     (v5e bf16 peak 197 TF/s; a conv wgrad's output lane dim is Cout,
     so Cout/128 caps utilization the same way K=N=96 caps the forward).
  C. wgrad formulations at the grouped branch-0 shape (the one the
     grouped trunk made 2x redundant): native autodiff through the
     block-diagonal kernel vs the plain ungrouped wgrad vs a manual
     taps-on-lanes matmul — the candidates VERDICT r3 #4 lists.

Reference being accelerated: /root/reference/training/COCO.py:136-144.
Usage: python scripts/bench_backward.py [--parts ABC] [--batch 16]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.train import losses
from simple_hrnet_tpu.utils.profiling import device_timer

PEAK_BF16 = 197e12  # v5e MXU, bf16


def _conv(x, k, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _treesum(*trees):
    acc = jnp.float32(0)
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
    return acc


# ---------------------------------------------------------------- part A

def part_a(batch):
    rng = np.random.default_rng(0)
    params = hrnet.init(jax.random.PRNGKey(0), c=48, nof_joints=17)
    img = jnp.asarray(rng.standard_normal((batch, 384, 288, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((batch, 96, 72, 17)), jnp.float32)
    tw = jnp.ones((batch, 17, 1), jnp.float32)
    T = dict(iters_lo=2, iters_hi=22, repeats=3)

    from simple_hrnet_tpu.train import grouped as G
    for name, apply_fn in (('plain', hrnet.apply), ('grouped', G.make_apply(2))):
        def loss_of(p, im):
            stats = {}
            out = apply_fn(p, im, train=True, stats=stats, dtype=jnp.bfloat16)
            return losses.joints_mse_loss(out.astype(jnp.float32), tgt, tw)

        def fwd(im, p):
            return loss_of(p, im)

        def dgrad(im, p):
            return _treesum(jax.grad(lambda i: loss_of(p, i))(im))

        def wgrad(im, p):
            return _treesum(jax.grad(lambda pp: loss_of(pp, im))(p))

        t_f = device_timer(fwd, img, params, **T)
        t_dx = device_timer(dgrad, img, params, **T)
        t_dp = device_timer(wgrad, img, params, **T)
        print(f'[A] {name:8s} b{batch}: fwd {t_f*1e3:6.2f} ms | '
              f'dgrad-chain {(t_dx-t_f)*1e3:6.2f} | '
              f'wgrads {(t_dp-t_dx)*1e3:6.2f} | '
              f'full bwd {(t_dp-t_f)*1e3:6.2f} '
              f'(grad-step {t_dp*1e3:6.2f} ms)', flush=True)


# ---------------------------------------------------------------- part B

# (name, x-shape NHWC, Cout, ksize, stride, count-in-graph)
# counts: stage2 = 1 module, stage3 = 4, stage4 = 3; 4 blocks x 2 convs
# per branch per module; branch b exists in modules of its stage onwards.
FAMILIES = [
    # grouped branch-0 chain conv as the grouped trunk actually runs it
    ('br0-g2', (8, 96, 72, 96), 96, 3, 1, 64),
    # its ungrouped equivalent (what the plain path runs)
    ('br0', (16, 96, 72, 48), 48, 3, 1, 64),
    ('br1', (16, 48, 36, 96), 96, 3, 1, 64),
    ('br2', (16, 24, 18, 192), 192, 3, 1, 56),
    ('br3', (16, 12, 9, 384), 384, 3, 1, 24),
    ('stem2', (16, 192, 144, 64), 64, 3, 2, 1),
    ('l1-3x3', (16, 96, 72, 64), 64, 3, 1, 4),
    ('l1-1x1', (16, 96, 72, 64), 256, 1, 1, 5),
    # fuse 1x1s, grouped shapes (i=0 row: j=1 x8, j=2 x7, j=3 x3)
    ('fuse01-g2', (8, 48, 36, 192), 96, 1, 1, 8),
    ('fuse02-g2', (8, 24, 18, 384), 96, 1, 1, 7),
    # down-fuse 3x3 s2 (i>j), grouped, the j->j+1 first hops
    ('fdown-g2', (8, 96, 72, 96), 96, 3, 2, 8),
]


def part_b(batch):
    if batch != 16:
        print('[B] shapes are tabulated for b16; skipping at other batches')
        return
    rng = np.random.default_rng(1)
    # sub-100us kernels: the chained-timing delta must clear the relay's
    # wall-clock jitter (~ms) -> hundreds of chained iterations (PERF.md)
    T = dict(iters_lo=20, iters_hi=520, repeats=3)
    print(f'[B] per-conv-family standalone (bf16, ms per single conv; '
          f'TF/s vs lane-ceiling of {PEAK_BF16/1e12:.0f} TF/s peak)')
    print(f'{"family":10s} {"cnt":>3s} | {"fwd ms":>7s} {"TF/s":>6s} | '
          f'{"dgrad":>7s} {"TF/s":>6s} | {"wgrad":>7s} {"TF/s":>6s} | '
          f'{"lane-ceil":>9s}')
    tot = {'fwd': 0.0, 'dgrad': 0.0, 'wgrad': 0.0}
    for name, xs, co, ks, st, count in FAMILIES:
        b, h, w, ci = xs
        x = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((ks, ks, ci, co)) * 0.05,
                        jnp.bfloat16)
        pad = (ks - 1) // 2
        oh, ow = (h + st - 1) // st, (w + st - 1) // st
        dy = jnp.asarray(rng.standard_normal((b, oh, ow, co)), jnp.bfloat16)
        flops = 2 * b * oh * ow * ks * ks * ci * co

        conv = functools.partial(_conv, stride=st, padding=pad)

        def fwd(xx, kk):
            return conv(xx, kk)

        def dgrad(dyy, xx, kk):
            # vjp wrt x: residual is k only (conv linear in x) -> the
            # timed graph is the dgrad conv alone, fwd is DCE'd
            return jax.vjp(lambda v: conv(v, kk), xx)[1](dyy)[0]

        def wgrad(dyy, xx, kk):
            return jax.vjp(lambda v: conv(xx, v), kk)[1](dyy)[0]

        t_f = device_timer(fwd, x, k, **T)
        t_dx = device_timer(dgrad, dy, x, k, **T)
        t_dk = device_timer(wgrad, dy, x, k, **T)
        # lane-utilization ceiling: fwd/dgrad lanes = Cout/Cin, wgrad
        # lanes = Cout; each also capped by the K=... contraction depth,
        # but K is large everywhere here, so lanes dominate.
        ceil = min(co, 128) / 128
        tot['fwd'] += t_f * count
        tot['dgrad'] += t_dx * count
        tot['wgrad'] += t_dk * count
        print(f'{name:10s} {count:3d} | {t_f*1e3:7.3f} {flops/t_f/1e12:6.1f} '
              f'| {t_dx*1e3:7.3f} {flops/t_dx/1e12:6.1f} '
              f'| {t_dk*1e3:7.3f} {flops/t_dk/1e12:6.1f} '
              f'| {ceil*PEAK_BF16/1e12:6.0f} TF/s', flush=True)
    print(f'[B] count-weighted totals: fwd {tot["fwd"]*1e3:.2f} ms, '
          f'dgrad {tot["dgrad"]*1e3:.2f} ms, wgrad {tot["wgrad"]*1e3:.2f} ms')


# ---------------------------------------------------------------- part C

def _wgrad_taps_lanes(x, dy, ks=3):
    """Manual wgrad: one matmul with the 9 input taps CONCATENATED ON THE
    LANE DIM of the output (N = ks*ks*Ci after the oi->io transpose), so
    the MXU contraction's lane dim is 9*Ci instead of Cout.

    wgrad[kh,kw,i,o] = sum_{b,y,x} X[b, y+kh-p, x+kw-p, i] * dY[b,y,x,o]
    """
    b, h, w, ci = x.shape
    p = (ks - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    taps = [xp[:, i:i + h, j:j + w, :] for i in range(ks) for j in range(ks)]
    xt = jnp.concatenate(taps, axis=-1)                    # (B,H,W,9Ci)
    wt = jnp.einsum('bhwo,bhwt->ot', dy, xt,
                    preferred_element_type=jnp.float32)    # (Co, 9Ci)
    co = dy.shape[-1]
    return wt.reshape(co, ks * ks, ci).transpose(1, 2, 0) \
             .reshape(ks, ks, ci, co).astype(x.dtype)


def _wgrad_taps_9dots(x, dy, ks=3):
    """Manual wgrad: ks*ks separate (Ci x Co) matmuls reading shifted
    slices of the padded input directly (no taps buffer)."""
    b, h, w, ci = x.shape
    p = (ks - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    rows = []
    for i in range(ks):
        for j in range(ks):
            xs = xp[:, i:i + h, j:j + w, :]
            rows.append(jnp.einsum('bhwi,bhwo->io', xs, dy,
                                   preferred_element_type=jnp.float32))
    return jnp.stack(rows).reshape(ks, ks, ci, dy.shape[-1]).astype(x.dtype)


def part_c():
    rng = np.random.default_rng(2)
    T = dict(iters_lo=20, iters_hi=420, repeats=3)
    ci = co = 48
    x = jnp.asarray(rng.standard_normal((16, 96, 72, ci)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((16, 96, 72, co)), jnp.bfloat16)

    # correctness first (f32, small tolerance: same arithmetic reordered)
    xf, dyf, kf = x.astype(jnp.float32), dy.astype(jnp.float32), \
        k.astype(jnp.float32)
    ref = jax.vjp(lambda v: _conv(xf, v), kf)[1](dyf)[0]
    for nm, fn in (('taps-lanes', _wgrad_taps_lanes),
                   ('taps-9dots', _wgrad_taps_9dots)):
        got = fn(xf, dyf)
        err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        print(f'[C] {nm} rel err vs autodiff wgrad: {err:.2e}')
        assert err < 1e-3, (nm, err)

    # grouped tensors (what the grouped trunk's backward actually sees)
    xg = jnp.concatenate([x[:8], x[8:]], axis=-1)     # (8,96,72,96)
    dyg = jnp.concatenate([dy[:8], dy[8:]], axis=-1)  # (8,96,72,96)

    def w_native(dyy, xx, kk):
        return jax.vjp(lambda v: _conv(xx, v), kk)[1](dyy)[0]

    def w_native_bd(dyy, xx, kk):
        # autodiff through the in-graph blockdiag build — the cost the
        # grouped trunk pays today: dense (96->96) wgrad + diagonal reduce
        from simple_hrnet_tpu.train.grouped import _bd
        return jax.vjp(lambda v: _conv(xx, _bd(v, 2)), kk)[1](dyy)[0]

    def w_lanes(dyy, xx):
        return _wgrad_taps_lanes(xx, dyy)

    def w_9dots(dyy, xx):
        return _wgrad_taps_9dots(xx, dyy)

    def w_lanes_g(dyy, xx):
        # grouped inputs, ungroup back to batch first (2 lane-slices)
        xu = jnp.concatenate([xx[..., :ci], xx[..., ci:]], axis=0)
        du = jnp.concatenate([dyy[..., :co], dyy[..., co:]], axis=0)
        return _wgrad_taps_lanes(xu, du)

    rows = [
        ('native wgrad, ungrouped (16,...,48)->48',
         device_timer(w_native, dy, x, k, **T)),
        ('native wgrad, blockdiag (8,...,96)->96 + diag-reduce',
         device_timer(w_native_bd, dyg, xg, k, **T)),
        ('taps-on-lanes matmul, ungrouped',
         device_timer(w_lanes, dy, x, **T)),
        ('taps-on-lanes matmul, from grouped tensors',
         device_timer(w_lanes_g, dyg, xg, **T)),
        ('9 separate tap dots, ungrouped',
         device_timer(w_9dots, dy, x, **T)),
    ]
    print('[C] branch-0 wgrad formulations (one conv, b16-equivalent):')
    for nm, t in rows:
        print(f'    {nm:52s} {t*1e3:7.3f} ms', flush=True)


# ---------------------------------------------------------------- part D

def part_d():
    """Isolate what the dgrad chain spends beyond the dgrad convs: run the
    grouped branch-0 4-BasicBlock chain fwd and grad-wrt-x under (i)
    train-mode BN (batch moments, the train step's graph), (ii) eval BN
    (running stats, no moment reductions), (iii) no BN at all."""
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.train.grouped import _basic_block_g

    rng = np.random.default_rng(3)
    group, c = 2, 48
    x = jnp.asarray(rng.standard_normal((8, 96, 72, group * c)), jnp.bfloat16)

    def block_params(key):
        k1, k2 = jax.random.split(key)
        mk = lambda k: {'kernel': 0.05 * jax.random.normal(
            k, (3, 3, c, c), jnp.float32)}
        bn = lambda: {'scale': jnp.ones(c), 'bias': jnp.zeros(c),
                      'mean': jnp.zeros(c), 'var': jnp.ones(c)}
        return {'conv1': mk(k1), 'bn1': bn(), 'conv2': mk(k2), 'bn2': bn()}

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {str(i): block_params(keys[i]) for i in range(4)}

    def chain(xx, p, train, use_bn=True):
        h = xx
        for i in range(4):
            bp = dict(p[str(i)])
            if not use_bn:
                bp.pop('bn1'), bp.pop('bn2')
            h = _basic_block_g(bp, h, group, path=f'b{i}', train=train,
                               stats={} if train else None, dtype=jnp.bfloat16)
        return h

    T = dict(iters_lo=10, iters_hi=210, repeats=3)
    print('[D] grouped branch-0 4-block chain (8,96,72,96), bf16:')
    for nm, tr, bn in (('train-BN', True, True), ('eval-BN', False, True),
                       ('no-BN', False, False)):
        def fwd(xx, p):
            return chain(xx, p, tr, bn)

        def dchain(xx, p):
            return jax.grad(lambda v: jnp.sum(
                chain(v, p, tr, bn).astype(jnp.float32)))(xx)

        t_f = device_timer(fwd, x, params, **T)
        t_d = device_timer(dchain, x, params, **T)
        print(f'    {nm:9s} fwd {t_f*1e3:6.3f} ms | fwd+dgrad-chain '
              f'{t_d*1e3:6.3f} | dgrad-chain alone {(t_d-t_f)*1e3:6.3f}',
              flush=True)


# ---------------------------------------------------------------- part E

def _adam_bf16(lr, b1=0.9, b2=0.999, eps=1e-8):
    """optax.adam's exact per-element math with BOTH moments stored bf16
    (f32 compute, bf16 storage) — halves the optimizer's HBM traffic."""
    import optax

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=jnp.bfloat16)
        return {'count': jnp.zeros([], jnp.int32),
                'mu': jax.tree_util.tree_map(z, params),
                'nu': jax.tree_util.tree_map(z, params)}

    def update(grads, state, params=None):
        del params
        c = state['count'] + 1
        cf = c.astype(jnp.float32)
        bc1 = 1 - jnp.float32(b1) ** cf
        bc2 = 1 - jnp.float32(b2) ** cf

        def upd(g, m, v):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * g32 * g32
            u = -lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return u, m32.astype(jnp.bfloat16), v32.astype(jnp.bfloat16)

        out = jax.tree_util.tree_map(upd, grads, state['mu'], state['nu'])
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
        return pick(0), {'count': c, 'mu': pick(1), 'nu': pick(2)}

    return optax.GradientTransformation(init, update)


def part_e(batch, e1=True, e2=True):
    """In-graph overhead isolation on the production grouped step."""
    import optax
    from simple_hrnet_tpu.train import grouped as G
    from simple_hrnet_tpu.train import losses, steps

    rng = np.random.default_rng(4)
    params = hrnet.init(jax.random.PRNGKey(0), c=48, nof_joints=17)
    img = jnp.asarray(rng.standard_normal((batch, 384, 288, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((batch, 96, 72, 17)), jnp.float32)
    tw = jnp.ones((batch, 17, 1), jnp.float32)
    apply_fn = G.make_apply(2)
    T = dict(iters_lo=2, iters_hi=22, repeats=3)

    # --- E1: grad-step variants (no optimizer): stats / BN mode / loss
    def grad_step(train, stats_on, mse):
        def loss_of(p, im):
            stats = {} if stats_on else None
            out = apply_fn(p, im, train=train, stats=stats,
                           dtype=jnp.bfloat16).astype(jnp.float32)
            loss = (losses.joints_mse_loss(out, tgt, tw) if mse
                    else jnp.mean(jnp.square(out)))
            # stats must be a live output or XLA DCEs their reductions
            return loss, stats or {}

        def f(im, p):
            (l, stats), g = jax.value_and_grad(
                lambda pp: loss_of(pp, im), has_aux=True)(p)
            return l, stats, g
        return f

    if e1:
        for name, kw in (('baseline (train-BN, stats, MSE)',
                          dict(train=True, stats_on=True, mse=True)),
                         ('no stat recording',
                          dict(train=True, stats_on=False, mse=True)),
                         ('eval-BN (no batch moments)',
                          dict(train=False, stats_on=False, mse=True)),
                         ('trivial loss (mean sq)',
                          dict(train=True, stats_on=True, mse=False))):
            t = device_timer(grad_step(**kw), img, params, **T)
            print(f'[E1] {name:32s} {t*1e3:6.2f} ms', flush=True)
    if not e2:
        return

    # --- E2: full step, optimizer variants (donate off: timer reuses args)
    loss_fn = losses.joints_mse_loss
    batch_d = {'target': tgt, 'target_weight': tw}
    for name, opt in (('optax.adam f32 moments', optax.adam(1e-3)),
                      ('optax.adam mu_dtype=bf16',
                       optax.adam(1e-3, mu_dtype=jnp.bfloat16)),
                      ('fused adam, bf16 mu+nu', _adam_bf16(1e-3))):
        step = steps.make_train_step(apply_fn, loss_fn, opt, donate=False,
                                     dtype='bfloat16')
        os0 = opt.init(params)

        def f(im, p, os_):
            return step(p, os_, dict(batch_d, image=im))
        t = device_timer(f, img, params, os0, **T)
        print(f'[E2] {name:32s} {t*1e3:6.2f} ms '
              f'({batch/t:6.1f} img/s)', flush=True)


# ---------------------------------------------------------------- part F

def part_f(batch):
    """Is grouping layer1's 3x3 (64->64 @96x72) worth its boundaries?
    Grouped G=2 runs (B/2,96,72,128) at full 128 lanes with 2x MACs; the
    dgrad measured only 42 TF/s ungrouped (part B) so the 2x may pay."""
    rng = np.random.default_rng(5)
    T = dict(iters_lo=20, iters_hi=520, repeats=3)
    x = jnp.asarray(rng.standard_normal((batch, 96, 72, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((batch, 96, 72, 64)), jnp.bfloat16)
    from simple_hrnet_tpu.train.grouped import _bd

    conv = functools.partial(_conv, stride=1, padding=1)

    def plain_all(dyy, xx, kk):
        y, vjp = jax.vjp(lambda v, w: conv(v, w), xx, kk)
        dx, dk = vjp(dyy)
        return y, dx, dk

    def grouped_all(dyy, xx, kk):
        # boundaries included: group x and dy, ungroup y and dx
        h = xx.shape[0] // 2
        xg = jnp.concatenate([xx[:h], xx[h:]], axis=-1)
        dg = jnp.concatenate([dyy[:h], dyy[h:]], axis=-1)

        def fwd(v, w):
            return conv(v, _bd(w, 2))
        yg, vjp = jax.vjp(fwd, xg, kk)
        dxg, dk = vjp(dg)
        y = jnp.concatenate([yg[..., :64], yg[..., 64:]], axis=0)
        dx = jnp.concatenate([dxg[..., :64], dxg[..., 64:]], axis=0)
        return y, dx, dk

    t_p = device_timer(plain_all, dy, x, k, **T)
    t_g = device_timer(grouped_all, dy, x, k, **T)
    print(f'[F] l1-3x3 fwd+dgrad+wgrad plain   {t_p*1e3:6.3f} ms')
    print(f'[F] l1-3x3 fwd+dgrad+wgrad grouped {t_g*1e3:6.3f} ms '
          f'({t_p/t_g:4.2f}x)', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--parts', default='ABCD')
    ap.add_argument('--batch', type=int, default=16)
    args = ap.parse_args()
    print(f'devices: {jax.devices()}', flush=True)
    if 'B' in args.parts:
        part_b(args.batch)
    if 'C' in args.parts:
        part_c()
    if 'D' in args.parts:
        part_d()
    if 'A' in args.parts:
        part_a(args.batch)
    if 'E' in args.parts:
        part_e(args.batch, e1=True, e2='O' not in args.parts)
    if 'O' in args.parts:  # the E2 optimizer variants alone
        part_e(args.batch, e1=False, e2=True)
    if 'F' in args.parts:
        part_f(args.batch)


if __name__ == '__main__':
    main()
