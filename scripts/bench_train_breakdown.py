#!/usr/bin/env python3
"""Stage-level breakdown of the W48 train step (VERDICT r2 item #6).

Times, with chained on-chip measurement (PERF.md rules), nested prefixes
of the fused train step so differences isolate each bucket:

    fwd      = forward (train-mode BN) + loss
    bwd      = value_and_grad - fwd
    opt      = adam update + apply  - grad
    bnstats  = running-stat update  - opt

Usage: python scripts/bench_train_breakdown.py [--c 48] [--res 384,288]
       [--batches 16,32] [--dtype bf16] [--grouped]

``--grouped`` times the grouped-trunk training step (train/grouped.py)
instead of the plain one.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.train import losses
from simple_hrnet_tpu.train import steps as S
from simple_hrnet_tpu.utils.profiling import device_timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--c', type=int, default=48)
    ap.add_argument('--res', default='384,288')
    ap.add_argument('--batches', default='16')
    ap.add_argument('--dtype', default='bf16')
    ap.add_argument('--grouped', action='store_true')
    args = ap.parse_args()
    res = tuple(int(v) for v in args.res.split(','))
    dtype = jnp.bfloat16 if args.dtype in ('bf16', 'bfloat16') else None

    rng = np.random.default_rng(0)
    params = hrnet.init(jax.random.PRNGKey(0), c=args.c, nof_joints=17)
    if args.grouped:
        from simple_hrnet_tpu.train import grouped as G
        apply_fn = G.make_apply(group=min(4, max(2, 128 // args.c)))
    else:
        apply_fn = hrnet.apply
    loss_fn = losses.joints_mse_loss
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    kw = {'dtype': dtype} if dtype is not None else {}

    def _treesum(*trees):
        # reduce EVERY output into the timed scalar: anything not feeding
        # the chain is dead code XLA deletes (a first version reported a
        # 0.4 ms "backward" because only the loss leaf stayed alive). One
        # f32 pass over ~63M elements ~0.3 ms, identical across variants.
        acc = jnp.float32(0)
        for t in trees:
            for leaf in jax.tree_util.tree_leaves(t):
                acc = acc + jnp.sum(leaf.astype(jnp.float32)) * 1e-6
        return acc

    def fwd(img, p, tgt, tw):
        stats = {}
        out = apply_fn(p, img, train=True, stats=stats, **kw)
        return loss_fn(out.astype(jnp.float32), tgt, tw)

    def grad(img, p, tgt, tw):
        def loss_of(pp):
            stats = {}
            out = apply_fn(pp, img, train=True, stats=stats, **kw)
            return loss_fn(out.astype(jnp.float32), tgt, tw), stats
        (l, _), g = jax.value_and_grad(loss_of, has_aux=True)(p)
        return l + _treesum(g)

    def grad_opt(img, p, os_, tgt, tw):
        def loss_of(pp):
            stats = {}
            out = apply_fn(pp, img, train=True, stats=stats, **kw)
            return loss_fn(out.astype(jnp.float32), tgt, tw), stats
        (l, _), g = jax.value_and_grad(loss_of, has_aux=True)(p)
        updates, os2 = opt.update(g, os_, p)
        return l + _treesum(optax.apply_updates(p, updates), os2)

    def full(img, p, os_, tgt, tw):
        def loss_of(pp):
            stats = {}
            out = apply_fn(pp, img, train=True, stats=stats, **kw)
            return (loss_fn(out.astype(jnp.float32), tgt, tw), stats)
        (l, stats), g = jax.value_and_grad(loss_of, has_aux=True)(p)
        updates, os2 = opt.update(g, os_, p)
        p2 = optax.apply_updates(p, updates)
        p2 = L.update_running_stats(p2, stats)
        return l + _treesum(p2, os2)

    T = dict(iters_lo=2, iters_hi=22, repeats=3)
    for b in (int(v) for v in args.batches.split(',')):
        img = jnp.asarray(rng.standard_normal((b, *res, 3)), jnp.float32)
        tgt = jnp.asarray(rng.standard_normal(
            (b, res[0] // 4, res[1] // 4, 17)), jnp.float32)
        tw = jnp.ones((b, 17, 1), jnp.float32)

        t_fwd = device_timer(fwd, img, params, tgt, tw, **T)
        t_grad = device_timer(grad, img, params, tgt, tw, **T)
        t_gopt = device_timer(grad_opt, img, params, opt_state, tgt, tw, **T)
        t_full = device_timer(full, img, params, opt_state, tgt, tw, **T)
        name = 'grouped' if args.grouped else 'plain'
        print(f'W{args.c} {res[0]}x{res[1]} b{b} {args.dtype} [{name}]:')
        print(f'  fwd+loss      {t_fwd*1e3:7.2f} ms')
        print(f'  bwd           {(t_grad-t_fwd)*1e3:7.2f} ms')
        print(f'  optimizer     {(t_gopt-t_grad)*1e3:7.2f} ms')
        print(f'  bn running    {(t_full-t_gopt)*1e3:7.2f} ms')
        print(f'  FULL STEP     {t_full*1e3:7.2f} ms  '
              f'({b/t_full:6.1f} img/s)', flush=True)


if __name__ == '__main__':
    main()
