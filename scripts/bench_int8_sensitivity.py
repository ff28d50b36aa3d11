#!/usr/bin/env python3
"""Per-stage int8 sensitivity sweep for HRNet-W48 (VERDICT r4 #6).

The scoreboard's headline configs are int8, but real pretrained weights
don't exist in this environment, so the "<1 AP" accuracy expectation is
literature-derived. This sweep builds the repo-local half of the
evidence: quantize ONE stage group at a time (and its complement) and
record the keypoint/heatmap deltas vs the bf16 forward on fixed frames —
identifying which stage is accuracy-hot BEFORE weights arrive, so the
day they land the policy already has a tested knob
(``quantize_folded(policy=...)`` / amax filtering below).

Method: ``quantize_folded`` only rewrites nodes whose id is in the amax
map, so filtering amax by param path gives exact per-stage control with
the production quantizer (models/quantize.py). Forward = plain
``hrnet.apply`` int8 path — the packed serving chains are pinned
numerically equivalent by tests/test_quantize.py
(test_int8_packed_chain_matches_per_conv_quantized).

Deltas are measured against the bf16 forward (the production alternative
— the same comparison validate_goldens.py's int8_delta_report makes).
Usage: python scripts/bench_int8_sensitivity.py  [--frames 8] [--c 48]
Run on the TPU; serialize with other TPU work (CLAUDE.md).
Results: PERF.md "Round 5: int8 per-stage sensitivity".
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.models import quantize as Q
from simple_hrnet_tpu.ops import decode as D

RES = (384, 288)


node_paths = Q.node_paths   # path map shared with the production knob
                            # (SimpleHRNet(int8_exclude=...) -> filter_amax)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--c', type=int, default=48)
    args = ap.parse_args()
    print(f'devices: {jax.devices()}', flush=True)

    from simple_hrnet_tpu.ops import image as I

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=args.c,
                                          nof_joints=17))
    # calibrate exactly like the production facade (api.py _calibration):
    # smooth [0,255] frames through the shared normalize convention
    raw = Q.smooth_frames(RES, n=2, lo=0.0, hi=255.0)
    cal = ((raw.astype(np.float32) - I.MEAN255) * I.INV255_STD)
    amax = Q.calibrate_cpu(lambda p, v: hrnet.apply(p, v), params, [cal])
    paths = node_paths(params)
    quantizable = {i: p for i, p in paths.items()
                   if i in amax
                   and Q.default_policy(_kernel_shape(params, p))}

    groups = sorted({p.split('.')[0] for p in quantizable.values()})
    print(f'quantizable nodes: {len(quantizable)} in groups {groups} '
          f'(policy-rejected: {len(paths) - len(quantizable)})', flush=True)

    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (args.frames, *RES, 3)).astype(np.float32)
    frames = jnp.asarray((u8 - I.MEAN255) * I.INV255_STD)

    fwd = jax.jit(lambda p, v: hrnet.apply(p, v, dtype=jnp.bfloat16))
    J = jax.tree_util.tree_map

    def run(p):
        hm = np.asarray(fwd(J(jnp.asarray, p), frames), np.float32)
        pts, conf = D.get_max_preds(hm)
        return hm, np.asarray(pts), np.asarray(conf)

    hm_b, pts_b, conf_b = run(params)

    def delta(name, ids):
        sub = {i: a for i, a in amax.items() if i in ids}
        qp = Q.quantize_folded(params, sub)
        nq = len([i for i in ids if i in quantizable])
        hm, pts, conf = run(qp)
        px = np.abs(pts - pts_b) * 4.0        # heatmap res -> input px
        rel = float(np.abs(hm - hm_b).max() /
                    (np.abs(hm_b).max() + 1e-12))
        row = {'config': name, 'nodes_int8': nq,
               'kp_px_max': float(px.max()), 'kp_px_mean': float(px.mean()),
               'kp_moved_pct': float((px.max(-1) > 0).mean() * 100),
               'conf_dev_max': float(np.abs(conf - conf_b).max()),
               'hm_rel_max': rel}
        print(json.dumps(row), flush=True)
        return row

    rows = [delta('ALL int8 (production)', set(quantizable))]
    for g in groups:
        gids = {i for i, p in quantizable.items() if p.split('.')[0] == g}
        rows.append(delta(f'only {g}', gids))
    for g in groups:
        gids = {i for i, p in quantizable.items() if p.split('.')[0] != g}
        rows.append(delta(f'all but {g}', gids))

    worst = max(rows[1:1 + len(groups)], key=lambda r: r['kp_px_max'])
    print(f"\nworst single stage: {worst['config']} "
          f"(kp_px_max {worst['kp_px_max']:.2f})", flush=True)


def _kernel_shape(params, dotted):
    node = params
    for k in dotted.split('.'):
        node = node[k]
    return node['kernel'].shape


if __name__ == '__main__':
    main()
