#!/usr/bin/env python3
"""Producer-fused space-to-depth for the 3-channel stem convs (round 4).

bench_darknet_layers.py: YOLOv3's conv0 (416^2, 3->32 s1) is 1.84 ms of
the 5.73 ms b8 int8 detector forward — 32%. The round-3 stem post-mortem
(bench_stem/stem2) showed the s2d conv itself is 3.2x faster but EVERY
in-graph relayout of an existing tensor loses (6-D transpose 0.55x,
strided slices 0.29x). New angle: the conv's PRODUCER is already a pair
of dense resize matmuls (matmul letterbox / PIL matmul crops), and a
matmul can emit the phase layout for free — reorder the static weight
matrix's rows into [even; odd] blocks, slice the two contiguous halves,
and lane-concat once.

Exact kernel transforms (zero-pad-preserving, derived in comments):
  s1 3x3 pad1 conv at full res == 3x3 pad1 conv on the (h/2,w/2,4c)
     phase tensor with a (3,3,4ci,4co) kernel (output stays in phase
     space — 4x MACs from the zero structure, but 4*co output lanes).
  s2 3x3 pad1 conv == 2x2 conv, padding ((1,0),(1,0)), kernel
     (2,2,4ci,co) — output is the STANDARD layout (exits phase space),
     16/9 MACs.

Variants (detector case, b8 640x480 -> letterbox 416 -> conv0+down1):
  V0  baseline: resize_linear + grey pad + conv0(3x3,3->32) + leaky
      + down1(3x3 s2,32->64) + leaky
  V1  phase producer: blocked-row resize matmuls -> (156,208,12) phases
      + grey pad -> conv0'(3x3,12->128) + leaky -> down1'(2x2,128->64)
      + leaky
  V2  naive: V0's letterboxed tensor -> strided-slice s2d -> conv0' ...
      (isolates the producer-fusion gain vs in-graph relayout)

Pose-stem case (P0/P1): crop-resize (300,200)->(384,288) + normalize +
conv1(3x3 s2,3->64) + relu + conv2(3x3 s2,64->64) + relu, vs the phase
producer feeding conv1'(2x2,12->64).

Usage: python scripts/bench_s2d_producer.py [--parts DP] [--batch 8]
Serialize with other TPU benchmarks.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.ops import image as I
from simple_hrnet_tpu.utils.profiling import device_timer

GREY = 114.0 / 255.0


def s2d_kernel_s1(k: np.ndarray) -> np.ndarray:
    """(3,3,ci,co) stride-1 pad-1 kernel -> (3,3,4ci,4co) phase-space
    kernel (phase channel order (a,b,c) / (alpha,beta,o)).

    O[2Y+al, 2X+be] = sum_{dy,dx} I[2Y+al+dy-1, 2X+be+dx-1] K[dy,dx];
    al+dy-1 = 2s+a with s=floor/2 in {-1,0,1} -> 3-tap support, and
    pad-1 in phase space reproduces the full-res zero pad exactly
    (row v=-1 -> phase row -1 (a=1); v=2H'-... -> phase row H', both
    zero-padded; v=-2 / v=2H'+1 are never addressed)."""
    kh, kw, ci, co = k.shape
    assert kh == 3 and kw == 3
    kp = np.zeros((3, 3, 4 * ci, 4 * co), k.dtype)
    for al in range(2):
        for be in range(2):
            for dy in range(3):
                for dx in range(3):
                    s, a = divmod(al + dy - 1, 2)
                    t, b = divmod(be + dx - 1, 2)
                    kp[s + 1, t + 1,
                       (a * 2 + b) * ci:(a * 2 + b + 1) * ci,
                       (al * 2 + be) * co:(al * 2 + be + 1) * co] = k[dy, dx]
    return kp


def s2d_kernel_s2(k: np.ndarray) -> np.ndarray:
    """(3,3,ci,co) stride-2 pad-1 kernel -> (2,2,4ci,co) phase-space
    stride-1 kernel, to be used with padding ((1,0),(1,0)).

    O[Y,X] = sum I[2Y+dy-1, 2X+dx-1] K[dy,dx]; dy-1 = 2s+a with
    s in {-1,0} -> 2-tap support, top/left pad only. Output is the
    standard (H/2,W/2,co) layout — exits phase space."""
    kh, kw, ci, co = k.shape
    assert kh == 3 and kw == 3
    kp = np.zeros((2, 2, 4 * ci, co), k.dtype)
    for dy in range(3):
        for dx in range(3):
            s, a = divmod(dy - 1, 2)
            t, b = divmod(dx - 1, 2)
            kp[s + 1, t + 1, (a * 2 + b) * ci:(a * 2 + b + 1) * ci] = k[dy, dx]
    return kp


def phase_resize(frames, wy: np.ndarray, wx: np.ndarray):
    """Resize via blocked-row matmuls, emitting the (H/2, W/2, 4c) phase
    tensor: two contiguous half-slices + one lane concat, no strided
    relayout. Channel order (a, b, c)."""
    oh, ow = wy.shape[0], wx.shape[0]
    h2, w2 = oh // 2, ow // 2
    wyb = jnp.asarray(np.concatenate([wy[0::2], wy[1::2]]))
    wxb = jnp.asarray(np.concatenate([wx[0::2], wx[1::2]]))
    t = jnp.einsum('Qh,bhwc->bQwc', wyb, frames)
    u = jnp.einsum('Pw,bqwc->bqPc', wxb, t)
    parts = [u[:, a * h2:(a + 1) * h2, b * w2:(b + 1) * w2]
             for a in (0, 1) for b in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def naive_s2d(x):
    """(b,H,W,c) -> (b,H/2,W/2,4c) via strided slices (the round-3 loser)."""
    return jnp.concatenate([x[:, a::2, b::2] for a in (0, 1) for b in (0, 1)],
                           axis=-1)


def conv(x, k, stride=1, padding=1):
    pad = padding if isinstance(padding, (list, tuple)) else \
        [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def part_d(batch, f32_check=True):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.random((batch, 480, 640, 3)), jnp.float32)
    k0 = rng.standard_normal((3, 3, 3, 32)).astype(np.float32) * 0.2
    k1 = rng.standard_normal((3, 3, 32, 64)).astype(np.float32) * 0.05
    wy = I._linear_weights(480, 312)
    wx = I._linear_weights(640, 416)
    k0p, k1p = s2d_kernel_s1(k0), s2d_kernel_s2(k1)

    def v0(f, dt):
        y = jnp.einsum('oh,bhwc->bowc', jnp.asarray(wy), f)
        y = jnp.einsum('pw,bhwc->bhpc', jnp.asarray(wx), y)
        y = jnp.pad(y, ((0, 0), (0, 104), (0, 0), (0, 0)),
                    constant_values=GREY).astype(dt)
        y = jax.nn.leaky_relu(conv(y, jnp.asarray(k0, dt)), 0.1)
        return jax.nn.leaky_relu(conv(y, jnp.asarray(k1, dt), stride=2), 0.1)

    def v1(f, dt):
        p = phase_resize(f, wy, wx)
        p = jnp.pad(p, ((0, 0), (0, 52), (0, 0), (0, 0)),
                    constant_values=GREY).astype(dt)
        p = jax.nn.leaky_relu(conv(p, jnp.asarray(k0p, dt)), 0.1)
        return jax.nn.leaky_relu(
            conv(p, jnp.asarray(k1p, dt), padding=[(1, 0), (1, 0)]), 0.1)

    def v2(f, dt):
        y = jnp.einsum('oh,bhwc->bowc', jnp.asarray(wy), f)
        y = jnp.einsum('pw,bhwc->bhpc', jnp.asarray(wx), y)
        y = jnp.pad(y, ((0, 0), (0, 104), (0, 0), (0, 0)),
                    constant_values=GREY)
        p = naive_s2d(y).astype(dt)
        p = jax.nn.leaky_relu(conv(p, jnp.asarray(k0p, dt)), 0.1)
        return jax.nn.leaky_relu(
            conv(p, jnp.asarray(k1p, dt), padding=[(1, 0), (1, 0)]), 0.1)

    if f32_check:
        # TPU's default f32 matmul precision is bf16x3-ish (~7e-5 rel on
        # this chain); pin `highest` for the parity check only.
        with jax.default_matmul_precision('highest'):
            a = np.asarray(v0(frames[:2], jnp.float32))
            b = np.asarray(v1(frames[:2], jnp.float32))
            c = np.asarray(v2(frames[:2], jnp.float32))
        err1 = np.max(np.abs(b - a)) / np.max(np.abs(a))
        err2 = np.max(np.abs(c - a)) / np.max(np.abs(a))
        print(f'[D] f32 parity: V1 vs V0 rel {err1:.2e}, V2 vs V0 {err2:.2e}',
              flush=True)
        assert err1 < 1e-5 and err2 < 1e-5

    T = dict(iters_lo=10, iters_hi=110, repeats=3)
    for name, fn in (('V0 full-res letterbox+conv0+down1', v0),
                     ('V1 phase-producer s2d', v1),
                     ('V2 naive strided-slice s2d', v2)):
        t = device_timer(lambda f, fn=fn: fn(f, jnp.bfloat16), frames, **T)
        print(f'[D] {name:36s} {t*1e3:7.3f} ms', flush=True)


def part_p(batch, f32_check=True):
    rng = np.random.default_rng(1)
    crops = jnp.asarray(rng.random((batch, 300, 200, 3)), jnp.float32)
    k1 = rng.standard_normal((3, 3, 3, 64)).astype(np.float32) * 0.2
    k2 = rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.08
    wy = I._linear_weights(300, 384)
    wx = I._linear_weights(200, 288)
    k1p = s2d_kernel_s2(k1)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    inv_std = 1.0 / np.array([0.229, 0.224, 0.225], np.float32)

    def p0(f, dt):
        y = jnp.einsum('oh,bhwc->bowc', jnp.asarray(wy), f)
        y = jnp.einsum('pw,bhwc->bhpc', jnp.asarray(wx), y)
        y = ((y - mean) * inv_std).astype(dt)
        y = jax.nn.relu(conv(y, jnp.asarray(k1, dt), stride=2))
        return jax.nn.relu(conv(y, jnp.asarray(k2, dt), stride=2))

    def p1(f, dt):
        p = phase_resize(f, wy, wx)
        p = ((p - jnp.tile(mean, 4)) * jnp.tile(inv_std, 4)).astype(dt)
        p = jax.nn.relu(conv(p, jnp.asarray(k1p, dt),
                             padding=[(1, 0), (1, 0)]))
        return jax.nn.relu(conv(p, jnp.asarray(k2, dt), stride=2))

    if f32_check:
        with jax.default_matmul_precision('highest'):
            a = np.asarray(p0(crops[:2], jnp.float32))
            b = np.asarray(p1(crops[:2], jnp.float32))
        err = np.max(np.abs(b - a)) / np.max(np.abs(a))
        print(f'[P] f32 parity: P1 vs P0 rel {err:.2e}', flush=True)
        assert err < 1e-5

    T = dict(iters_lo=10, iters_hi=110, repeats=3)
    for name, fn in (('P0 crop-matmul+normalize+conv1+conv2', p0),
                     ('P1 phase-producer s2d stem', p1)):
        t = device_timer(lambda f, fn=fn: fn(f, jnp.bfloat16), crops, **T)
        print(f'[P] {name:36s} {t*1e3:7.3f} ms', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--parts', default='DP')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--pose_batch', type=int, default=16)
    args = ap.parse_args()
    print(f'devices: {jax.devices()}', flush=True)
    if 'D' in args.parts:
        part_d(args.batch)
    if 'P' in args.parts:
        part_p(args.pose_batch)


if __name__ == '__main__':
    main()
