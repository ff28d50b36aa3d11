"""Producer-fused space-to-depth ("phase layout") for 3-channel conv stems.

The detectors' first conv is MXU-starved: 3 input channels occupy 3 of the
MXU's 128 lanes, and at 416^2 it is 32% of the whole int8 YOLOv3 forward
(scripts/bench_darknet_layers.py: conv0 1.84 ms of 5.73 ms b8). The classic
fix is space-to-depth (the MLPerf ResNet trick): run the stem on the
(H/2, W/2, 4C) tensor of the four pixel-parity phases. Round 3 measured
that the CONV is 3.2x faster but every in-graph relayout of an existing
tensor loses on TPU (6-D transpose 0.55x, strided slices 0.29x — PERF.md
"Stem post-mortems"). The round-4 angle: our resize/letterbox is already a
pair of dense matmuls (ops/image.py), and a matmul can emit the phase
layout for FREE — reorder the static weight matrix's rows into
[even; odd] blocks, slice the two contiguous halves, and concat on lanes.
Measured 2.5-2.7x on letterbox+conv0+down1 across sessions
(scripts/bench_s2d_producer.py; PERF.md "producer-fused phase stem").

Phase layout convention: channel block (a*2+b)*C:(a*2+b+1)*C of the
(H/2, W/2, 4C) tensor holds pixels at full-res (2Y+a, 2X+b) — row-major
over (row parity a, column parity b).

Kernel transforms below are EXACT (zero-pad-preserving) rewrites of the
full-resolution convolution; parity is pinned in tests/test_detector.py
and was verified at 2.8e-7 f32 rel on the real chip. Reference anchor:
the cv2-letterbox + darknet conv0 chain these replace,
/root/reference/models_/detectors/YOLOv3.py:23-45 and the first
convolutional blocks of its yolov3.cfg.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

Padding = Tuple[Tuple[int, int], Tuple[int, int]]


def phase_kernel_s1(k: np.ndarray, pad: int = 1) -> Tuple[np.ndarray, Padding]:
    """Stride-1 (kh, kw, ci, co) kernel -> phase-to-phase stride-1 kernel.

    O[2Y+al, 2X+be] = sum_{dy,dx} I[2Y+al+dy-pad, 2X+be+dx-pad] K[dy,dx];
    writing al+dy-pad = 2s+a (s = floor/2) collapses the taps onto phase
    rows Y+s, so the phase kernel is (T, T, 4ci, 4co) with T phase taps and
    the OUTPUT stays in phase space (co -> 4co lanes, output block (al,be)).
    Zero padding in phase space reproduces the full-res zero pad exactly:
    every out-of-range full-res row maps to an out-of-range phase row.
    """
    kh, kw, ci, co = k.shape
    smin, smax = (0 + 0 - pad) // 2, (1 + (kh - 1) - pad) // 2
    tmin, tmax = (0 + 0 - pad) // 2, (1 + (kw - 1) - pad) // 2
    th, tw = smax - smin + 1, tmax - tmin + 1
    kp = np.zeros((th, tw, 4 * ci, 4 * co), k.dtype)
    for al in range(2):
        for be in range(2):
            for dy in range(kh):
                for dx in range(kw):
                    s, a = divmod(al + dy - pad, 2)
                    t, b = divmod(be + dx - pad, 2)
                    kp[s - smin, t - tmin,
                       (a * 2 + b) * ci:(a * 2 + b + 1) * ci,
                       (al * 2 + be) * co:(al * 2 + be + 1) * co] = k[dy, dx]
    return kp, ((-smin, th - 1 + smin), (-tmin, tw - 1 + tmin))


def phase_kernel_s2(k: np.ndarray, pad: int = 1) -> Tuple[np.ndarray, Padding]:
    """Stride-2 (kh, kw, ci, co) kernel -> stride-1 phase-input kernel whose
    output is the STANDARD (H/2, W/2, co) layout (exits phase space).

    O[Y, X] = sum I[2Y+dy-pad, 2X+dx-pad] K[dy,dx]; dy-pad = 2s+a gives a
    (T, T, 4ci, co) kernel over phase rows Y+s. Returns (kernel, padding)
    where padding is the asymmetric pair config that reproduces the full-res
    zero pad (e.g. 3x3 pad1 -> 2x2 with ((1,0),(1,0)); 6x6 pad2 -> 3x3 with
    ((1,1),(1,1))).
    """
    kh, kw, ci, co = k.shape
    smin, smax = (0 - pad) // 2, (kh - 1 - pad) // 2
    tmin, tmax = (0 - pad) // 2, (kw - 1 - pad) // 2
    th, tw = smax - smin + 1, tmax - tmin + 1
    kp = np.zeros((th, tw, 4 * ci, co), k.dtype)
    for dy in range(kh):
        for dx in range(kw):
            s, a = divmod(dy - pad, 2)
            t, b = divmod(dx - pad, 2)
            kp[s - smin, t - tmin,
               (a * 2 + b) * ci:(a * 2 + b + 1) * ci] = k[dy, dx]
    return kp, ((-smin, th - 1 + smin), (-tmin, tw - 1 + tmin))


def phase_paddings(kh: int, kw: int, pad: int) -> Tuple[Padding, Padding]:
    """The (stride-1, stride-2) conv paddings matching what
    ``phase_kernel_s1/s2(k, pad)`` return for a (kh, kw) kernel — derived
    from the transforms themselves so consumers (detectors/darknet.py
    apply) can never drift from the kernel rewrite."""
    dummy = np.zeros((kh, kw, 1, 1), np.float32)
    _, p1 = phase_kernel_s1(dummy, pad=pad)
    _, p2 = phase_kernel_s2(dummy, pad=pad)
    return p1, p2


def tile_phase_bias(bias: np.ndarray) -> np.ndarray:
    """Per-output-channel bias for a phase-space OUTPUT: 4 phase copies."""
    return np.tile(np.asarray(bias), 4)


def blocked_rows(w: np.ndarray) -> np.ndarray:
    """(out, in) resize matrix -> [even rows; odd rows] blocked form. A
    matmul with the blocked matrix emits both phase row-halves as
    contiguous slices — the "free relayout" at the heart of the trick."""
    return np.concatenate([w[0::2], w[1::2]])


def phase_quadrants(u: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) tensor whose rows AND cols are [even; odd] blocked ->
    (N, H/2, W/2, 4C) phase tensor: four contiguous slices + lane concat
    (no strided relayout — the XLA-fusable form)."""
    h2, w2 = u.shape[1] // 2, u.shape[2] // 2
    parts = [u[:, a * h2:(a + 1) * h2, b * w2:(b + 1) * w2]
             for a in (0, 1) for b in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def space_to_depth_host(x: np.ndarray) -> np.ndarray:
    """Reference relayout (host numpy): (..., H, W, C) -> (..., H/2, W/2, 4C).
    Used for tests and for phase-transforming calibration inputs — never
    in-graph (the in-graph form measured 0.29-0.55x, PERF.md)."""
    return np.concatenate([x[..., a::2, b::2, :] for a in (0, 1)
                           for b in (0, 1)], axis=-1)
