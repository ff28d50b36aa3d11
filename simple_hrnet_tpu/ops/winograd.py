"""Winograd F(2x2, 3x3) convolution for the small-channel HRNet branches.

The grouped block-diagonal chains (PERF.md) are MXU-shape-bound, not
bandwidth-bound, so a FLOP-count reduction translates directly: F(2,3)
computes a 3x3 'same' convolution with 2.25x fewer multiplies (16 vs 36
MACs per 2x2 output tile) at the cost of cheap {0, +-1, +-1/2} transform
adds. The 16 tile-position products become 16 batched matmuls
(tiles x C_in) @ (C_in, C_out), each with the same channel shapes as the
direct conv but 4x fewer rows in total per output.

MEASURED OUTCOME (PERF.md): correct (1e-5 vs lax conv) but ~8x SLOWER
than the direct grouped conv on TPU in pure XLA — the 16 strided tile
slices and transform stacks materialize instead of fusing (the same
failure mode as the taps-on-N reformulation). A Winograd win here needs a
Pallas kernel that keeps V/M in VMEM; kept for that future work.

Standard F(2,3) matrices:
  B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
  G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
  A^T = [[1,1,1,0],[0,1,-1,-1]]

Requires even H, W (true for every HRNet branch resolution).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) HWIO -> (16, C_in, C_out) U = G g G^T.

    Host-side, once at load (pack time).
    """
    g = np.asarray(kernel, np.float32)              # (3, 3, ci, co)
    u = np.einsum('ua,abio,vb->uvio', G, g, G)      # (4, 4, ci, co)
    return jnp.asarray(u.reshape(16, *u.shape[2:]))


def conv3x3_winograd(x: jnp.ndarray, u: jnp.ndarray,
                     bias: jnp.ndarray = None,
                     preferred=jnp.float32) -> jnp.ndarray:
    """3x3 'same' conv via F(2,3). x: (N, H, W, C_in) with even H, W;
    u: (16, C_in, C_out) from transform_kernel."""
    n, h, w, ci = x.shape
    co = u.shape[-1]
    ht, wt = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # gather the 16 tile positions: X[a][b] (N, ht, wt, C)
    def pos(a, b):
        # tile grid starts: (a + 2i, b + 2j), i < h/2, j < w/2
        return jax.lax.slice(xp, (0, a, b, 0), (n, a + h - 1, b + w - 1, ci),
                             (1, 2, 2, 1))

    X = [[pos(a, b) for b in range(4)] for a in range(4)]

    # V[u,v] = sum_ab BT[u,a] BT[v,b] X[a][b] — entries in {0, +-1}: pure adds
    rows = []
    for uu in range(4):
        row = []
        for a in range(4):
            if BT[uu, a] == 0:
                continue
            term = X[a]
            row.append((BT[uu, a], term))
        rows.append(row)

    V = []
    for uu in range(4):
        for vv in range(4):
            acc = None
            for ca, Xa in rows[uu]:
                for b in range(4):
                    cb = BT[vv, b]
                    if cb == 0:
                        continue
                    t = Xa[b] if cb * ca > 0 else -Xa[b]
                    acc = t if acc is None else acc + t
            V.append(acc)
    V = jnp.stack(V)                                   # (16, N, ht, wt, C)

    # M[t] = V[t] @ U[t]: one batched matmul over the 16 tile positions
    Vf = V.reshape(16, n * ht * wt, ci)
    M = jax.lax.dot_general(Vf, u, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=preferred)
    M = M.reshape(16, n, ht, wt, co)

    # Y[p,q] = sum_uv AT[p,u] AT[q,v] M[u,v]
    Y = []
    for p in range(2):
        for q in range(2):
            acc = None
            for uu in range(4):
                cu = AT[p, uu]
                if cu == 0:
                    continue
                for vv in range(4):
                    cv = AT[q, vv]
                    if cv == 0:
                        continue
                    t = M[uu * 4 + vv]
                    s = cu * cv
                    t = t if s > 0 else -t
                    acc = t if acc is None else acc + t
            Y.append(acc)
    # interleave 2x2 tile outputs back to (N, H, W, C_out)
    Y = jnp.stack(Y).reshape(2, 2, n, ht, wt, co)
    y = Y.transpose(2, 3, 0, 4, 1, 5).reshape(n, h, w, co)
    if bias is not None:
        y = y + bias
    return y
