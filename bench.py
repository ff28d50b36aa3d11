"""Headline benchmark: HRNet-W48 384x288 throughput, TPU vs reference CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is
*measured*: the reference's own torch HRNet-W48 forward on this machine's
CPU (the denominator the north star specifies: >=5x PyTorch-CPU fps/chip).
The measurement is cached in BASELINE_MEASURED.json so bench stays fast.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, 'BASELINE_MEASURED.json')

BATCH = 16
RES = (384, 288)


def measure_torch_cpu_fps() -> float:
    """Reference torch HRNet-W48 fps on CPU (eval, no grad), at the SAME
    batch-16 shape the TPU number uses, >=30 timed forwards (capped by a
    2-minute budget — the W48 b16 CPU forward takes ~10 s each here)."""
    import torch
    sys.path.append('/root/reference')
    from models_.hrnet import HRNet as TorchHRNet

    model = TorchHRNet(c=48, nof_joints=17)
    model.eval()
    x = torch.randn(BATCH, 3, *RES)
    with torch.no_grad():
        t0 = time.perf_counter()
        model(x)  # warmup; also calibrates the iteration budget
        once = time.perf_counter() - t0
        n = int(max(3, min(30, 120.0 / max(once, 1e-3))))
        t0 = time.perf_counter()
        for _ in range(n):
            model(x)
        dt = (time.perf_counter() - t0) / n
    return BATCH / dt


def torch_cpu_fps() -> float:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)['torch_cpu_w48_384x288_fps']
    fps = measure_torch_cpu_fps()
    with open(CACHE, 'w') as f:
        json.dump({'torch_cpu_w48_384x288_fps': fps,
                   'note': 'measured on this machine, single CPU core'}, f,
                  indent=2)
    return fps


def measure_tpu_fps() -> float:
    """On-chip throughput via lax.scan-chained forwards.

    The TPU here sits behind a high-latency relay where per-call host timing
    (and even block_until_ready) measures the tunnel, not the chip. Chaining
    K serialized forwards inside one jit and differencing two K values
    cancels both RTT and dispatch overhead.
    """
    import jax
    import jax.numpy as jnp

    from simple_hrnet_tpu.models import hrnet, hrnet_fast
    from simple_hrnet_tpu.models import layers as L

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=48,
                                          nof_joints=17))
    # inference fast path: grouped trunk (PERF.md; what
    # SimpleHRNet(use_fused_kernels=True) runs)
    packed = hrnet_fast.pack_grouped(params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BATCH, *RES, 3)), jnp.float32)

    def chained(p, pk, v, iters):
        def body(carry, _):
            y = hrnet_fast.apply_grouped(p, pk, carry, dtype=jnp.bfloat16)
            # feed a cheap function of y back in to serialize iterations
            return carry + jnp.mean(y) * 1e-9, jnp.mean(y)
        _, means = jax.lax.scan(body, v, None, length=iters)
        return means.sum()

    times = {}
    for iters in (2, 42):
        f = jax.jit(lambda p, pk, v, n=iters: chained(p, pk, v, n))
        float(f(params, packed, x))  # compile + run once
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(params, packed, x))  # scalar readback forces completion
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    dt = (times[42] - times[2]) / 40
    return BATCH / dt


def main():
    baseline = torch_cpu_fps()
    tpu = measure_tpu_fps()
    print(json.dumps({
        'metric': 'HRNet-W48 384x288 pose forward throughput (bf16, b16)',
        'value': round(tpu, 2),
        'unit': 'img/s/chip',
        'vs_baseline': round(tpu / baseline, 2),
    }))


if __name__ == '__main__':
    main()
