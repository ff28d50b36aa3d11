"""Headline benchmarks: the production W48 configs, TPU vs reference CPU.

Prints one JSON line PER measurement (all run serialized in this one
process — concurrent TPU benchmarks corrupt each other's chained
timings, PERF.md). The LAST line is the north-star metric from
BASELINE.json ("frames/sec/chip at W48-384x288 multi-person"):

  1. HRNet-W48 384x288 bf16 b16 forward       (cross-round comparability)
  2. multi-person e2e fps (YOLOv3 detect -> crop -> W48 pose -> decode,
     640x480 frame, 8 people slots, one fused graph, int8)
  3. the same pipeline batched 8 frames per launch (predict_stream's
     batch_frames serving mode — aggregate fps, production-best config)
  4. HRNet-W48 384x288 int8  b32 forward       (production-best serving)
  5. W48 384x288 b16 bf16 grouped-trunk TRAIN step (fwd+bwd+Adam+BN) —
     LAST because its grouped-backward compile is by far the slowest
     (~10 min uncached) and it is guarded by the wall-clock budget.
Finally the north-star batched-e2e line is RE-printed so the driver's
last-line parse always lands on the scoreboard metric.

Robustness (BENCH_r04 was rc=124 with ZERO lines — never again):
  * ``enable_compile_cache()`` at startup: driver runs re-use executables
    compiled during the builder session instead of paying remote compiles;
  * cheapest-to-compile metrics first, so the first JSON line lands
    within minutes even from a cold cache;
  * every metric is fault-isolated (one failure prints a note line and
    moves on) and gated on a wall-clock budget (``SHT_BENCH_BUDGET``
    seconds, default 1200): when the remaining budget can't cover a
    metric's cold-cache estimate, it is skipped with an explicit note
    instead of timing out with nothing on the scoreboard.

The reference publishes no numbers (BASELINE.md), so baselines are
*measured*: the reference's own torch HRNet-W48 forward on this machine's
CPU (the denominator the north star specifies: >=5x PyTorch-CPU fps/chip).
Cached in BASELINE_MEASURED.json so bench stays fast. Round 5 re-measured
the cache on an IDLE host: the old cached values (0.610 fwd / 0.119
train img/s) had been taken under builder-session CPU contention and
understated the reference 2.2-2.7x — vs_baseline columns before round 5
are inflated by that factor; the metric VALUES (img/s, fps) were always
on-chip and are unaffected. The multi-person
denominator is derived generously for the reference: torch-CPU pose
forward alone at 8 crops/frame, ignoring its detector + host crop loop
(SURVEY.md §3.1 — the real reference path is strictly slower).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, 'BASELINE_MEASURED.json')
T0 = time.monotonic()
BUDGET = float(os.environ.get('SHT_BENCH_BUDGET', '1200'))


def remaining() -> float:
    return BUDGET - (time.monotonic() - T0)

BATCH = 16
RES = (384, 288)
MP_FRAME_HW = (480, 640)
MP_SLOTS = 8


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


def _cached(key: str, measure):
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key not in cache:
        # CPU baselines are contention-sensitive (round 5: builder-session
        # contention once understated the reference 2.2-2.7x). Record the
        # 1-min load average alongside the measurement so a contended
        # number is identifiable, and never overwrite an existing note.
        load1 = os.getloadavg()[0]
        cache[key] = measure()
        cache[key + '__loadavg1'] = round(load1, 2)
        cache.setdefault(
            'note', 'measured on this machine, single CPU core; only '
            'trust values whose __loadavg1 shows an idle host (<~1.5)')
        with open(CACHE, 'w') as f:
            json.dump(cache, f, indent=2)
    return cache[key]


def torch_cpu_fps() -> float:
    return _cached('torch_cpu_w48_384x288_fps', measure_torch_cpu_fps)


def measure_torch_cpu_train_fps() -> float:
    """Reference torch W48 TRAIN-step img/s on CPU (fwd+bwd+Adam, MSE over
    input/4 heatmaps — training/Train.py:236-262's per-step work), same
    b16 shape as the TPU train metric. 3 timed steps (a CPU W48 train
    step runs ~30-40 s here; cached after first measure)."""
    import torch
    sys.path.append('/root/reference')
    from models_.hrnet import HRNet as TorchHRNet

    model = TorchHRNet(c=48, nof_joints=17)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = torch.nn.MSELoss()
    x = torch.randn(BATCH, 3, *RES)
    tgt = torch.randn(BATCH, 17, RES[0] // 4, RES[1] // 4)

    def step():
        opt.zero_grad()
        loss = crit(model(x), tgt)
        loss.backward()
        opt.step()

    step()  # warmup (allocator + autograd graph)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    return BATCH / ((time.perf_counter() - t0) / n)


def torch_cpu_train_fps() -> float:
    return _cached('torch_cpu_w48_384x288_train_fps',
                   measure_torch_cpu_train_fps)


def measure_train_step():
    """On-chip W48 grouped-trunk TRAIN step throughput (bf16 mixed, b16):
    forward with train-mode BN, loss, backward, Adam, BN running-stat
    fold — the full fused step train/steps.py:make_train_step builds
    (timed here without buffer donation, which lax.scan chaining forbids;
    measured equal at this size, PERF.md round 3)."""
    import jax
    import jax.numpy as jnp
    import optax

    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.train import grouped as G
    from simple_hrnet_tpu.train import losses
    from simple_hrnet_tpu.utils.profiling import device_timer

    rng = np.random.default_rng(0)
    params = hrnet.init(jax.random.PRNGKey(0), c=48, nof_joints=17)
    apply_fn = G.make_apply(group=2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def full(img, p, os_, tgt, tw):
        def loss_of(pp):
            stats = {}
            out = apply_fn(pp, img, train=True, stats=stats,
                           dtype=jnp.bfloat16)
            return (losses.joints_mse_loss(out.astype(jnp.float32), tgt,
                                           tw), stats)
        (l, stats), grads = jax.value_and_grad(loss_of, has_aux=True)(p)
        updates, os2 = opt.update(grads, os_, p)
        p2 = optax.apply_updates(p, updates)
        p2 = L.update_running_stats(p2, stats)
        # device_timer reduces EVERY returned leaf into the chained
        # scalar, keeping the whole backward + update alive
        return (l, p2, os2)

    img = jnp.asarray(rng.standard_normal((BATCH, *RES, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((BATCH, RES[0] // 4, RES[1] // 4,
                                           17)), jnp.float32)
    tw = jnp.ones((BATCH, 17, 1), jnp.float32)
    t = device_timer(full, img, params, opt_state, tgt, tw,
                     iters_lo=2, iters_hi=22, repeats=3)
    return BATCH / t


def make_w48_forward_thunks():
    """On-chip W48 grouped-trunk throughput, bf16 b16 and int8 b32, as
    two separately-timeable thunks sharing one param setup.

    All timing via lax.scan-chained forwards (the TPU sits behind a
    high-latency relay where per-call host timing — even
    block_until_ready — measures the tunnel, not the chip; chaining K
    serialized forwards inside one jit and differencing two K values
    cancels both RTT and dispatch overhead)."""
    import jax
    import jax.numpy as jnp

    from simple_hrnet_tpu.models import hrnet, hrnet_fast
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.models import quantize as Q
    from simple_hrnet_tpu.utils.profiling import device_timer

    T = dict(iters_lo=2, iters_hi=42, repeats=3)
    J = jax.tree_util.tree_map
    rng = np.random.default_rng(0)

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=48,
                                          nof_joints=17))
    amax = Q.calibrate_cpu(lambda p, v: hrnet.apply(p, v), params,
                           [Q.smooth_frames(RES)])
    packed = J(jnp.asarray, hrnet_fast.pack_grouped(params, group=2))
    packed_q = J(jnp.asarray, hrnet_fast.pack_grouped(params, group=2,
                                                      int8_amax=amax))
    params_q = J(jnp.asarray, Q.quantize_folded(params, amax))
    params = J(jnp.asarray, params)

    fwd = lambda v, p, pk: hrnet_fast.apply_grouped(p, pk, v,
                                                    dtype=jnp.bfloat16)
    x16 = jnp.asarray(rng.standard_normal((16, *RES, 3)), jnp.float32)
    x32 = jnp.asarray(rng.standard_normal((32, *RES, 3)), jnp.float32)
    bf16 = lambda: 16 / device_timer(fwd, x16, params, packed, **T)
    int8 = lambda: 32 / device_timer(fwd, x32, params_q, packed_q, **T)
    return bf16, int8


def measure_multiperson_fps():
    """North-star metric: fps of the fused multi-person graph (detect ->
    compact -> crop -> pose -> decode, zero host syncs — the graph
    predict_stream runs), 640x480 frames, YOLOv3-416 + W48-384x288,
    8 people slots, int8. Returns (single-frame fps, aggregate fps of
    the 8-frames-per-launch batched graph — predict_stream's
    batch_frames=8 serving mode, api.py:_get_fused_frames)."""
    import jax
    import jax.numpy as jnp

    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.utils import checkpoint as ckpt
    from simple_hrnet_tpu.utils.profiling import device_timer

    path = '/tmp/bench_w48_random.npz'
    if not os.path.exists(path):
        ckpt.save(path, hrnet.init(jax.random.PRNGKey(0), c=48,
                                   nof_joints=17))
    model = SimpleHRNet(48, 17, path, resolution=RES, multiperson=True,
                        yolo_model_def='yolov3', dtype='int8')
    rng = np.random.default_rng(1)
    T = dict(iters_lo=2, iters_hi=42, repeats=3)

    run1 = model._get_fused_frame(MP_FRAME_HW, MP_SLOTS)
    frame = jnp.asarray(rng.integers(0, 255, (*MP_FRAME_HW, 3)),
                        jnp.float32)
    t1 = device_timer(lambda f, pp, dp: run1(pp, dp, f), frame,
                      model.params, model.detector.params, **T)

    nb = 8
    runb = model._get_fused_frames(MP_FRAME_HW, MP_SLOTS, nb)
    frames = jnp.asarray(rng.integers(0, 255, (nb, *MP_FRAME_HW, 3)),
                         jnp.float32)
    tb = device_timer(lambda f, pp, dp: runb(pp, dp, f), frames,
                      model.params, model.detector.params, **T)
    return 1.0 / t1, nb / tb


def emit(metric, value, unit, vs):
    line = {'metric': metric, 'value': round(value, 2), 'unit': unit,
            'vs_baseline': round(vs, 2)}
    print(json.dumps(line), flush=True)
    return line


def main():
    from simple_hrnet_tpu import enable_compile_cache
    enable_compile_cache()

    def guarded(name, est_cold, thunk):
        """Run one metric unless the remaining budget can't cover its
        cold-cache estimate; fault-isolate so one failure can't blank
        the rest of the scoreboard."""
        if remaining() < est_cold:
            print(json.dumps({
                'note': f'skipped "{name}": {remaining():.0f}s left < '
                        f'{est_cold:.0f}s cold-cache estimate '
                        f'(SHT_BENCH_BUDGET={BUDGET:.0f})'}), flush=True)
            return False
        try:
            thunk()
            return True
        except Exception as e:  # pragma: no cover - defensive
            print(json.dumps({'note': f'metric "{name}" failed: '
                                      f'{type(e).__name__}: {e}'}),
                  flush=True)
            return False

    # The torch-CPU denominator is normally a cached read
    # (BASELINE_MEASURED.json, committed); measuring it fresh costs ~4 min
    # of torch W48 forwards, so on a cacheless machine it rides the same
    # budget guard as everything else instead of stalling the scoreboard.
    baseline = None
    try:
        if os.path.exists(CACHE) or remaining() > 300:
            baseline = torch_cpu_fps()
        else:
            print(json.dumps({'note': 'skipped torch-CPU baseline measure: '
                                      f'{remaining():.0f}s left < 300s and '
                                      'no BASELINE_MEASURED.json cache; '
                                      'metrics report vs_baseline=0'}),
                  flush=True)
    except Exception as e:
        print(json.dumps({'note': f'torch-CPU baseline unavailable '
                                  f'({type(e).__name__}: {e}); metrics '
                                  f'report vs_baseline=0'}), flush=True)

    def vs(x, denom=None):
        b = baseline if denom is None else denom
        return x / b if b else 0.0

    # lines by scoreboard priority; the finally block re-prints the best
    # available so the driver's LAST-line parse always lands on the most
    # scoreboard-relevant metric even after failures (priority 0 = the
    # north-star batched e2e)
    printed = {}

    def emit_p(priority, metric, value, unit, vsb):
        printed[priority] = emit(metric, value, unit, vsb)

    state = {}

    # cheapest compile first: bf16 forward (~2-3 min cold). Then the
    # north-star e2e graphs, then int8, then the slow train compile.
    def run_forward_setup_and_bf16():
        state['bf16_thunk'], state['int8_thunk'] = make_w48_forward_thunks()
        v = state['bf16_thunk']()
        emit_p(2, 'HRNet-W48 384x288 pose forward throughput (bf16, b16)',
               v, 'img/s/chip', vs(v))

    def run_multiperson():
        mp, mp_b8 = measure_multiperson_fps()
        # generous-to-reference denominator: torch-CPU pose forward alone
        # at 8 crops/frame (its detector + host crop loop only slows it)
        emit_p(1, 'W48-384x288 multi-person e2e (YOLOv3 detect+crop+pose'
                  '+decode, fused, int8)',
               mp, 'frames/s/chip',
               vs(mp, baseline / MP_SLOTS if baseline else None))
        emit_p(0, 'W48-384x288 multi-person e2e, 8-frame batched serving '
                  '(predict_stream batch_frames=8, fused, int8)',
               mp_b8, 'frames/s/chip',
               vs(mp_b8, baseline / MP_SLOTS if baseline else None))

    def run_int8():
        v = state['int8_thunk']()
        emit_p(3, 'HRNet-W48 384x288 pose forward throughput (int8, b32)',
               v, 'img/s/chip', vs(v))

    def run_train():
        try:
            denom = torch_cpu_train_fps()
        except Exception:
            denom = None
        v = measure_train_step()
        emit_p(4, 'HRNet-W48 384x288 TRAIN step (bf16 mixed, b16, grouped '
                  'trunk, fwd+bwd+Adam+BN)',
               v, 'img/s/chip', vs(v, denom))

    try:
        guarded('bf16 forward', 240, run_forward_setup_and_bf16)
        guarded('multi-person e2e', 420, run_multiperson)
        if 'int8_thunk' in state:
            guarded('int8 forward', 180, run_int8)
        else:
            print(json.dumps({'note': 'skipped "int8 forward": its packed '
                                      'params come from the bf16 setup '
                                      'stage, which did not run'}),
                  flush=True)
        guarded('train step', 660, run_train)
    finally:
        if printed:
            # the driver parses the LAST json line; make sure it is the
            # highest-priority metric that succeeded (north-star batched
            # e2e when available) even after skips/failures above
            print(json.dumps(printed[min(printed)]), flush=True)


if __name__ == '__main__':
    main()
