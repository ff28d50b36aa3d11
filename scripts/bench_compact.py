"""Measure cross-frame crop compaction (predict_stream(compact_crops=True))
on a mixed-density window — VERDICT r3 item #3's measurement.

Scene: an 8-frame launch window with seven 1-person frames and one
8-person frame (15 people total). Costs per window, timed on-chip
(device_timer; the host loop is relay-RTT-bound here, so per-graph rates
are the honest number — same protocol as the adaptive-slot table):

  fixed-slot  : _get_fused_frames(hw, 8, 8)          = 64 pose crops
  adaptive    : same graph — the rung ladder must pick rung 8 for this
                window (its max frame has 8 people), so adaptive == fixed
                on mixed windows; its win is uniform sparse scenes.
  compacted   : _get_detect_rows(hw, 8, cap) + _get_gather_crop(16)
                = 16 pose crops (bucketed from 15).

The detector stubbing below pins box geometry only through the timed
graphs' own inputs — the graphs themselves are the production jits.

Run alone (never concurrently with another TPU benchmark).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAME_HW = (480, 640)
RES = (384, 288)
CAP = 8
NF = 8


def main():
    import jax
    import jax.numpy as jnp

    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.api import _buckets
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

    frames = jnp.asarray(rng.integers(0, 255, (NF, *FRAME_HW, 3)),
                         jnp.float32)

    # fixed-slot (== adaptive rung 8 on this window: one frame saturates)
    runf = model._get_fused_frames(FRAME_HW, CAP, NF)
    tf = device_timer(lambda f, pp, dp: runf(pp, dp, f), frames,
                      model.params, model.detector.params, **T)
    print(f'fixed-slot  (8 slots x 8 frames = 64 crops): '
          f'{tf*1e3:7.2f} ms/window  {NF/tf:6.1f} fps aggregate',
          flush=True)

    # compacted: detect-rows graph + ONE gather-crop launch at bucket 16
    # (15 people -> power-of-two bucket 16; the optimistic pre-size for a
    # steady mixed stream is the previous window's bucket = 16, so one
    # launch per window, no follow-up)
    rows_run = model._get_detect_rows(FRAME_HW, NF, CAP)
    # real detector rows/valid for these frames, then force the 7x1+1x8
    # density pattern in the validity mask (geometry of the boxes comes
    # from the real rows; invalid slots are ignored by the gather)
    rows_d, valid_d, _ = rows_run(model.detector.params, frames)
    valid_np = np.zeros(np.asarray(valid_d).shape, bool)
    valid_np[:7, :1] = True
    valid_np[7, :8] = True
    total = int(valid_np.sum())
    bucket = _buckets(total, model.max_batch_size, 1)
    gather = model._get_gather_crop(bucket, None)

    def window(f, pp, valid):
        r2, v2, _ = rows_run(model.detector.params, f)
        # the timed graph chain: detect rows feed the gather (the stream
        # passes device arrays straight through; the fixed validity mask
        # here pins the 7x1+1x8 density)
        total_d, counts, hm, pboxes, pts = gather(pp, f, r2, valid, 0)
        return total_d, counts, hm, pboxes, pts

    valid_j = jnp.asarray(valid_np)
    tc = device_timer(window, frames, model.params, valid_j, **T)
    print(f'compacted   (detect rows + {bucket}-crop gather): '
          f'{tc*1e3:7.2f} ms/window  {NF/tc:6.1f} fps aggregate '
          f'({tf/tc:4.2f}x fixed-slot)', flush=True)

    # components, for the PERF.md accounting
    tr = device_timer(lambda f, dp: rows_run(dp, f), frames,
                      model.detector.params, **T)
    tg = device_timer(lambda f, pp, r, v: gather(pp, f, r, v, 0),
                      frames, model.params, rows_d, valid_j, **T)
    print(f'  detect-rows alone: {tr*1e3:7.2f} ms   '
          f'{bucket}-crop gather alone: {tg*1e3:7.2f} ms', flush=True)

    # uniform-sparse comparison point (1 person/frame -> bucket 8): the
    # scene adaptive serving already handles well, for the table
    valid1 = np.zeros_like(valid_np)
    valid1[:, :1] = True
    b1 = _buckets(NF, model.max_batch_size, 1)
    gather1 = model._get_gather_crop(b1, None)

    def window1(f, pp, valid):
        r2, v2, _ = rows_run(model.detector.params, f)
        return gather1(pp, f, r2, valid, 0)

    t1 = device_timer(window1, frames, model.params, jnp.asarray(valid1),
                      **T)
    print(f'compacted 1/frame ({b1}-crop bucket): {t1*1e3:7.2f} ms/window  '
          f'{NF/t1:6.1f} fps aggregate', flush=True)


if __name__ == '__main__':
    main()
