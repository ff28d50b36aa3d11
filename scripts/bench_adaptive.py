"""Quantify the adaptive-slot serving win: the fused multi-person graph
timed per people-slot rung (the graphs predict_stream(adaptive_slots=True)
walks between). The pose batch is 84%+ of the fused graph at serving batch
sizes (PERF.md "where the e2e time goes"), so sparse scenes — the common
case in real video — should run close to slots/cap of the worst-case work.

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
BATCH_FRAMES = 8


def main():
    import jax
    import jax.numpy as jnp

    from simple_hrnet_tpu import SimpleHRNet
    from simple_hrnet_tpu.api import _slot_ladder
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

    frame = jnp.asarray(rng.integers(0, 255, (*FRAME_HW, 3)), jnp.float32)
    frames = jnp.asarray(rng.integers(0, 255, (BATCH_FRAMES, *FRAME_HW, 3)),
                         jnp.float32)

    print(f'rung | b1 ms/frame | b1 fps | b{BATCH_FRAMES} ms/frame | '
          f'b{BATCH_FRAMES} aggregate fps')
    for slots in _slot_ladder(CAP):
        if slots == 0:
            # the detect-only idle rung (no pose batch at all)
            run0 = model._get_detect_counts(FRAME_HW, 1)
            run0b = model._get_detect_counts(FRAME_HW, BATCH_FRAMES)
            t1 = device_timer(lambda f, dp: run0(dp, f[None]), frame,
                              model.detector.params, **T)
            tb = device_timer(lambda f, dp: run0b(dp, f), frames,
                              model.detector.params, **T)
            print(f'{slots:4d} | {t1 * 1e3:11.2f} | {1 / t1:6.1f} | '
                  f'{tb * 1e3 / BATCH_FRAMES:11.2f} | '
                  f'{BATCH_FRAMES / tb:6.1f}', flush=True)
            continue
        run1 = model._get_fused_frame(FRAME_HW, slots)
        t1 = device_timer(lambda f, pp, dp: run1(pp, dp, f), frame,
                          model.params, model.detector.params, **T)
        runb = model._get_fused_frames(FRAME_HW, slots, BATCH_FRAMES)
        tb = device_timer(lambda f, pp, dp: runb(pp, dp, f), frames,
                          model.params, model.detector.params, **T)
        print(f'{slots:4d} | {t1 * 1e3:11.2f} | {1 / t1:6.1f} | '
              f'{tb * 1e3 / BATCH_FRAMES:11.2f} | {BATCH_FRAMES / tb:6.1f}',
              flush=True)


if __name__ == '__main__':
    main()
