"""Diagnostic (not a test): where does device_targets output diverge?

Run: python -m pytest tests/diag_devt.py -q -s
"""
import random

import numpy as np

from test_coco_pipeline import mini_coco  # noqa: F401
from test_device_targets import _ds, _collate_pair, _cfg


def test_diag(mini_coco):  # noqa: F811
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.data.coco import IMAGENET_MEAN, IMAGENET_STD
    from simple_hrnet_tpu.models import hrnet

    ds_h = _ds(mini_coco, False, is_train=True)
    ds_d = _ds(mini_coco, True, is_train=True)
    bh, bd = _collate_pair(ds_h, ds_d, [0, 1, 2, 3])

    # 1. in-graph normalize alone, jitted: bitwise vs host image?
    norm = jax.jit(lambda x: (x - jnp.asarray(IMAGENET_MEAN))
                   / jnp.asarray(IMAGENET_STD))
    img_in = np.asarray(norm(bd['image']))
    same = np.array_equal(img_in, bh['image'])
    print('normalize-alone bitwise identical:', same)
    if not same:
        d = np.abs(img_in - bh['image'])
        print('  max abs diff', d.max(), 'n diff', (d > 0).sum())

    params = hrnet.init(jax.random.PRNGKey(0), c=4, nof_joints=17)

    # 2. apply on host image, jitted standalone, vs apply on raw image with
    # normalize INSIDE the same jit graph
    f_host = jax.jit(lambda p, x: hrnet.apply(p, x, train=False))
    f_graph = jax.jit(lambda p, x: hrnet.apply(
        p, (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD),
        train=False))
    out_h = np.asarray(f_host(params, bh['image']))
    out_g = np.asarray(f_graph(params, bd['image']))
    d = np.abs(out_g - out_h)
    print('fused-normalize eval out: max abs', d.max(),
          'max rel', (d / (np.abs(out_h) + 1e-12)).max(),
          'bitwise:', np.array_equal(out_g, out_h))

    # 3. normalize on host in numpy, then feed the SAME f_host graph:
    # isolates "input bits" from "graph structure"
    out_h2 = np.asarray(f_host(params, img_in))
    print('same-graph different-input-bits: bitwise',
          np.array_equal(out_h2, out_h))

    # 4. feed host image through f_graph-shaped program:
    # give f_graph an input that, after in-graph normalize, should match --
    # impossible directly; instead jit a graph with a no-op producer to see
    # if graph structure alone changes conv numerics
    f_noop = jax.jit(lambda p, x: hrnet.apply(p, x * 1.0 + 0.0, train=False))
    out_n = np.asarray(f_noop(params, bh['image']))
    print('noop-producer graph vs plain: bitwise',
          np.array_equal(out_n, out_h),
          'max abs', np.abs(out_n - out_h).max())

    # 5. train-mode (batch-stat reductions) sensitivity
    st1, st2 = {}, {}
    g_host = jax.jit(lambda p, x: hrnet.apply(p, x, train=True, stats={}))
    g_graph = jax.jit(lambda p, x: hrnet.apply(
        p, (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD),
        train=True, stats={}))
    o1 = np.asarray(g_host(params, bh['image']))
    o2 = np.asarray(g_graph(params, bd['image']))
    d = np.abs(o2 - o1)
    print('train-mode: max abs', d.max(), 'bitwise', np.array_equal(o1, o2))
