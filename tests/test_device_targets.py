"""device_targets pipeline mode: the host pipeline stops at the warp and
the jitted train/eval step runs ImageNet normalize + gaussian target
generation in-graph (train/steps.py:_batch_inputs, data/coco.py).

Parity contract: per decode path the IMAGE numerics are BIT-identical to
the host-target mode — the host ships the RAW [0, 255] warp (u8 floats
for cv2, the exact warp accumulator for the fused native kernel) and both
modes run the same subtract-then-multiply normalize
``(x - MEAN255) * INV255_STD`` with the shared pre-merged f32 constants
(divisions and mul-then-sub chains are NOT reproducible across backends:
XLA's x/const reciprocal rewrite and FMA contraction each shift the input
by ulps, which amplifies to ~7e-4 through the conv stack — root-caused in
tests/diag_devt.py; convention note in ops/image.py). The forward output
is therefore asserted bitwise. The in-graph gaussian targets match
data/target.py's host stamping (itself an exact port of the reference
COCO.py:460-515) to exp-ulp tolerance (device exp vs numpy exp), so loss
and updated params carry a matching small tolerance.
"""

import random

import numpy as np
import pytest

from test_coco_pipeline import mini_coco  # noqa: F401  (fixture reuse)

from simple_hrnet_tpu.data.coco import COCODataset, INV255_STD, MEAN255


def _ds(root, device_targets, **kw):
    base = dict(root_path=root, data_version='train2017', image_width=64,
                image_height=64, device_targets=device_targets)
    base.update(kw)
    return COCODataset(**base)


def test_raw_tail_semantics(mini_coco):  # noqa: F811
    ds = _ds(mini_coco, True, is_train=False)
    image, joints, vis, meta = ds[0]
    assert image.shape == (64, 64, 3) and image.dtype == np.float32
    assert 0.0 <= image.min() and image.max() <= 255.0
    assert joints.shape == (17, 2) and joints.dtype == np.float32
    assert vis.shape == (17, 2) and vis.dtype == np.float32
    assert meta['scale'].shape == (2,)


@pytest.mark.parametrize('native', [False, True])
def test_raw_tail_bit_matches_host_normalize(mini_coco, native):  # noqa: F811
    if native:
        from simple_hrnet_tpu.data import native as native_img
        if not native_img.available():
            pytest.skip('native/libimgproc.so not built')
    ds_d = _ds(mini_coco, True, is_train=True, use_native_decode=native)
    ds_h = _ds(mini_coco, False, is_train=True, use_native_decode=native)
    for i in (0, 3, 5):
        random.seed(17 + i)
        img_d, joints_d, vis_d, _ = ds_d[i]
        random.seed(17 + i)
        img_h, _, _, meta_h = ds_h[i]
        # identical aug draws -> identical warp; the in-graph normalize's
        # host-side replica must reproduce the host image bit-for-bit
        np.testing.assert_array_equal((img_d - MEAN255) * INV255_STD, img_h)
        np.testing.assert_array_equal(joints_d,
                                      meta_h['joints'].astype(np.float32))
        np.testing.assert_array_equal(
            vis_d, meta_h['joints_visibility'].astype(np.float32))


def _collate_pair(ds_h, ds_d, idxs):
    host, dev = ([], [], []), ([], [], [])
    for k, i in enumerate(idxs):
        random.seed(500 + k)
        img, tgt, tw, _ = ds_h[i]
        random.seed(500 + k)
        img_raw, joints, vis, _ = ds_d[i]
        for buf, v in zip(host, (img, tgt, tw)):
            buf.append(v)
        for buf, v in zip(dev, (img_raw, joints, vis)):
            buf.append(v)
    bh = {'image': np.stack(host[0]), 'target': np.stack(host[1]),
          'target_weight': np.stack(host[2])}
    bd = {'image': np.stack(dev[0]), 'joints': np.stack(dev[1]),
          'joints_vis': np.stack(dev[2])}
    return bh, bd


def _cfg(ds):
    return {'heatmap_size': tuple(ds.heatmap_size),
            'image_size': tuple(ds.image_size),
            'heatmap_sigma': ds.heatmap_sigma, 'joints_weight': None}


def test_train_step_parity(mini_coco):  # noqa: F811
    """One train step: host-target vs in-graph-target, same samples."""
    import jax
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.train import losses as losses_mod
    from simple_hrnet_tpu.train import steps as steps_mod

    ds_h = _ds(mini_coco, False, is_train=True)
    ds_d = _ds(mini_coco, True, is_train=True)
    bh, bd = _collate_pair(ds_h, ds_d, [0, 1, 2, 3])

    params = hrnet.init(jax.random.PRNGKey(0), c=4, nof_joints=17)
    loss_fn = losses_mod.get_loss('JointsMSELoss')
    # SGD momentum-0: the update is LINEAR in the gradient, so the
    # ulp-scale gradient diffs from the device-stamped targets stay
    # ulp-scale in the params (Adam's m/(sqrt(v)+eps) direction flips
    # sign on near-zero gradients and would need a 2*lr tolerance)
    opt = steps_mod.make_optimizer('SGD', lr=1e-2, momentum=0.0,
                                   lr_decay=False, steps_per_epoch=1)
    step_h = steps_mod.make_train_step(hrnet.apply, loss_fn, opt,
                                       donate=False)
    step_d = steps_mod.make_train_step(hrnet.apply, loss_fn, opt,
                                       donate=False,
                                       device_targets=_cfg(ds_d))
    p1, o1, loss_h, out_h = step_h(params, opt.init(params), bh)
    p2, o2, loss_d, out_d, tgt_d = step_d(params, opt.init(params), bd)

    np.testing.assert_allclose(np.asarray(tgt_d), bh['target'], atol=1e-5)
    # loss is an MSE over ~1e-5-ulp-different gaussian stamps (device exp
    # vs numpy exp) — arithmetic equivalence, not bit parity
    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-5,
                               atol=1e-5)
    # forward depends only on the image, whose in-graph normalize is
    # bit-identical to the host pipeline's (shared f32 reciprocal)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_step_parity_with_flip_test(mini_coco):  # noqa: F811
    import jax
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.train import losses as losses_mod
    from simple_hrnet_tpu.train import steps as steps_mod

    ds_h = _ds(mini_coco, False, is_train=False)
    ds_d = _ds(mini_coco, True, is_train=False)
    bh, bd = _collate_pair(ds_h, ds_d, [0, 1])

    params = hrnet.init(jax.random.PRNGKey(1), c=4, nof_joints=17)
    loss_fn = losses_mod.get_loss('JointsMSELoss')
    ev_h = steps_mod.make_eval_step(hrnet.apply, loss_fn,
                                    flip_pairs=ds_h.flip_pairs)
    ev_d = steps_mod.make_eval_step(hrnet.apply, loss_fn,
                                    flip_pairs=ds_h.flip_pairs,
                                    device_targets=_cfg(ds_d))
    loss_h, out_h = ev_h(params, bh)
    loss_d, out_d, tgt_d = ev_d(params, bd)
    np.testing.assert_allclose(float(loss_d), float(loss_h), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_h))


def test_train_step_device_targets_mesh(mini_coco):  # noqa: F811
    """The device-targets step under an 8-device mesh: the generated target
    comes back batch-sharded and the loss matches the unsharded step."""
    import jax
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.parallel import make_mesh, replicate
    from simple_hrnet_tpu.train import losses as losses_mod
    from simple_hrnet_tpu.train import steps as steps_mod

    ds_d = _ds(mini_coco, True, is_train=True)
    _, bd = _collate_pair(_ds(mini_coco, False, is_train=True), ds_d,
                          list(range(8)))

    params = hrnet.init(jax.random.PRNGKey(2), c=4, nof_joints=17)
    loss_fn = losses_mod.get_loss('JointsMSELoss')
    opt = steps_mod.make_optimizer('Adam', lr=1e-3, lr_decay=False,
                                   steps_per_epoch=1)
    cfg = _cfg(ds_d)
    step_1 = steps_mod.make_train_step(hrnet.apply, loss_fn, opt,
                                       donate=False, device_targets=cfg)
    mesh = make_mesh(8)
    step_m = steps_mod.make_train_step(hrnet.apply, loss_fn, opt,
                                       mesh=mesh, donate=False,
                                       device_targets=cfg)
    _, _, loss_1, _, tgt_1 = step_1(params, opt.init(params), bd)
    pr = replicate(params, mesh)
    orr = replicate(opt.init(params), mesh)
    from simple_hrnet_tpu.parallel import shard_batch
    _, _, loss_m, _, tgt_m = step_m(pr, orr, shard_batch(bd, mesh))
    # the 8-way data-parallel loss reassociates the batch reduction
    np.testing.assert_allclose(float(loss_m), float(loss_1), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt_m), np.asarray(tgt_1),
                               atol=1e-6)


def test_coco_train_epoch_device_targets(mini_coco, tmp_path):  # noqa: F811
    """Full COCOTrain epoch in device-targets mode: fused step returning
    in-graph targets drives PCK, COCO AP, tensorboard and checkpoints."""
    from simple_hrnet_tpu.train.trainer import COCOTrain

    ds = _ds(mini_coco, True, is_train=True, half_body_prob=0.0,
             rotate_prob=0.0)
    ds_val = _ds(mini_coco, True, is_train=False)
    train = COCOTrain(exp_name='mini-devt', ds_train=ds, ds_val=ds_val,
                      epochs=1, batch_size=4, num_workers=2, lr=1e-3,
                      lr_decay=False, optimizer='Adam',
                      log_path=str(tmp_path), use_tensorboard=True,
                      model_c=4, model_nof_joints=17,
                      flip_test_images=True, model_name='HRNet',
                      device_targets=True)
    train.run()
    assert np.isfinite(train.mean_loss_train)
    assert np.isfinite(train.mean_loss_val)
    assert 0.0 <= train.mean_mAP_val <= 1.0


def test_trainer_rejects_host_dataset(mini_coco, tmp_path):  # noqa: F811
    from simple_hrnet_tpu.train.trainer import COCOTrain

    ds = _ds(mini_coco, False, is_train=True)
    with pytest.raises(ValueError, match='device_targets'):
        COCOTrain(exp_name='bad', ds_train=ds, ds_val=ds, epochs=1,
                  batch_size=4, use_tensorboard=False, model_c=4,
                  log_path=str(tmp_path), device_targets=True)
    # a host-target ds_val alone must also be rejected (it would otherwise
    # fail mid-run with an opaque shape error inside the jitted eval step)
    ds_d = _ds(mini_coco, True, is_train=True)
    with pytest.raises(ValueError, match='device_targets'):
        COCOTrain(exp_name='bad2', ds_train=ds_d, ds_val=ds, epochs=1,
                  batch_size=4, use_tensorboard=False, model_c=4,
                  log_path=str(tmp_path), device_targets=True)


def test_device_targets_rejects_fractional_sigma():
    """The reference stamping is ill-defined for fractional sigma*3 (the
    trunc-toward-zero window shifts near edges; frac < 0.5 crashes the
    host slice) — the device version refuses instead of diverging."""
    import jax.numpy as jnp
    from simple_hrnet_tpu.data import target as target_gen

    joints = jnp.zeros((1, 17, 2), jnp.float32)
    vis = jnp.ones((1, 17, 2), jnp.float32)
    with pytest.raises(ValueError, match='heatmap_sigma'):
        target_gen.generate_target_device(joints, vis, (48, 64), (192, 256),
                                          heatmap_sigma=1.4)
