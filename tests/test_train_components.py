"""Losses, heatmap targets and PCK metric parity vs the reference."""

import numpy as np
import pytest

import conftest


def _ref_losses():
    conftest.reference_on_path()
    import losses.loss as ref_loss
    return ref_loss


def test_joints_mse_loss_parity(rng):
    import torch
    ref_loss = _ref_losses()
    from simple_hrnet_tpu.train import losses as L

    out = rng.standard_normal((4, 17, 16, 12)).astype(np.float32)
    tgt = rng.standard_normal((4, 17, 16, 12)).astype(np.float32)
    tw = rng.uniform(0, 1, (4, 17, 1)).astype(np.float32)

    ref = ref_loss.JointsMSELoss(use_target_weight=True)(
        torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(tw))
    got = L.joints_mse_loss(np.transpose(out, (0, 2, 3, 1)),
                            np.transpose(tgt, (0, 2, 3, 1)), tw)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    ref = ref_loss.JointsMSELoss(use_target_weight=False)(
        torch.from_numpy(out), torch.from_numpy(tgt))
    got = L.joints_mse_loss(np.transpose(out, (0, 2, 3, 1)),
                            np.transpose(tgt, (0, 2, 3, 1)),
                            use_target_weight=False)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_ohkm_loss_reference_bug_and_parity(rng):
    """The reference OHKM loss crashes (self.ohkm, loss.py:94); we verify the
    bug, then check parity against the module-level ohkm it intended."""
    import torch
    ref_loss = _ref_losses()
    from simple_hrnet_tpu.train import losses as L

    out = rng.standard_normal((4, 17, 16, 12)).astype(np.float32)
    tgt = rng.standard_normal((4, 17, 16, 12)).astype(np.float32)
    tw = rng.uniform(0, 1, (4, 17, 1)).astype(np.float32)

    with pytest.raises(AttributeError):
        ref_loss.JointsOHKMMSELoss(use_target_weight=True)(
            torch.from_numpy(out), torch.from_numpy(tgt), torch.from_numpy(tw))

    # intended behavior: per-joint masked MSE means -> module-level ohkm
    to, tt, ttw = (torch.from_numpy(v) for v in (out, tgt, tw))
    per = []
    for idx in range(17):
        p = to[:, idx].reshape(4, -1) * ttw[:, idx]
        g = tt[:, idx].reshape(4, -1) * ttw[:, idx]
        per.append((0.5 * (p - g) ** 2).mean(dim=1, keepdim=True))
    ref_val = ref_loss.ohkm(torch.cat(per, dim=1), 8)

    got = L.joints_ohkm_mse_loss(np.transpose(out, (0, 2, 3, 1)),
                                 np.transpose(tgt, (0, 2, 3, 1)), tw)
    np.testing.assert_allclose(float(got), float(ref_val), rtol=1e-5)


def test_generate_target_parity_with_reference(rng):
    """Host target generation == reference COCODataset._generate_target."""
    from simple_hrnet_tpu.data import target as T

    # replicate reference semantics inline (COCO.py:460-515)
    def reference_impl(joints, joints_vis, heatmap_size, image_size, sigma):
        nof = joints.shape[0]
        target_weight = np.ones((nof, 1), np.float32)
        target_weight[:, 0] = joints_vis[:, 0]
        target = np.zeros((nof, heatmap_size[1], heatmap_size[0]), np.float32)
        tmp_size = sigma * 3
        for j in range(nof):
            feat_stride = np.asarray(image_size) / np.asarray(heatmap_size)
            mu_x = int(joints[j][0] / feat_stride[0] + 0.5)
            mu_y = int(joints[j][1] / feat_stride[1] + 0.5)
            ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
            br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
            if ul[0] >= heatmap_size[0] or ul[1] >= heatmap_size[1] or \
                    br[0] < 0 or br[1] < 0:
                target_weight[j] = 0
                continue
            size = int(2 * tmp_size + 1)
            x = np.arange(0, size, 1, np.float32)
            y = x[:, np.newaxis]
            x0 = y0 = size // 2
            g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
            g_x = max(0, -ul[0]), min(br[0], heatmap_size[0]) - ul[0]
            g_y = max(0, -ul[1]), min(br[1], heatmap_size[1]) - ul[1]
            img_x = max(0, ul[0]), min(br[0], heatmap_size[0])
            img_y = max(0, ul[1]), min(br[1], heatmap_size[1])
            if target_weight[j] > 0.5:
                target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                    g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
        return target, target_weight

    hm_size, img_size = (72, 96), (288, 384)
    for _ in range(5):
        joints = rng.uniform(-50, 350, (17, 2)).astype(np.float64)
        vis = (rng.uniform(0, 1, (17, 2)) > 0.3).astype(np.float64)
        vis[:, 1] = vis[:, 0]
        ref_t, ref_w = reference_impl(joints, vis, hm_size, img_size, 3)
        got_t, got_w = T.generate_target(joints, vis, hm_size, img_size, 3)
        np.testing.assert_allclose(got_t, ref_t, atol=1e-6)
        np.testing.assert_allclose(got_w, ref_w)

        # device version matches host version
        dt, dw = T.generate_target_device(
            joints[None].astype(np.float32), vis[None].astype(np.float32),
            hm_size, img_size, 3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(dt)[0], (2, 0, 1)), ref_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw)[0], ref_w)


def test_pck_accuracy_parity(rng):
    import torch
    ref_utils = __import__('tests.test_ops', fromlist=['_import_ref_utils']) \
        ._import_ref_utils()
    from simple_hrnet_tpu.utils import metrics as M

    out = rng.standard_normal((5, 17, 24, 18)).astype(np.float32)
    tgt = np.zeros((5, 17, 24, 18), np.float32)
    # plant gaussian-ish peaks (some at <=1 coords to hit the -1 path)
    for n in range(5):
        for j in range(17):
            y, x = rng.integers(0, 24), rng.integers(0, 18)
            tgt[n, j, y, x] = 1.0

    accs_r, avg_r, cnt_r, pred_r, _ = ref_utils.evaluate_pck_accuracy(
        torch.from_numpy(out), torch.from_numpy(tgt))
    accs, avg, cnt, pred, _ = M.evaluate_pck_accuracy(
        np.transpose(out, (0, 2, 3, 1)), np.transpose(tgt, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(accs), accs_r.numpy(), atol=1e-6)
    np.testing.assert_allclose(float(avg), float(avg_r), atol=1e-6)
    assert int(cnt) == int(cnt_r)
    np.testing.assert_allclose(np.asarray(pred), pred_r.numpy(), atol=1e-6)


def test_coco_ap_evaluator_sanity(rng):
    """Perfect detections -> AP 1; garbage -> AP ~0; partial in between."""
    from simple_hrnet_tpu.utils import metrics as M

    gt_ann = {'annotations': []}
    results = []
    for img in range(6):
        kp = rng.uniform(50, 200, (17, 3))
        kp[:, 2] = 2
        gt_ann['annotations'].append({
            'image_id': img, 'category_id': 1, 'iscrowd': 0,
            'keypoints': kp.flatten().tolist(), 'area': 150 * 150})
        results.append({'image_id': img, 'category_id': 1,
                        'keypoints': kp.flatten().tolist(), 'score': 0.9})
    stats = M.coco_eval_from_results(gt_ann, results)
    assert stats['AP'] > 0.99 and stats['AR'] > 0.99

    bad = [{'image_id': r['image_id'], 'category_id': 1,
            'keypoints': (np.asarray(r['keypoints']) + 500).tolist(),
            'score': 0.9} for r in results]
    stats_bad = M.coco_eval_from_results(gt_ann, bad)
    assert stats_bad['AP'] < 0.05


def test_coco_ap_analytic_case(rng):
    """Hand-computed AP: 3 GTs, 2 TPs + 1 FP ranked [TP .9, FP .8, TP .7].

    precision-over-recall after interpolation: 1.0 up to r=1/3, 2/3 up to
    r=2/3, 0 beyond -> 101-pt AP = (34*1 + 33*2/3)/101 = 56/101.
    """
    from simple_hrnet_tpu.utils import metrics as M

    def person(x0, y0):
        kp = np.zeros((17, 3))
        kp[:, 0] = x0 + np.arange(17) * 3
        kp[:, 1] = y0 + np.arange(17) * 2
        kp[:, 2] = 2
        return kp

    gts = {0: [{'keypoints': person(50, 50), 'area': 80 * 80},
               {'keypoints': person(300, 300), 'area': 80 * 80}],
           1: [{'keypoints': person(100, 100), 'area': 80 * 80}]}
    dts = {0: [{'keypoints': person(50, 50), 'score': 0.9,
                'area': 80 * 80},
               {'keypoints': person(700, 700), 'score': 0.8,
                'area': 80 * 80}],           # far-off false positive
           1: [{'keypoints': person(100, 100), 'score': 0.7,
                'area': 80 * 80}]}

    ap, ar, _ = M.coco_keypoint_ap(gts, dts, np.asarray([0.5]))
    np.testing.assert_allclose(ap, 56 / 101, atol=1e-6)
    np.testing.assert_allclose(ar, 2 / 3, atol=1e-6)


def _person_kp(x0, y0, area=80 * 80):
    kp = np.zeros((17, 3))
    kp[:, 0] = x0 + np.arange(17) * 3
    kp[:, 1] = y0 + np.arange(17) * 2
    kp[:, 2] = 2
    return kp


def test_coco_ap_ignore_semantics():
    """COCOeval semantics: a detection matched to an IGNORED gt (out of the
    area range / crowd / keypoint-less) is excluded from TP AND FP — not a
    false positive. Hand-computed: with the high-scoring ignored-matched
    detection excluded, the ranked list is [TP .9, FP .7] -> AP 1.0; the
    old remove-the-gt semantics would rank [FP .95, TP .9, FP .7] -> 0.5."""
    from simple_hrnet_tpu.utils import metrics as M

    area_rng = (1000, 10000)
    gts = {0: [{'keypoints': _person_kp(50, 50), 'area': 6400},
               {'keypoints': _person_kp(300, 300), 'area': 50000}]}  # ignored
    dts = {0: [{'keypoints': _person_kp(300, 300), 'score': 0.95,
                'area': 6400},                       # matches ignored gt
               {'keypoints': _person_kp(50, 50), 'score': 0.9,
                'area': 6400},                       # TP
               {'keypoints': _person_kp(700, 700), 'score': 0.7,
                'area': 6400}]}                      # FP
    ap, ar, _ = M.coco_keypoint_ap(gts, dts, np.asarray([0.5]),
                                   area_range=area_rng)
    np.testing.assert_allclose(ap, 1.0, atol=1e-9)
    np.testing.assert_allclose(ar, 1.0, atol=1e-9)

    # unmatched detection whose own area is outside the range -> ignored
    dts_out = {0: [{'keypoints': _person_kp(50, 50), 'score': 0.9,
                    'area': 6400},
                   {'keypoints': _person_kp(700, 700), 'score': 0.95,
                    'area': 50000}]}                 # garbage, out of range
    ap2, _, _ = M.coco_keypoint_ap(gts, dts_out, np.asarray([0.5]),
                                   area_range=area_rng)
    np.testing.assert_allclose(ap2, 1.0, atol=1e-9)

    # crowd gts are ignored AND re-matchable; keypoint-less gts ignored
    gts_c = {0: [{'keypoints': _person_kp(50, 50), 'area': 6400},
                 {'keypoints': _person_kp(50, 52), 'area': 6400,
                  'iscrowd': True},
                 {'keypoints': np.zeros((17, 3)), 'area': 6400}]}
    dts_c = {0: [{'keypoints': _person_kp(50, 50), 'score': 0.9,
                  'area': 6400},
                 {'keypoints': _person_kp(50, 52), 'score': 0.8,
                  'area': 6400},
                 {'keypoints': _person_kp(50, 52), 'score': 0.7,
                  'area': 6400}]}  # both extra dts soak into the crowd
    ap3, ar3, _ = M.coco_keypoint_ap(gts_c, dts_c, np.asarray([0.5]),
                                     area_range=area_rng)
    np.testing.assert_allclose(ap3, 1.0, atol=1e-9)
    np.testing.assert_allclose(ar3, 1.0, atol=1e-9)

    # no evaluable gt -> -1 (COCOeval empty-category convention)
    ap4, ar4, _ = M.coco_keypoint_ap({0: []}, dts, np.asarray([0.5]))
    assert ap4 == -1.0 and ar4 == -1.0


def test_coco_ap_area_splits_and_dt_area():
    """AP(M)/AP(L): each split ignores the other split's gts AND their
    matched detections (both splits evaluate to a clean 1.0); detection
    area follows pycocotools loadRes (bbox of ALL keypoints)."""
    from simple_hrnet_tpu.utils import metrics as M

    small = _person_kp(10, 10)    # kp bbox 48x32 = 1536 (medium range)
    big = _person_kp(300, 300)
    gt_ann = {'annotations': [
        {'image_id': 0, 'category_id': 1, 'iscrowd': 0,
         'keypoints': small.flatten().tolist(), 'area': 2500},      # medium
        {'image_id': 0, 'category_id': 1, 'iscrowd': 0,
         'keypoints': big.flatten().tolist(), 'area': 40000}]}      # large
    results = [
        {'image_id': 0, 'category_id': 1, 'score': 0.9,
         'keypoints': small.flatten().tolist()},
        {'image_id': 0, 'category_id': 1, 'score': 0.8,
         'keypoints': big.flatten().tolist()}]
    stats = M.coco_eval_from_results(gt_ann, results)
    np.testing.assert_allclose(stats['AP'], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats['AP (M)'], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats['AP (L)'], 1.0, atol=1e-9)
    np.testing.assert_allclose(stats['AR (M)'], 1.0, atol=1e-9)

    # _kpt_area: bbox over ALL kpts, visibility ignored (loadRes)
    kp = np.zeros((17, 3))
    kp[0] = (0, 0, 0)
    kp[1] = (10, 20, 0)
    assert M._kpt_area(kp) == 200.0


def test_bf16_train_step_loss_parity(rng):
    """Mixed-precision (bf16 compute / f32 master) step: loss matches the
    f32 step within bf16 tolerance, params stay f32 and finite."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.train import losses, steps

    params = hrnet.init(jax.random.PRNGKey(0), c=8, nof_joints=17)
    opt = steps.make_optimizer('SGD', lr=1e-3, momentum=0.9)
    batch = {
        'image': rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
        'target': rng.uniform(0, 1, (2, 16, 16, 17)).astype(np.float32),
        'target_weight': np.ones((2, 17, 1), np.float32),
    }

    outs = {}
    for tag, dt in (('f32', None), ('bf16', 'bfloat16')):
        step = steps.make_train_step(hrnet.apply, losses.joints_mse_loss,
                                     opt, donate=False, dtype=dt)
        p, _, loss, out = step(params, opt.init(params), batch)
        outs[tag] = (float(loss), p)
        assert out.dtype == jnp.float32

    l32, p32 = outs['f32']
    l16, p16 = outs['bf16']
    assert abs(l16 - l32) / max(abs(l32), 1e-8) < 2e-2
    leaf = jax.tree_util.tree_leaves(p16)[0]
    assert leaf.dtype == jnp.float32  # master params stay f32
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(p16))


def test_weight_decay_skips_bn_running_stats():
    """Running mean/var are torch *buffers* — the reference optimizer never
    decays them. Zero grads + wd>0 must leave them bit-identical while
    decaying kernels and BN scale/bias (torch's default param group)."""
    import jax
    import jax.numpy as jnp
    import optax
    from simple_hrnet_tpu.train import steps

    params = {'conv1': {'kernel': jnp.ones((3, 3, 4, 4))},
              'bn1': {'scale': jnp.ones((4,)), 'bias': jnp.ones((4,)),
                      'mean': jnp.full((4,), 0.25), 'var': jnp.full((4,), 2.0)}}
    opt = steps.make_optimizer('SGD', lr=1.0, momentum=0.0, weight_decay=1e-2)
    state = opt.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(zero_grads, state, params)
    new = optax.apply_updates(params, updates)

    np.testing.assert_array_equal(np.asarray(new['bn1']['mean']), 0.25)
    np.testing.assert_array_equal(np.asarray(new['bn1']['var']), 2.0)
    assert float(np.asarray(new['conv1']['kernel'])[0, 0, 0, 0]) < 1.0
    assert float(np.asarray(new['bn1']['scale'])[0]) < 1.0
    assert float(np.asarray(new['bn1']['bias'])[0]) < 1.0


def test_coco_ap_shared_ious_equivalence(rng):
    """compute_oks_matrices + ious= must reproduce the inline-OKS path
    exactly at every threshold set and area range (pycocotools computes
    ious once in evaluate() the same way)."""
    from simple_hrnet_tpu.utils import metrics as M

    def rand_person(img_w=640, img_h=480):
        base = rng.uniform((50, 50), (img_w - 50, img_h - 50))
        kp = np.concatenate([base + rng.normal(0, 30, (17, 2)),
                             rng.integers(0, 3, (17, 1))], axis=1)
        return kp

    gts = {}
    dts = {}
    for img in range(6):
        n_gt = int(rng.integers(0, 4))
        gts[img] = [{'keypoints': rand_person(),
                     'area': float(rng.uniform(500, 12000)),
                     'iscrowd': bool(rng.integers(0, 5) == 0),
                     'bbox': [100.0, 100.0, 120.0, 200.0]}
                    for _ in range(n_gt)]
        n_dt = int(rng.integers(0, 5))
        dts[img] = [{'keypoints': rand_person(),
                     'area': float(rng.uniform(500, 12000)),
                     'score': float(rng.uniform(0.1, 1.0))}
                    for _ in range(n_dt)]

    shared = M.compute_oks_matrices(gts, dts)
    for thrs in (None, np.asarray([0.5]), np.asarray([0.75])):
        for rng_a in ((0, 1e5 ** 2), (32 ** 2, 96 ** 2)):
            a = M.coco_keypoint_ap(gts, dts, thrs, area_range=rng_a)
            b = M.coco_keypoint_ap(gts, dts, thrs, area_range=rng_a,
                                   ious=shared)
            assert a[0] == b[0] and a[1] == b[1]
            np.testing.assert_array_equal(a[2], b[2])


def test_pckh_official_protocol():
    """'Mean' excludes pelvis/thorax (official PCKh.mask[6:8]) and the
    per-name table averages the two sides' percentages instead of pooling
    by visible count."""
    from simple_hrnet_tpu.utils import metrics as M

    n = 4
    gts = np.tile(np.arange(16, dtype=np.float64)[None, :, None] * 10,
                  (n, 1, 2))
    vis = np.ones((n, 16))
    heads = np.full(n, 10.0)

    # all perfect except pelvis (6): Mean must IGNORE the pelvis miss
    preds = gts.copy()
    preds[:, 6, :] += 1000.0
    out = M.evaluate_pckh(preds, gts, vis, heads)
    assert out['Mean'] == 1.0 and out['Pelvis'] == 0.0

    # left ankle (0) always wrong, right ankle (5) always right, but the
    # right side has 3x the visible samples: the official table averages
    # the SIDES (0.5), a visible-count pool would give 0.75
    preds2 = gts.copy()
    preds2[:, 0, :] += 1000.0
    vis2 = np.ones((n, 16))
    vis2[1:, 0] = 0  # left ankle visible once, right ankle 4x
    out2 = M.evaluate_pckh(preds2, gts, vis2, heads)
    assert out2['Ankle'] == 0.5
    # a head (9) miss DOES hit Mean
    preds3 = gts.copy()
    preds3[:, 9, :] += 1000.0
    out3 = M.evaluate_pckh(preds3, gts, vis, heads)
    assert out3['Mean'] < 1.0 and out3['Head'] == 0.0


def test_bn_momentum_threaded_into_step(rng):
    """Train's model_bn_momentum must actually reach the running-stat
    update (it was silently dropped): momentum=1.0 makes the running mean
    equal the batch mean, momentum=0.0 leaves it untouched."""
    import jax
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.train import losses, steps

    params = hrnet.init(jax.random.PRNGKey(0), c=4, nof_joints=5)
    opt = steps.make_optimizer('SGD', lr=0.0, momentum=0.0)
    batch = {
        'image': rng.standard_normal((2, 64, 64, 3)).astype(np.float32),
        'target': rng.uniform(0, 1, (2, 16, 16, 5)).astype(np.float32),
        'target_weight': np.ones((2, 5, 1), np.float32),
    }

    before = np.asarray(params['bn1']['mean'])
    outs = {}
    for m in (0.0, 1.0):
        step = steps.make_train_step(hrnet.apply, losses.joints_mse_loss,
                                     opt, donate=False, bn_momentum=m)
        p, _, _, _ = step(params, opt.init(params), batch)
        outs[m] = np.asarray(p['bn1']['mean'])
    np.testing.assert_array_equal(outs[0.0], before)   # momentum 0: frozen
    assert not np.allclose(outs[1.0], before)          # momentum 1: batch

    with pytest.raises(ValueError, match='serving-only'):
        steps.make_train_step(hrnet.apply, losses.joints_mse_loss, opt,
                              dtype='int8')
