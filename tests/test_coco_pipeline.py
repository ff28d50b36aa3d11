"""End-to-end COCO pipeline on a synthetic mini-dataset: dataset semantics,
loader, one full COCOTrain epoch with COCO AP eval, and the Test harness."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def mini_coco(tmp_path_factory):
    """4-image COCO-format keypoint dataset written to disk."""
    import cv2

    root = tmp_path_factory.mktemp('coco')
    (root / 'train2017').mkdir()
    (root / 'annotations').mkdir()

    rng = np.random.default_rng(0)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 120, 160
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(root / 'train2017' / ('%012d.jpg' % img_id)), img)
        images.append({'id': img_id, 'width': w, 'height': h,
                       'file_name': '%012d.jpg' % img_id})
        for _ in range(2):  # two people per image
            x, y = rng.integers(5, 60, 2)
            bw, bh = rng.integers(40, 70, 2)
            kpts = []
            for j in range(17):
                kx = float(np.clip(x + rng.uniform(0, bw), 0, w - 1))
                ky = float(np.clip(y + rng.uniform(0, bh), 0, h - 1))
                kpts.extend([kx, ky, 2])
            annotations.append({
                'id': ann_id, 'image_id': img_id, 'category_id': 1,
                'iscrowd': 0, 'bbox': [float(x), float(y), float(bw),
                                       float(bh)],
                'area': float(bw * bh), 'keypoints': kpts,
                'num_keypoints': 17})
            ann_id += 1

    with open(root / 'annotations' / 'person_keypoints_train2017.json',
              'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{'id': 1, 'name': 'person'}]}, f)
    return str(root)


def test_dataset_item_semantics(mini_coco):
    from simple_hrnet_tpu.data.coco import COCODataset

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)
    assert len(ds) == 8  # 4 images x 2 people
    image, target, target_weight, meta = ds[0]
    assert image.shape == (64, 64, 3)          # NHWC item (H, W, C)
    assert target.shape == (16, 16, 17)
    assert target_weight.shape == (17, 1)
    assert np.isfinite(image).all()
    # gaussian peaks are 1 where visible
    visible = target_weight[:, 0] > 0.5
    assert target.transpose(2, 0, 1)[visible].max() == pytest.approx(1.0)
    # center/scale follow the pixel_std 200, *1.25 convention
    assert meta['scale'].shape == (2,)


def test_dataset_augmentation_randomness(mini_coco):
    from simple_hrnet_tpu.data.coco import COCODataset

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=True, image_width=64, image_height=64,
                     half_body_prob=0.5, flip_prob=0.5, rotate_prob=0.5)
    a = ds[0][0]
    imgs = [ds[0][0] for _ in range(8)]
    assert any(not np.allclose(a, b) for b in imgs)  # aug actually applied


def test_loader_batches_and_order(mini_coco):
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.data.loader import DataLoader

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)
    dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3  # 8 items -> 3+3+2
    image, target, tw, meta = batches[0]
    assert image.shape == (3, 64, 64, 3)
    assert target.shape == (3, 16, 16, 17)
    assert isinstance(meta['imgPath'], list)
    assert meta['center'].shape == (3, 2)

    # worker errors propagate
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError('boom')

    with pytest.raises(RuntimeError, match='boom'):
        list(DataLoader(Broken(), batch_size=2))


def test_loader_process_workers(mini_coco):
    """use_processes=True (the reference's num_workers subprocess model,
    Train.py:212-218) yields identical batches to the threaded loader."""
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.data.loader import DataLoader

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)
    threaded = list(DataLoader(ds, batch_size=3, shuffle=True, seed=7,
                               num_workers=2))
    procs = list(DataLoader(ds, batch_size=3, shuffle=True, seed=7,
                            num_workers=2, use_processes=True))
    assert len(procs) == len(threaded)
    for (img_t, tgt_t, _, _), (img_p, tgt_p, _, _) in zip(threaded, procs):
        np.testing.assert_array_equal(img_p, img_t)
        np.testing.assert_array_equal(tgt_p, tgt_t)


def test_loader_abandoned_iteration_stops_producer():
    """Breaking out of iteration early must unblock the producer thread
    (timed put re-checks the stop event) — no leaked thread per epoch."""
    import threading
    import time
    from simple_hrnet_tpu.data.loader import DataLoader

    class Tiny:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.full((4,), i, np.float32)

    before = threading.active_count()
    for _ in range(3):
        it = iter(DataLoader(Tiny(), batch_size=2, prefetch_batches=1))
        next(it)
        it.close()  # consumer abandons -> generator finally -> stop.set()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_coco_train_one_epoch(mini_coco, tmp_path):
    """Full COCOTrain epoch: fused step + PCK + COCO AP + checkpoints."""
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.train.trainer import COCOTrain

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=True, image_width=64, image_height=64,
                     half_body_prob=0.0, rotate_prob=0.0)
    ds_val = COCODataset(root_path=mini_coco, data_version='train2017',
                         is_train=False, image_width=64, image_height=64)

    train = COCOTrain(exp_name='mini', ds_train=ds, ds_val=ds_val,
                      epochs=1, batch_size=4, num_workers=2,
                      lr=1e-3, lr_decay=False, optimizer='Adam',
                      log_path=str(tmp_path), use_tensorboard=True,
                      model_c=4, model_nof_joints=17,
                      flip_test_images=True, model_name='HRNet')
    train.run()

    assert np.isfinite(train.mean_loss_train)
    assert np.isfinite(train.mean_loss_val)
    assert 0.0 <= train.mean_mAP_val <= 1.0
    files = os.listdir(train.log_path)
    assert 'params_last.npz' in files
    assert 'parameters.txt' in files
    assert any(f.startswith('checkpoint_last') for f in files)

    # the saved params drive the Test harness
    from simple_hrnet_tpu.train.test import Test
    t = Test(ds_test=ds_val, batch_size=4, num_workers=2,
             checkpoint_path=os.path.join(train.log_path, 'params_last.npz'),
             model_c=4, model_nof_joints=17)
    loss, acc = t.run()
    assert np.isfinite(loss)


def test_trainer_checkpoint_resume(mini_coco, tmp_path):
    """Stop after epoch 1, resume from the orbax checkpoint, continue."""
    import jax
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.train.trainer import Train
    from simple_hrnet_tpu.utils import checkpoint as ckpt

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)

    t1 = Train(exp_name='resume', ds_train=ds, ds_val=ds, epochs=1,
               batch_size=4, num_workers=2, lr=1e-3, lr_decay=False,
               optimizer='Adam', log_path=str(tmp_path),
               use_tensorboard=False, model_c=4, model_nof_joints=17,
               flip_test_images=False)
    t1.run()
    ckpt_dir = os.path.join(t1.log_path, 'checkpoint_last')
    assert os.path.isdir(ckpt_dir)

    t2 = Train(exp_name='resume2', ds_train=ds, ds_val=ds, epochs=2,
               batch_size=4, num_workers=2, lr=1e-3, lr_decay=False,
               optimizer='Adam', log_path=str(tmp_path),
               use_tensorboard=False, model_c=4, model_nof_joints=17,
               flip_test_images=False, checkpoint_path=ckpt_dir)
    assert t2.epoch == 1  # resumed epoch counter
    # best-metric state survives the resume, so the first post-resume
    # epoch can't silently overwrite params_best_* with a worse model
    assert t2.best_loss == t1.best_loss
    assert t2.best_acc == t1.best_acc
    # resumed params identical to saved ones
    a = jax.tree_util.tree_leaves(t1.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    t2.run()  # finishes epoch 2 without error
    assert np.isfinite(t2.mean_loss_val)


def test_dataset_with_detector_bboxes(mini_coco, tmp_path):
    """use_gt_bboxes=False loads pre-detected boxes from a pickle
    (reference COCO.py:136-150) and yields null joints."""
    import pickle
    from simple_hrnet_tpu.data.coco import COCODataset

    bboxes = {img_id: [{'id': 100 + img_id,
                        'clean_bbox': np.array([10.0, 10.0, 50.0, 60.0]),
                        'score': 0.8}]
              for img_id in range(1, 5)}
    bbox_path = str(tmp_path / 'bboxes.pkl')
    with open(bbox_path, 'wb') as f:
        pickle.dump(bboxes, f)

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, use_gt_bboxes=False, bbox_path=bbox_path,
                     image_width=64, image_height=64)
    assert len(ds) == 4  # one detection per image
    image, target, target_weight, meta = ds[0]
    assert image.shape == (64, 64, 3)
    # null joints -> gaussian stamped at origin-quantized positions but
    # visibility weights all derive from the (default ones) visibility
    assert target.shape == (16, 16, 17)


def test_evaluate_accuracy_with_params(mini_coco):
    from simple_hrnet_tpu.data.coco import COCODataset

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)
    out = np.random.default_rng(0).standard_normal(
        (2, 16, 16, 17)).astype(np.float32)
    accs, avg, cnt, pred, gt = ds.evaluate_accuracy(
        out, out, params={'hm_type': 'gaussian', 'thr': 0.3})
    assert float(avg) == 1.0  # identical tensors -> perfect PCK


def test_native_decode_path_matches_cv2(mini_coco):
    """Native fused JPEG->warp->normalize == the cv2 pipeline (tolerance:
    JPEG IDCT and fixed-point-interp differences are sub-LSB)."""
    from simple_hrnet_tpu.data import native as native_img
    if not native_img.available():
        pytest.skip('libimgproc.so not built')

    from simple_hrnet_tpu.data.coco import COCODataset

    kwargs = dict(root_path=mini_coco, data_version='train2017',
                  is_train=False, image_width=64, image_height=64)
    ds_cv = COCODataset(**kwargs)
    ds_nat = COCODataset(use_native_decode=True, **kwargs)

    for idx in (0, 3):
        img_cv, tgt_cv, tw_cv, _ = ds_cv[idx]
        img_nat, tgt_nat, tw_nat, _ = ds_nat[idx]
        assert img_nat.shape == img_cv.shape
        # normalized-space tolerance ~ (2/255)/std
        assert np.abs(img_nat - img_cv).mean() < 0.02
        assert np.quantile(np.abs(img_nat - img_cv), 0.99) < 0.15
        np.testing.assert_allclose(tgt_nat, tgt_cv, atol=1e-6)


def test_native_decode_with_flip_augmentation(mini_coco):
    """Fused native path with flip folded into the warp matrix == the cv2
    path with identical augmentation draws (seeded python RNG)."""
    import random
    from simple_hrnet_tpu.data import native as native_img
    if not native_img.available():
        pytest.skip('libimgproc.so not built')

    from simple_hrnet_tpu.data.coco import COCODataset

    kwargs = dict(root_path=mini_coco, data_version='train2017',
                  is_train=True, image_width=64, image_height=64,
                  flip_prob=1.0, rotate_prob=1.0, half_body_prob=0.0)
    ds_nat = COCODataset(use_native_decode=True, **kwargs)
    ds_cv = COCODataset(**kwargs)

    random.seed(7)
    img, tgt, tw, meta = ds_nat[0]
    random.seed(7)
    img_cv, tgt_cv, tw_cv, meta_cv = ds_cv[0]
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert np.abs(img - img_cv).mean() < 0.02  # sub-LSB decode/interp diffs
    np.testing.assert_allclose(tgt, tgt_cv, atol=1e-6)
    np.testing.assert_allclose(meta['joints'], meta_cv['joints'], atol=1e-4)


def test_mesh_eval_partial_batches(mini_coco, tmp_path):
    """Validation/Test under a mesh must survive batches whose size isn't
    mesh-divisible: the final partial val batch, and Test's default
    batch_size=1. The harness pads by repeating the last sample and trims
    the outputs (loss for that one batch includes the duplicates)."""
    from simple_hrnet_tpu.data.coco import COCODataset
    from simple_hrnet_tpu.parallel import make_mesh
    from simple_hrnet_tpu.train.test import Test
    from simple_hrnet_tpu.train.trainer import Train

    ds = COCODataset(root_path=mini_coco, data_version='train2017',
                     is_train=False, image_width=64, image_height=64)
    ds_val = COCODataset(root_path=mini_coco, data_version='train2017',
                         is_train=False, image_width=64, image_height=64)
    ds_val.data = ds_val.data[:5]  # 5 % 8 != 0 -> one partial batch

    mesh = make_mesh(8)
    t = Train(exp_name='meshpad', ds_train=ds, ds_val=ds_val, epochs=1,
              batch_size=8, num_workers=0, lr=1e-3, lr_decay=False,
              optimizer='Adam', log_path=str(tmp_path),
              use_tensorboard=False, model_c=4, model_nof_joints=17,
              flip_test_images=False, mesh=mesh)
    t.run()
    assert np.isfinite(t.mean_loss_val)
    # base Train never produced an overall-mAP metric: no best_mAP file
    assert 'params_best_mAP.npz' not in os.listdir(t.log_path)
    assert 'params_best_loss.npz' in os.listdir(t.log_path)

    tst = Test(ds_val, batch_size=1, num_workers=0, model_c=4,
               model_nof_joints=17, flip_test_images=False, mesh=mesh)
    loss, acc = tst.run()  # every batch is 1 -> padded to 8 each step
    assert np.isfinite(loss) and 0.0 <= acc <= 1.0
