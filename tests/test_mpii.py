"""MPIIDataset (data/mpii.py) — capability beyond the reference (which
ships COCO only); spec is the official MPII annotation/eval protocol."""

import json
import os

import numpy as np

import conftest  # noqa: F401  (forces CPU + sys.path)


def _make_mpii_root(tmp_path, n=3):
    import cv2

    root = tmp_path / 'MPII'
    (root / 'annot').mkdir(parents=True)
    (root / 'images').mkdir()
    rng = np.random.default_rng(0)
    annots = []
    for i in range(n):
        name = f'im{i}.jpg'
        img = rng.uniform(0, 255, (200, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(root / 'images' / name), img)
        joints = rng.uniform(40, 120, (16, 2)).round(1)
        annots.append({
            'image': name,
            'center': [80.0, 100.0],
            'scale': 0.6,
            'joints': joints.tolist(),
            'joints_vis': [1] * 16,
        })
    with open(root / 'annot' / 'train.json', 'w') as f:
        json.dump(annots, f)
    return str(root)


def test_mpii_dataset_items(tmp_path):
    from simple_hrnet_tpu.data.mpii import MPIIDataset

    root = _make_mpii_root(tmp_path)
    ds = MPIIDataset(root_path=root, data_version='train', is_train=True,
                     image_width=96, image_height=128)
    assert len(ds) == 3
    image, target, weight, meta = ds[0]
    assert image.shape == (128, 96, 3) and image.dtype == np.float32
    assert target.shape == (32, 24, 16)
    assert weight.shape == (16, 1)
    # official loading arithmetic: center.y += 15*scale, scale *= 1.25,
    # both -1 shifted
    assert abs(meta['scale'][0] * 200) > 0

    # eval mode: no aug, target peaks at the warped joint locations
    ds_val = MPIIDataset(root_path=root, data_version='train',
                         is_train=False, image_width=96, image_height=128)
    _, target, weight, meta = ds_val[1]
    j = meta['joints']
    for k in range(16):
        if weight[k, 0] > 0:
            hm = target[:, :, k]
            py, px = np.unravel_index(np.argmax(hm), hm.shape)
            assert abs(px - j[k, 0] / 4) <= 1.0
            assert abs(py - j[k, 1] / 4) <= 1.0


def test_mpii_center_scale_arithmetic(tmp_path):
    """center/scale must follow the official release's mpii.py: y-lift by
    15*s, 1.25 inflation, MATLAB -1 shift."""
    from simple_hrnet_tpu.data.mpii import MPIIDataset

    root = _make_mpii_root(tmp_path, n=1)
    ds = MPIIDataset(root_path=root, data_version='train')
    rec = ds.data[0]
    np.testing.assert_allclose(rec['center'],
                               [80.0 - 1, 100.0 + 15 * 0.6 - 1])
    np.testing.assert_allclose(rec['scale'], [0.75, 0.75])


def test_mpii_train_one_epoch(tmp_path):
    """Full MPIITrain epoch: fused step + PCK + PCKh + checkpoints."""
    from simple_hrnet_tpu.data.mpii import MPIIDataset
    from simple_hrnet_tpu.train.trainer import MPIITrain

    root = _make_mpii_root(tmp_path, n=4)
    ds = MPIIDataset(root_path=root, data_version='train', is_train=True,
                     image_width=64, image_height=64, rotate_prob=0.0)
    ds_val = MPIIDataset(root_path=root, data_version='train',
                         is_train=False, image_width=64, image_height=64)

    train = MPIITrain(exp_name='mini-mpii', ds_train=ds, ds_val=ds_val,
                      epochs=1, batch_size=2, num_workers=2,
                      lr=1e-3, lr_decay=False, optimizer='Adam',
                      log_path=str(tmp_path), use_tensorboard=False,
                      model_c=4, model_nof_joints=16,
                      flip_test_images=True, model_name='HRNet')
    train.run()
    assert 0.0 <= train.mean_mAP_val <= 1.0
    assert 'Mean' in train.val_accs


def test_mpii_pckh_eval(tmp_path):
    from simple_hrnet_tpu.data.mpii import MPIIDataset

    root = _make_mpii_root(tmp_path)
    ds = MPIIDataset(root_path=root, data_version='train', is_train=False)
    # perfect predictions -> PCKh 1.0
    preds = np.stack([np.concatenate(
        [d['joints'], np.ones((16, 1))], axis=1) for d in ds.data])
    stats, mean = ds.evaluate_overall_accuracy(
        preds, None, None, output_dir=str(tmp_path / 'out'))
    assert mean == 1.0 and stats['Mean'] == 1.0
    assert os.path.exists(tmp_path / 'out' / 'pckh_train_0.0.json')

    # push one head joint far out: only that joint drops
    preds2 = preds.copy()
    preds2[0, 9, :2] += 1000.0
    stats2, mean2 = ds.evaluate_overall_accuracy(
        preds2, None, None, output_dir=str(tmp_path / 'out'))
    assert mean2 < 1.0 and stats2['Ankle'] == 1.0


def test_mpii_pckh_index_matched_eval(tmp_path):
    """PCKh matches predictions to annotations by dataset row id: a
    shuffled prediction order with indices gives the same (perfect)
    score, while positional matching of the same shuffle degrades —
    the bug class MPIITrain hit with its shuffled train loader."""
    from simple_hrnet_tpu.data.mpii import MPIIDataset

    root = _make_mpii_root(tmp_path, n=4)
    ds = MPIIDataset(root_path=root, data_version='train', is_train=False)
    preds = np.stack([np.concatenate(
        [d['joints'], np.ones((16, 1))], axis=1) for d in ds.data])

    perm = np.asarray([2, 0, 3, 1])
    stats, mean = ds.evaluate_overall_accuracy(
        preds[perm], None, None, output_dir=str(tmp_path / 'o'),
        indices=perm)
    assert mean == 1.0

    stats_pos, mean_pos = ds.evaluate_overall_accuracy(
        preds[perm], None, None, output_dir=str(tmp_path / 'o'))
    assert mean_pos < 1.0  # positional matching scores the wrong samples


def test_mpii_train_shuffled_pckh(tmp_path):
    """MPIITrain's train-set PCKh must survive the shuffled drop_last
    loader: every batch carries joints_data['index'] and the trainer
    evaluates against those rows."""
    from simple_hrnet_tpu.data.mpii import MPIIDataset
    from simple_hrnet_tpu.train.trainer import MPIITrain

    root = _make_mpii_root(tmp_path, n=6)
    ds_tr = MPIIDataset(root_path=root, data_version='train', is_train=True,
                        image_width=64, image_height=64)
    ds_val = MPIIDataset(root_path=root, data_version='train',
                         is_train=False, image_width=64, image_height=64)
    t = MPIITrain('idx_t', ds_tr, ds_val, epochs=1, batch_size=4,
                  num_workers=0, model_c=16, model_nof_joints=16,
                  use_tensorboard=False, flip_test_images=False,
                  log_path=str(tmp_path / 'logs'), lr=1e-4, seed=3)
    t.run()
    # after run() the accumulator holds the LAST phase (val: ordered,
    # no drop_last -> all 6 rows in dataset order)
    assert t._indices == list(range(6))
    # the train phase (shuffled drop_last -> some 4 of the 6 rows) must
    # still have produced a well-defined PCKh via its collected indices
    assert 0.0 <= t.mean_mAP_train <= 1.0
    assert 0.0 <= t.mean_mAP_val <= 1.0
