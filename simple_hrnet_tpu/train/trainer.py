"""Training harness — Train / COCOTrain (reference training/Train.py:19-372,
training/COCO.py:11-262) rebuilt around jitted XLA train steps.

Per epoch: jitted fused train step over the prefetching loader, PCK + COCO
AP (OKS-NMS + evaluator) accumulation, flip-test validation, multistep LR,
tensorboard scalars/image grids, and checkpoints for last/best loss/acc/mAP.
Runs single-device or data-parallel over a mesh (the reference never had
distributed training; here it is one constructor arg).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet, poseresnet
from simple_hrnet_tpu.ops import decode as D
from simple_hrnet_tpu.train import losses as losses_mod
from simple_hrnet_tpu.train import steps as steps_mod
from simple_hrnet_tpu.utils import checkpoint as ckpt


class Train:
    """Generic trainer with the reference's constructor surface
    (Train.py:29-57) plus ``mesh`` for data parallelism."""

    def __init__(self,
                 exp_name: str,
                 ds_train,
                 ds_val,
                 epochs: int = 210,
                 batch_size: int = 16,
                 num_workers: int = 4,
                 loss: str = 'JointsMSELoss',
                 lr: float = 0.001,
                 lr_decay: bool = True,
                 lr_decay_steps=(170, 200),
                 lr_decay_gamma: float = 0.1,
                 optimizer: str = 'Adam',
                 weight_decay: float = 0.,
                 momentum: float = 0.9,
                 nesterov: bool = False,
                 pretrained_weight_path: Optional[str] = None,
                 checkpoint_path: Optional[str] = None,
                 log_path: str = './logs',
                 use_tensorboard: bool = True,
                 model_c: int = 48,
                 model_nof_joints: int = 17,
                 model_bn_momentum: float = 0.1,
                 flip_test_images: bool = True,
                 model_name: str = 'HRNet',
                 mesh=None,
                 seed: int = 0,
                 resume_dir: Optional[str] = None,
                 debug_nans: bool = False,
                 dtype: Optional[str] = None,
                 use_grouped_trunk: bool = False,
                 use_process_workers: bool = False,
                 device_targets: bool = False):
        self.exp_name = exp_name
        self.ds_train = ds_train
        self.ds_val = ds_val
        self.epochs = epochs
        self.batch_size = batch_size
        self.loss_name = loss
        self.model_c = model_c
        self.model_nof_joints = model_nof_joints
        self.model_bn_momentum = model_bn_momentum
        self.flip_test_images = flip_test_images
        self.mesh = mesh
        self.epoch = 0

        ts = datetime.now().strftime('%Y%m%d_%H%M')
        self.log_path = os.path.join(log_path, f'{ts}_{exp_name}')
        os.makedirs(self.log_path, exist_ok=True)

        self.use_tensorboard = use_tensorboard
        self.summary_writer = None
        if use_tensorboard:
            import tensorboardX
            self.summary_writer = tensorboardX.SummaryWriter(self.log_path)

        parameters = {k: v for k, v in locals().items()
                      if k not in ('self', 'ds_train', 'ds_val')}
        with open(os.path.join(self.log_path, 'parameters.txt'), 'w') as fd:
            fd.write(str(parameters))
        if self.summary_writer is not None:
            self.summary_writer.add_text('parameters', str(parameters))

        # model
        if model_name in ('HRNet', 'hrnet'):
            if use_grouped_trunk:
                # block-diagonal batch-halves trunk, differentiable packing
                # + pooled-BN batch stats (train/grouped.py) — same params
                # tree, faster MXU shapes; requires batch % group == 0
                from simple_hrnet_tpu.train import grouped as grouped_mod
                group = min(4, max(2, 128 // model_c))
                if batch_size % group:
                    raise ValueError(
                        f'use_grouped_trunk needs batch_size divisible by '
                        f'{group} (got {batch_size})')
                self.apply_fn = grouped_mod.make_apply(group)
            else:
                self.apply_fn = hrnet.apply
            self.params = hrnet.init(jax.random.PRNGKey(seed), c=model_c,
                                     nof_joints=model_nof_joints)
        else:
            self.apply_fn = lambda p, x, **kw: poseresnet.apply(
                p, x, resnet_size=model_c, **kw)
            self.params = poseresnet.init(jax.random.PRNGKey(seed),
                                          resnet_size=model_c,
                                          nof_joints=model_nof_joints)

        self.loss_fn = losses_mod.get_loss(loss)

        # optional imagenet-pretrained weights (strict=False analogue:
        # merge leaves that exist with matching shapes, Train.py:183-191)
        if pretrained_weight_path is not None:
            pre = ckpt.load(pretrained_weight_path)
            self.params = _merge_matching(self.params, pre)
            print(f'Pre-trained weights loaded from {pretrained_weight_path}')

        from simple_hrnet_tpu.data.loader import DataLoader
        self.dl_train = DataLoader(ds_train, batch_size=batch_size,
                                   shuffle=True, num_workers=num_workers,
                                   drop_last=True, seed=seed,
                                   use_processes=use_process_workers)
        self.dl_val = DataLoader(ds_val, batch_size=batch_size,
                                 shuffle=False, num_workers=num_workers,
                                 use_processes=use_process_workers)
        self.len_dl_train = len(self.dl_train)
        self.len_dl_val = len(self.dl_val)

        self.optimizer = steps_mod.make_optimizer(
            optimizer, lr=lr, momentum=momentum, nesterov=nesterov,
            weight_decay=weight_decay, lr_decay=lr_decay,
            lr_decay_steps=lr_decay_steps, lr_decay_gamma=lr_decay_gamma,
            steps_per_epoch=self.len_dl_train)
        self.opt_state = self.optimizer.init(self.params)

        # sanitizer: fail fast on non-finite values anywhere in the step
        # (the reference has no sanitizing at all, SURVEY.md §5.2)
        if debug_nans:
            jax.config.update('jax_debug_nans', True)

        # checkpoint resume (Train.py:195-204). ``resume_dir`` additionally
        # enables crash-safe auto-resume: if a previous run of this
        # experiment left a checkpoint_last, continue from it (the
        # reference requires manual --checkpoint_path plumbing).
        if checkpoint_path is None and resume_dir is not None:
            cand = os.path.join(resume_dir, 'checkpoint_last')
            if os.path.isdir(cand):
                checkpoint_path = cand
        if checkpoint_path is not None:
            print(f'Loading checkpoint {checkpoint_path} ...')
            step, self.params, self.opt_state, cfg = ckpt.load_train(
                checkpoint_path, target_params=self.params,
                target_opt_state=self.opt_state)
            self.epoch = (cfg or {}).get('epoch', step or 0)
            print(f'Resuming from epoch {self.epoch}')

        # device_targets: the datasets emit the raw pipeline tail
        # (RAW [0, 255] image off the host warp, joints, joints_vis) and
        # ImageNet normalize + gaussian target generation run inside the
        # jitted step (steps.py:_batch_inputs) — the host sheds per-sample
        # normalize, the 470 KB/sample target stamp/collate, and its
        # transfer
        self.device_targets = device_targets
        dt_cfg = dt_cfg_val = None
        if device_targets:
            if not getattr(ds_train, 'device_targets', False) or (
                    ds_val is not None
                    and not getattr(ds_val, 'device_targets', False)):
                raise ValueError(
                    'Train(device_targets=True) needs BOTH datasets built '
                    'with device_targets=True (they must emit the raw '
                    'pipeline tail); a host-target ds_val would fail with '
                    'an opaque shape error inside the jitted eval step')

            def _dt_cfg(ds):
                # each step stamps targets with ITS dataset's geometry —
                # ds_val may differ from ds_train in sigma/joints_weight
                jw = ds.joints_weight \
                    if getattr(ds, 'use_different_joints_weight', False) \
                    else None
                return {
                    'heatmap_size': tuple(ds.heatmap_size),
                    'image_size': tuple(ds.image_size),
                    'heatmap_sigma': ds.heatmap_sigma,
                    'joints_weight': None if jw is None
                    else np.asarray(jw, np.float32),
                }

            dt_cfg = _dt_cfg(ds_train)
            dt_cfg_val = _dt_cfg(ds_val) if ds_val is not None else dt_cfg

        # bf16 conv compute with f32 master params when dtype='bfloat16';
        # donated buffers let XLA update params/opt_state in place
        self._train_step = steps_mod.make_train_step(
            self.apply_fn, self.loss_fn, self.optimizer, mesh=mesh,
            donate=True, dtype=dtype, device_targets=dt_cfg,
            bn_momentum=model_bn_momentum)
        flip_pairs = getattr(ds_val, 'flip_pairs', None) \
            if flip_test_images else None
        self._eval_step = steps_mod.make_eval_step(
            self.apply_fn, self.loss_fn, flip_pairs=flip_pairs, mesh=mesh,
            dtype=dtype, device_targets=dt_cfg_val)

        if mesh is not None:
            from simple_hrnet_tpu.parallel import replicate
            self.params = replicate(self.params, mesh)
            self.opt_state = replicate(self.opt_state, mesh)

        # best-metric state is restored from the checkpoint on resume so a
        # post-resume epoch can't silently overwrite params_best_*.npz with
        # a worse model (the bests would otherwise reset to None)
        resumed = cfg if checkpoint_path is not None else {}
        self.best_loss = (resumed or {}).get('best_loss')
        self.best_acc = (resumed or {}).get('best_acc')
        self.best_mAP = (resumed or {}).get('best_mAP')
        self.mean_loss_train = 0.
        self.mean_acc_train = 0.
        self.mean_loss_val = 0.
        self.mean_acc_val = 0.
        # None until a subclass actually computes an overall metric —
        # the base trainer must not emit a params_best_mAP.npz for a
        # metric it never produced
        self.mean_mAP_val = None

    # -- hooks for subclasses ----------------------------------------------

    def _make_batch(self, image, second, third):
        """Assemble the step's batch dict. Host-target mode: (image, target,
        target_weight); device_targets mode: (raw [0, 255] image, joints,
        joints_vis) — the step normalizes the image and stamps targets
        in-graph and returns them (ops/image.py convention)."""
        if self.device_targets:
            batch = {'image': np.asarray(image),
                     'joints': np.asarray(second),
                     'joints_vis': np.asarray(third)}
        else:
            batch = {'image': np.asarray(image),
                     'target': np.asarray(second),
                     'target_weight': np.asarray(third)}
        if self.mesh is not None:
            from simple_hrnet_tpu.parallel import shard_batch
            batch = shard_batch(batch, self.mesh)
        return batch

    def _train(self):
        self.mean_loss_train = 0.
        self.mean_acc_train = 0.
        for step, (image, second, third, joints_data) in enumerate(
                self.dl_train):
            batch = self._make_batch(image, second, third)
            if self.device_targets:
                (self.params, self.opt_state, loss, output,
                 target) = self._train_step(self.params, self.opt_state,
                                            batch)
            else:
                self.params, self.opt_state, loss, output = self._train_step(
                    self.params, self.opt_state, batch)
                target = batch['target']

            accs, avg_acc, cnt, joints_preds, joints_target = \
                self.ds_train.evaluate_accuracy(output, target)
            loss = float(loss)
            avg_acc = float(avg_acc)
            self.mean_loss_train += loss
            self.mean_acc_train += avg_acc
            self._log_step('train', step, loss, avg_acc, image, target,
                           joints_target, output, joints_preds, joints_data)
        self.mean_loss_train /= self.len_dl_train
        self.mean_acc_train /= self.len_dl_train
        print(f'\nTrain: Loss {self.mean_loss_train:f} - '
              f'Accuracy {self.mean_acc_train:f}')

    def _val(self):
        self.mean_loss_val = 0.
        self.mean_acc_val = 0.
        for step, (image, second, third, joints_data) in enumerate(
                self.dl_val):
            # the val loader keeps the final partial batch (no drop_last);
            # under a mesh its axis 0 must stay divisible by the data axis,
            # so pad by repeating the last sample and trim the outputs —
            # only that one batch's logged loss includes the duplicates
            true_n = np.asarray(image).shape[0]
            pad = 0
            if self.mesh is not None:
                pad = (-true_n) % self.mesh.shape['data']
                if pad:
                    image, second, third = (
                        np.concatenate(
                            [np.asarray(a),
                             np.repeat(np.asarray(a)[-1:], pad, axis=0)])
                        for a in (image, second, third))
            batch = self._make_batch(image, second, third)
            if self.device_targets:
                loss, output, target = self._eval_step(self.params, batch)
            else:
                loss, output = self._eval_step(self.params, batch)
                target = batch['target']
            if pad:
                image = np.asarray(image)[:true_n]
                output = np.asarray(output)[:true_n]
                target = np.asarray(target)[:true_n]
            accs, avg_acc, cnt, joints_preds, joints_target = \
                self.ds_val.evaluate_accuracy(output, target)
            self.mean_loss_val += float(loss)
            self.mean_acc_val += float(avg_acc)
            self._log_step('val', step, float(loss), float(avg_acc), image,
                           target, joints_target, output, joints_preds,
                           joints_data)
        self.mean_loss_val /= self.len_dl_val
        self.mean_acc_val /= self.len_dl_val
        print(f'\nValidation: Loss {self.mean_loss_val:f} - '
              f'Accuracy {self.mean_acc_val:f}')

    def _log_step(self, prefix, step, loss, acc, image, target,
                  joints_target, output, joints_preds, joints_data):
        if self.summary_writer is None:
            return
        steps_per = self.len_dl_train if prefix == 'train' else self.len_dl_val
        global_step = step + self.epoch * steps_per
        self.summary_writer.add_scalar(f'{prefix}_loss', loss, global_step)
        self.summary_writer.add_scalar(f'{prefix}_acc', acc, global_step)
        if step == 0:
            from simple_hrnet_tpu.utils.visualization import save_images
            if self.device_targets:
                # the raw pipeline tail is in [0, 255]; save_images
                # denormalizes assuming ImageNet-normalized input
                from simple_hrnet_tpu.data.coco import INV255_STD, MEAN255
                image = (np.asarray(image) - MEAN255) * INV255_STD
            save_images(image, np.asarray(target), np.asarray(joints_target),
                        np.asarray(output), np.asarray(joints_preds),
                        joints_data['joints_visibility'],
                        self.summary_writer, step=global_step,
                        prefix=f'{prefix}_')

    def _checkpoint(self):
        """last + best loss/acc/mAP (Train.py:313-332), orbax + npz params."""
        if self.best_loss is None or self.best_loss > self.mean_loss_val:
            self.best_loss = self.mean_loss_val
            print(f'best_loss {self.best_loss:f} at epoch {self.epoch + 1}')
            ckpt.save(os.path.join(self.log_path, 'params_best_loss.npz'),
                      self.params)
        if self.best_acc is None or self.best_acc < self.mean_acc_val:
            self.best_acc = self.mean_acc_val
            print(f'best_acc {self.best_acc:f} at epoch {self.epoch + 1}')
            ckpt.save(os.path.join(self.log_path, 'params_best_acc.npz'),
                      self.params)
        # mAP best only when the trainer actually produced the metric
        # (COCOTrain/MPIITrain set mean_mAP_val; base Train leaves None)
        if self.mean_mAP_val is not None and (
                self.best_mAP is None or self.best_mAP < self.mean_mAP_val):
            self.best_mAP = self.mean_mAP_val
            print(f'best_mAP {self.best_mAP:f} at epoch {self.epoch + 1}')
            ckpt.save(os.path.join(self.log_path, 'params_best_mAP.npz'),
                      self.params)

        # checkpoint_last carries the UPDATED bests so auto-resume keeps
        # guarding the params_best_*.npz files
        ckpt.save_train(os.path.join(self.log_path, 'checkpoint_last'),
                        self.epoch + 1, self.params, self.opt_state,
                        config={'epoch': self.epoch + 1,
                                'model_c': self.model_c,
                                'nof_joints': self.model_nof_joints,
                                'best_loss': self.best_loss,
                                'best_acc': self.best_acc,
                                'best_mAP': self.best_mAP})
        ckpt.save(os.path.join(self.log_path, 'params_last.npz'), self.params)

    def run(self):
        """Epoch loop (Train.py:334-370)."""
        for self.epoch in range(self.epoch, self.epochs):
            print(f'\nEpoch {self.epoch + 1} of {self.epochs} '
                  f'@ {datetime.now().strftime("%Y-%m-%d %H:%M:%S")}')
            self._train()
            self._val()
            self._checkpoint()


class COCOTrain(Train):
    """COCO-specific trainer adding per-epoch COCO AP (training/COCO.py:11)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._reset_epoch_preds()

    def _reset_epoch_preds(self):
        self._all_preds = []
        self._all_boxes = []
        self._image_paths = []

    def _accumulate(self, output, joints_data):
        c = np.asarray(joints_data['center'])
        s = np.asarray(joints_data['scale'])
        score = np.asarray(joints_data['score'])
        preds, maxvals = D.get_final_preds(np.asarray(output), c, s, 200.0)
        preds = np.asarray(preds)
        maxvals = np.asarray(maxvals)
        n = preds.shape[0]
        boxes = np.zeros((n, 6), np.float32)
        boxes[:, 0:2] = c
        boxes[:, 2:4] = s
        boxes[:, 4] = np.prod(s * 200.0, axis=1)
        boxes[:, 5] = score
        self._all_preds.append(
            np.concatenate([preds, maxvals], axis=2).astype(np.float32))
        self._all_boxes.append(boxes)
        self._image_paths.extend(list(joints_data['imgPath']))

    def _log_step(self, prefix, step, loss, acc, image, target,
                  joints_target, output, joints_preds, joints_data):
        super()._log_step(prefix, step, loss, acc, image, target,
                          joints_target, output, joints_preds, joints_data)
        self._accumulate(output, joints_data)

    def _train(self):
        self._reset_epoch_preds()
        super()._train()
        print('\nTrain AP/AR')
        self.train_accs, self.mean_mAP_train = self._overall(self.ds_train)

    def _val(self):
        self._reset_epoch_preds()
        super()._val()
        print('\nVal AP/AR')
        self.val_accs, self.mean_mAP_val = self._overall(self.ds_val)

    def _overall(self, ds):
        if not self._all_preds:
            return {}, 0.0
        preds = np.concatenate(self._all_preds)
        boxes = np.concatenate(self._all_boxes)
        return ds.evaluate_overall_accuracy(
            preds, boxes, self._image_paths, output_dir=self.log_path)


class MPIITrain(COCOTrain):
    """MPII trainer: identical epoch-pred accumulation (final preds in
    original image coordinates), but the dataset's overall metric is
    PCKh@0.5 (data/mpii.py) instead of COCO AP. Predictions are matched
    to their annotations by the dataset row id each batch carries
    (joints_data['index']), so the metric survives the shuffled drop_last
    train loader; train-mode PCKh remains approximate for flipped/rotated
    samples (the un-warp ignores the augmentation, like the reference's
    train-AP accumulation) — the val number is the meaningful one."""

    def _reset_epoch_preds(self):
        super()._reset_epoch_preds()
        self._indices = []

    def _accumulate(self, output, joints_data):
        super()._accumulate(output, joints_data)
        if 'index' in joints_data:
            self._indices.extend(
                int(i) for i in np.asarray(joints_data['index']).ravel())

    def _overall(self, ds):
        if not self._all_preds:
            return {}, 0.0
        preds = np.concatenate(self._all_preds)
        boxes = np.concatenate(self._all_boxes)
        idx = self._indices if len(self._indices) == len(preds) else None
        return ds.evaluate_overall_accuracy(
            preds, boxes, self._image_paths, output_dir=self.log_path,
            indices=idx)

    def _train(self):
        self._reset_epoch_preds()
        Train._train(self)
        print('\nTrain PCKh@0.5')
        self.train_accs, self.mean_mAP_train = self._overall(self.ds_train)

    def _val(self):
        self._reset_epoch_preds()
        Train._val(self)
        print('\nVal PCKh@0.5')
        self.val_accs, self.mean_mAP_val = self._overall(self.ds_val)


def _merge_matching(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    """Copy leaves from src whose path+shape match dst (strict=False load)."""
    if not isinstance(dst, dict):
        return dst
    out = {}
    for k, v in dst.items():
        if isinstance(v, dict):
            out[k] = _merge_matching(v, src.get(k, {}) if isinstance(src, dict)
                                     else {})
        else:
            sv = src.get(k) if isinstance(src, dict) else None
            if sv is not None and hasattr(sv, 'shape') and \
                    tuple(sv.shape) == tuple(v.shape):
                out[k] = jnp.asarray(sv)
            else:
                out[k] = v
    return out
