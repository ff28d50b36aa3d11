"""Checkpoint evaluation harness (reference testing/Test.py:16-178).

Loads a checkpoint, runs the no-grad eval loop with optional flip-test
averaging, and reports mean loss + PCK accuracy.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from simple_hrnet_tpu.models import hrnet, poseresnet
from simple_hrnet_tpu.train import losses as losses_mod
from simple_hrnet_tpu.train import steps as steps_mod
from simple_hrnet_tpu.utils import checkpoint as ckpt


class Test:
    def __init__(self,
                 ds_test,
                 batch_size: int = 1,
                 num_workers: int = 4,
                 loss: str = 'JointsMSELoss',
                 checkpoint_path: Optional[str] = None,
                 model_c: int = 48,
                 model_nof_joints: int = 17,
                 model_bn_momentum: float = 0.1,
                 flip_test_images: bool = True,
                 model_name: str = 'HRNet',
                 mesh=None):
        self.ds_test = ds_test
        self.flip_test_images = flip_test_images
        self.mesh = mesh

        if model_name in ('HRNet', 'hrnet'):
            self.apply_fn = hrnet.apply
            self.params = hrnet.init(jax.random.PRNGKey(0), c=model_c,
                                     nof_joints=model_nof_joints)
        else:
            self.apply_fn = lambda p, x, **kw: poseresnet.apply(
                p, x, resnet_size=model_c, **kw)
            self.params = poseresnet.init(jax.random.PRNGKey(0),
                                          resnet_size=model_c,
                                          nof_joints=model_nof_joints)
        if checkpoint_path is not None:
            # ckpt.load returns a numpy pytree; put it on device ONCE —
            # otherwise every eval step re-uploads the full ~250 MB (W48)
            # parameter tree host->device
            self.params = jax.tree_util.tree_map(jax.numpy.asarray,
                                                 ckpt.load(checkpoint_path))

        self.loss_fn = losses_mod.get_loss(loss)
        flip_pairs = getattr(ds_test, 'flip_pairs', None) \
            if flip_test_images else None
        self._eval_step = steps_mod.make_eval_step(
            self.apply_fn, self.loss_fn, flip_pairs=flip_pairs, mesh=mesh)

        from simple_hrnet_tpu.data.loader import DataLoader
        self.dl_test = DataLoader(ds_test, batch_size=batch_size,
                                  shuffle=False, num_workers=num_workers)
        self.len_dl_test = len(self.dl_test)
        self.mean_loss_test = 0.
        self.mean_acc_test = 0.

    def _test(self):
        self.mean_loss_test = 0.
        self.mean_acc_test = 0.
        for step, (image, target, target_weight, joints_data) in enumerate(
                self.dl_test):
            batch = {'image': np.asarray(image),
                     'target': np.asarray(target),
                     'target_weight': np.asarray(target_weight)}
            true_n = batch['image'].shape[0]
            pad = 0
            if self.mesh is not None:
                # keep axis 0 mesh-divisible on the final partial batch
                # (and at the default batch_size=1) by repeating the last
                # sample; outputs are trimmed below
                pad = (-true_n) % self.mesh.shape['data']
                if pad:
                    batch = {k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)])
                        for k, v in batch.items()}
                from simple_hrnet_tpu.parallel import shard_batch
                batch = shard_batch(batch, self.mesh)
            loss, output = self._eval_step(self.params, batch)
            output = np.asarray(output)[:true_n]
            accs, avg_acc, cnt, joints_preds, joints_target = \
                self.ds_test.evaluate_accuracy(
                    output, np.asarray(batch['target'])[:true_n])
            self.mean_loss_test += float(loss)
            self.mean_acc_test += float(avg_acc)
        self.mean_loss_test /= self.len_dl_test
        self.mean_acc_test /= self.len_dl_test
        print(f'\nTest: Loss {self.mean_loss_test:f} - '
              f'Accuracy {self.mean_acc_test:f}')

    def run(self):
        self._test()
        return self.mean_loss_test, self.mean_acc_test
