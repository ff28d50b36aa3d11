"""Training losses — JointsMSE and OHKM-MSE (reference losses/loss.py).

Vectorized jnp ports of the reference semantics:

  * ``joints_mse_loss``  — per-joint 0.5*MSE on flattened heatmaps, masked by
                           target_weight (loss.py:20-54). The reference loops
                           joints and averages; algebraically identical to a
                           single masked mean.
  * ``joints_ohkm_mse_loss`` — per-joint MSE kept per-sample, top-k hardest
                           joints per sample (k=8) (loss.py:58-94). Note the
                           reference's forward calls ``self.ohkm`` which does
                           not exist (module-level function, loss.py:6,94) —
                           an AttributeError if ever used; we implement the
                           intended behavior.

Heatmaps here are NHWC (N, H, W, J); target_weight is (N, J, 1) as produced
by the data pipeline (COCO.py:460-515).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_joint_mse(output: jnp.ndarray, target: jnp.ndarray,
                   target_weight: jnp.ndarray | None) -> jnp.ndarray:
    """0.5 * mean((w*pred - w*gt)^2) per (sample, joint) -> (N, J)."""
    n = output.shape[0]
    j = output.shape[3]
    pred = output.transpose(0, 3, 1, 2).reshape(n, j, -1)
    gt = target.transpose(0, 3, 1, 2).reshape(n, j, -1)
    if target_weight is not None:
        w = target_weight.reshape(n, j, 1)
        pred = pred * w
        gt = gt * w
    return 0.5 * jnp.mean(jnp.square(pred - gt), axis=2)


def joints_mse_loss(output: jnp.ndarray, target: jnp.ndarray,
                    target_weight: jnp.ndarray | None = None,
                    use_target_weight: bool = True) -> jnp.ndarray:
    """Reference JointsMSELoss.forward (loss.py:34-54)."""
    if use_target_weight and target_weight is None:
        raise NameError('target_weight is required when use_target_weight')
    tw = target_weight if use_target_weight else None
    per_joint = _per_joint_mse(output, target, tw)
    # reference: sum over joints of batch-mean MSE, / num_joints == full mean
    return jnp.mean(per_joint)


def joints_ohkm_mse_loss(output: jnp.ndarray, target: jnp.ndarray,
                         target_weight: jnp.ndarray | None = None,
                         use_target_weight: bool = True,
                         topk: int = 8) -> jnp.ndarray:
    """Reference JointsOHKMMSELoss (intended semantics; loss.py:58-94, 6-16).

    Per-sample: keep the top-k highest per-joint losses, average over k,
    then average over the batch.
    """
    tw = target_weight if use_target_weight else None
    per_joint = _per_joint_mse(output, target, tw)       # (N, J)
    topk_vals, _ = jax.lax.top_k(per_joint, topk)
    return jnp.mean(jnp.sum(topk_vals, axis=1) / topk)


def get_loss(name: str):
    """Loss factory mirroring the reference's loss selection
    (training/Train.py:166-171: 'JointsMSELoss' | 'JointsOHKMMSELoss')."""
    if name in ('JointsMSELoss', 'mse'):
        return joints_mse_loss
    if name in ('JointsOHKMMSELoss', 'ohkm'):
        return joints_ohkm_mse_loss
    raise NotImplementedError(f'Unknown loss {name!r}')
