"""jit-compiled train / eval steps.

One fused XLA computation per step: forward (train-mode BN with batch-stats
collection), loss, backward, optax update, running-stat update. Under a
``jax.sharding.Mesh`` with the batch axis sharded, XLA inserts the gradient
and BN-statistic all-reduces over ICI automatically — this single function
is the whole data-parallel story (replacing the reference's DataParallel
and single-device Train loop, Train.py:236-262).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import optax

from simple_hrnet_tpu.models import layers as L

import jax.numpy as jnp


def _dtype_kw(dtype) -> dict:
    """Map a dtype spec to the forward kwargs (empty dict = plain f32)."""
    if dtype is None:
        return {}
    if isinstance(dtype, str):
        table = {'bfloat16': jnp.bfloat16, 'bf16': jnp.bfloat16,
                 'float32': None, 'f32': None}
        if dtype not in table:
            raise ValueError(
                f'Unsupported training dtype {dtype!r}; expected one of '
                f"{sorted(table)} (int8 is a serving-only knob — "
                "SimpleHRNet(dtype='int8'))")
        dtype = table[dtype]
    return {} if dtype is None else {'dtype': dtype}


def _batch_inputs(batch, device_targets):
    """Resolve (image, target, target_weight) from a batch dict.

    ``device_targets=None``: the host pipeline already normalized the image
    and stamped gaussian targets (batch keys image/target/target_weight).

    Otherwise ``device_targets`` is a config dict (heatmap_size, image_size,
    heatmap_sigma, joints_weight) and the batch carries the RAW pipeline
    tail — image in [0, 255] straight off the host warp, plus per-sample
    transformed ``joints``/``joints_vis`` — and this function runs the
    ImageNet normalize and the gaussian target generation IN-GRAPH
    (data/target.py:generate_target_device). The host thereby sheds the
    per-sample normalize, the 470 KB/sample target stamp+collate, and the
    target host->device transfer; on-device both fuse into the step (the
    normalize into conv1's producer chain, the targets into the loss)."""
    if device_targets is None:
        return batch['image'], batch['target'], batch['target_weight']
    from simple_hrnet_tpu.data import target as target_gen
    from simple_hrnet_tpu.data.coco import INV255_STD, MEAN255
    # subtract-then-multiply with the SAME pre-merged f32 constants the
    # host pipeline uses — a division or a mul-then-sub here compiles to
    # a different rounding chain (reciprocal rewrite / FMA contraction)
    # and breaks bit parity with the host-target mode (see ops/image.py)
    image = ((batch['image'] - jnp.asarray(MEAN255))
             * jnp.asarray(INV255_STD))
    target, weight = target_gen.generate_target_device(
        batch['joints'], batch['joints_vis'],
        tuple(device_targets['heatmap_size']),
        tuple(device_targets['image_size']),
        device_targets.get('heatmap_sigma', 3))
    jw = device_targets.get('joints_weight')
    if jw is not None:
        weight = weight * jnp.asarray(jw, jnp.float32)
    return image, target, weight


def make_train_step(apply_fn: Callable, loss_fn: Callable,
                    optimizer: optax.GradientTransformation,
                    mesh=None, donate: bool = True, dtype=None,
                    device_targets=None,
                    bn_momentum: float = L.BN_MOMENTUM) -> Callable:
    """Build the jitted train step.

    apply_fn(params, x, train=True, stats=dict) -> heatmaps (NHWC).
    Batch dict: image (N,H,W,C), target (N,h,w,J), target_weight (N,J,1).
    ``dtype='bfloat16'``/jnp.bfloat16 runs conv compute in bf16 with f32
    master params, f32 BN statistics and an f32 loss/head (mixed precision;
    the reference trains f32-only). ``bn_momentum`` is the torch-semantics
    running-stat momentum (Train's model_bn_momentum).
    Returns (params, opt_state, loss, out).

    With ``device_targets`` (a config dict, see ``_batch_inputs``) the batch
    instead carries {RAW [0, 255] image, joints, joints_vis} and ImageNet
    normalization + gaussian target generation run in-graph; the step then
    ALSO returns the generated target: (params, opt_state, loss, out,
    target).
    """
    fwd_kw = _dtype_kw(dtype)

    def step(params, opt_state, batch):
        image, target, target_weight = _batch_inputs(batch, device_targets)

        def loss_of(p):
            stats: Dict[str, tuple] = {}
            out = apply_fn(p, image, train=True, stats=stats, **fwd_kw)
            out = out.astype(jnp.float32)
            loss = loss_fn(out, target, target_weight)
            return loss, (out, stats)

        (loss, (out, stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # running BN stats (torch momentum semantics, layers.py)
        params = L.update_running_stats(params, stats,
                                        momentum=bn_momentum)
        if device_targets is not None:
            return params, opt_state, loss, out, target
        return params, opt_state, loss, out

    if mesh is not None:
        from simple_hrnet_tpu.parallel import data_sharding, replicated_sharding
        repl = replicated_sharding(mesh)
        data = data_sharding(mesh)
        out_sh = (repl, repl, repl, data)
        if device_targets is not None:
            out_sh = out_sh + (data,)
        return jax.jit(
            step,
            in_shardings=(repl, repl, data),
            out_shardings=out_sh,
            donate_argnums=(0, 1) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(apply_fn: Callable, loss_fn: Callable,
                   flip_pairs=None, mesh=None, dtype=None,
                   device_targets=None) -> Callable:
    """Eval step with optional flip-test averaging (Test.py:134-141).

    With ``device_targets`` the batch carries the raw pipeline tail (see
    ``_batch_inputs``) and the step returns (loss, out, target)."""
    fwd_kw = _dtype_kw(dtype)

    def step(params, batch):
        image, target, target_weight = _batch_inputs(batch, device_targets)
        out = apply_fn(params, image, train=False, **fwd_kw)
        out = out.astype(jnp.float32)
        if flip_pairs is not None:
            from simple_hrnet_tpu.ops import decode as D
            flipped_in = image[:, :, ::-1, :]
            out_f = apply_fn(params, flipped_in, train=False, **fwd_kw)
            out = D.flip_test_average(out.astype(jnp.float32),
                                      out_f.astype(jnp.float32), flip_pairs)
        loss = loss_fn(out, target, target_weight)
        if device_targets is not None:
            return loss, out, target
        return loss, out

    if mesh is not None:
        from simple_hrnet_tpu.parallel import data_sharding, replicated_sharding
        repl = replicated_sharding(mesh)
        data = data_sharding(mesh)
        out_sh = (repl, data) if device_targets is None \
            else (repl, data, data)
        return jax.jit(step, in_shardings=(repl, data),
                       out_shardings=out_sh)
    return jax.jit(step)


def make_optimizer(name: str = 'SGD', lr: float = 0.001,
                   momentum: float = 0.9, nesterov: bool = False,
                   weight_decay: float = 0.0,
                   lr_decay: bool = False,
                   lr_decay_steps=(170, 200),
                   lr_decay_gamma: float = 0.1,
                   steps_per_epoch: int = 1
                   ) -> optax.GradientTransformation:
    """SGD/Adam + MultiStepLR, mirroring Train.py:173-179, 206-208."""
    if lr_decay:
        boundaries = {int(e) * steps_per_epoch: lr_decay_gamma
                      for e in lr_decay_steps}
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
    else:
        schedule = lr

    if name in ('SGD', 'sgd'):
        opt = optax.sgd(schedule, momentum=momentum, nesterov=nesterov)
    elif name in ('Adam', 'adam'):
        opt = optax.adam(schedule)
    else:
        raise NotImplementedError(f'Unknown optimizer {name!r}')
    if weight_decay:
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=_decay_mask), opt)
    return opt


def _decay_mask(params):
    """True for decayable leaves. BN running 'mean'/'var' are torch *buffers*
    (never seen by the optimizer — Train.py passes model.parameters()), so
    decaying them would silently corrupt BN statistics. BN scale/bias ARE
    decayed, matching torch's default param group.
    """
    def mask(path, _leaf):
        last = path[-1]
        key = getattr(last, 'key', None)
        return key not in ('mean', 'var')

    return jax.tree_util.tree_map_with_path(mask, params)
