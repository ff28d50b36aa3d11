"""AOT engine export/load — the TPU analogue of TensorRT engine export
(reference scripts/export-tensorrt-model.py:13-28 + SimpleHRNet.py:143-147).

An "engine" here is a ``.jaxpose`` zip holding:
  * ``module.shlo``  — the serialized StableHLO of the jitted forward
    (folded-BN, fixed batch/resolution/dtype), via ``jax.export``;
  * ``params.npz``   — the folded parameters;
  * ``meta.json``    — model/config metadata.

Loading deserializes the module and binds the params; the call is then a
pure compiled execution with zero Python model code — start-up time drops
to the XLA compile of a pre-lowered module (served further by the
persistent compilation cache).
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from functools import partial
from typing import Optional, Tuple

import numpy as np


def export_engine(out_path: str, checkpoint_path: str, *, c: int = 48,
                  nof_joints: int = 17, model_name: str = 'HRNet',
                  resolution: Tuple[int, int] = (384, 288),
                  batch_size: int = 16, half: bool = False,
                  int8: bool = False, fused: bool = False,
                  int8_exclude=()) -> str:
    """Build + serialize the AOT forward.

    ``half`` = bf16 compute (the analogue of the reference's fp16 TensorRT
    mode); ``int8`` = TRT-style post-training quantization (per-channel
    int8 weights + calibrated activation scales on the MXU-bound convs,
    models/quantize.py — implies bf16 elsewhere); ``fused`` = bake the
    grouped block-diagonal trunk (models/hrnet_fast.py) into the engine.
    Fused engines use the pure-XLA formulations (no Mosaic custom calls)
    so the serialized module stays portable across backends — the Pallas
    chain/fuse_up kernels remain a facade-only optimization.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from simple_hrnet_tpu.models import hrnet, poseresnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.utils import checkpoint as ckpt

    if int8_exclude and not int8:
        raise ValueError('int8_exclude only applies with int8=True '
                         '(nothing is quantized otherwise)')
    params = L.fold_batch_norm(ckpt.load(checkpoint_path))
    if int8:
        half = True
    dtype = jnp.bfloat16 if half else None

    amax = None
    if int8:
        from simple_hrnet_tpu.models import quantize as Q
        from simple_hrnet_tpu.ops import image as I
        if model_name in ('HRNet', 'hrnet'):
            cal_apply = hrnet.apply
        else:
            cal_apply = partial(poseresnet.apply, resnet_size=c)

        imgs = Q.smooth_frames(resolution, n=2, lo=0.0, hi=255.0)
        # subtract-then-multiply convention (ops/image.py) so the
        # engine's calibration matches the serving graph bitwise
        cal = ((imgs.astype(np.float32) - I.MEAN255)
               * I.INV255_STD).astype(np.float32)
        amax = Q.calibrate_cpu(cal_apply, params, [cal])
        if int8_exclude:
            # accuracy-policy knob, same as SimpleHRNet(int8_exclude=...)
            amax = Q.filter_amax(params, amax, int8_exclude)

    if model_name in ('HRNet', 'hrnet'):
        if fused:
            from simple_hrnet_tpu.models import hrnet_fast
            from simple_hrnet_tpu.models import quantize as Q
            group = min(4, max(2, 128 // c))
            packed = hrnet_fast.pack_grouped(params, group=group,
                                             pallas_chains=False,
                                             int8_amax=amax)
            if amax is not None:
                params = Q.quantize_folded(params, amax)
            params = {'p': params, 'packed': packed}
            fwd = lambda b, x: hrnet_fast.apply_grouped(
                b['p'], b['packed'], x, dtype=dtype)
        else:
            if amax is not None:
                from simple_hrnet_tpu.models import quantize as Q
                params = Q.quantize_folded(params, amax)
            fwd = lambda p, x: hrnet.apply(p, x, dtype=dtype)
    else:
        if amax is not None:
            from simple_hrnet_tpu.models import quantize as Q
            params = Q.quantize_folded(params, amax)
        fwd = lambda p, x: poseresnet.apply(p, x, resnet_size=c, dtype=dtype)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    x_spec = jax.ShapeDtypeStruct((batch_size, *resolution, 3), jnp.float32)
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exported = jexport.export(jax.jit(fwd))(p_spec, x_spec)

    from simple_hrnet_tpu.utils.checkpoint import _flatten
    buf = io.BytesIO()
    np.savez(buf, **_flatten(jax.device_get(params)))
    meta = {'c': c, 'nof_joints': nof_joints, 'model_name': model_name,
            'resolution': list(resolution), 'batch_size': batch_size,
            'half': half, 'int8': int8, 'fused': fused}

    with zipfile.ZipFile(out_path, 'w') as z:
        z.writestr('module.shlo', exported.serialize())
        z.writestr('params.npz', buf.getvalue())
        z.writestr('meta.json', json.dumps(meta))
    return out_path


class Engine:
    """Loaded AOT engine: ``engine(x)`` -> heatmaps (NHWC)."""

    def __init__(self, path: str):
        import jax
        from jax import export as jexport

        from simple_hrnet_tpu.utils.checkpoint import _unflatten

        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read('meta.json'))
            with np.load(io.BytesIO(z.read('params.npz'))) as f:
                self.params = _unflatten({k: f[k] for k in f.files})
            self._exported = jexport.deserialize(z.read('module.shlo'))
        self._call = jax.jit(self._exported.call)

    @property
    def batch_size(self) -> int:
        return self.meta['batch_size']

    @property
    def resolution(self) -> Tuple[int, int]:
        return tuple(self.meta['resolution'])

    def __call__(self, x):
        return self._call(self.params, x)
