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
                  batch_size: int = 16, half: bool = False) -> str:
    """Build + serialize the AOT forward. ``half`` = bf16 compute (the
    analogue of the reference's fp16 TensorRT mode)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from simple_hrnet_tpu.models import hrnet, poseresnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.utils import checkpoint as ckpt

    params = L.fold_batch_norm(ckpt.load(checkpoint_path))
    dtype = jnp.bfloat16 if half else None
    if model_name in ('HRNet', 'hrnet'):
        fwd = lambda p, x: hrnet.apply(p, x, dtype=dtype)
    else:
        fwd = lambda p, x: poseresnet.apply(p, x, resnet_size=c, dtype=dtype)

    x_spec = jax.ShapeDtypeStruct((batch_size, *resolution, 3), jnp.float32)
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    exported = jexport.export(jax.jit(fwd))(p_spec, x_spec)

    from simple_hrnet_tpu.utils.checkpoint import _flatten
    buf = io.BytesIO()
    np.savez(buf, **_flatten(jax.device_get(params)))
    meta = {'c': c, 'nof_joints': nof_joints, 'model_name': model_name,
            'resolution': list(resolution), 'batch_size': batch_size,
            'half': half}

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
