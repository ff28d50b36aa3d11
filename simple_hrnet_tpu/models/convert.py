"""Official ``.pth`` checkpoint -> JAX pytree converter.

Handles both official weight files (flat state_dicts, e.g.
``pose_hrnet_w32_256x192.pth``) and training-harness checkpoints
(``{'model': state_dict, ...}`` — reference misc/checkpoint.py:20-28,
probed the same way as SimpleHRNet.py:117-121). ``module.`` DataParallel
prefixes are stripped.

The mapping is purely mechanical because our param trees mirror the torch
module hierarchy (see models/layers.py):

    conv  ``a.b.weight``  (4D, OIHW)       -> tree[a][b]['kernel'] (HWIO)
    deconv ``deconv_layers.N.weight``       -> spatially flipped, (kh,kw,I,O)
    bn    ``a.b.weight`` / ``bias``         -> 'scale' / 'bias'
          ``running_mean`` / ``running_var``-> 'mean' / 'var'
          ``num_batches_tracked``           -> dropped
    bias  ``a.b.bias`` (conv)               -> tree[a][b]['bias']

Loading does not require torch at call time when given a dict of numpy
arrays; ``load_pth`` uses torch (CPU) to deserialize the pickle.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (avoid importing torch unless needed)
    return v.detach().cpu().numpy()


def state_dict_to_tree(state_dict: Mapping[str, Any]) -> Params:
    """Convert a torch state_dict (or dict of numpy arrays) to a param tree."""
    import jax.numpy as jnp

    tree: Params = {}
    bn_modules = set()
    # First pass: find BN modules (they own running_mean).
    for key in state_dict:
        if key.startswith('module.'):
            key = key[len('module.'):]
        if key.endswith('.running_mean'):
            bn_modules.add(key[: -len('.running_mean')])

    for key, value in state_dict.items():
        if key.startswith('module.'):
            key = key[len('module.'):]
        parts = key.split('.')
        leaf = parts[-1]
        module = '.'.join(parts[:-1])
        if leaf == 'num_batches_tracked':
            continue
        arr = _to_numpy(value)

        if module in bn_modules:
            new_leaf = {'weight': 'scale', 'bias': 'bias',
                        'running_mean': 'mean', 'running_var': 'var'}[leaf]
        elif leaf == 'weight':
            if arr.ndim == 4:
                if 'deconv_layers' in parts:
                    # ConvTranspose2d weight (C_in, C_out, kh, kw): flip
                    # spatially and store as a regular HWIO conv kernel for
                    # the lhs-dilated formulation (layers.deconv2d).
                    arr = np.transpose(arr, (2, 3, 0, 1))[::-1, ::-1]
                else:
                    arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
                new_leaf = 'kernel'
            else:
                new_leaf = 'kernel'
        else:
            new_leaf = leaf  # conv bias

        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[new_leaf] = jnp.asarray(np.ascontiguousarray(arr))

    return tree


def load_pth(path: str) -> Params:
    """Load an official ``.pth`` / harness checkpoint into a param tree."""
    import torch

    checkpoint = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(checkpoint, dict) and 'model' in checkpoint:
        checkpoint = checkpoint['model']
    return state_dict_to_tree(checkpoint)


def tree_to_state_dict(tree: Params, prefix: str = '') -> Dict[str, np.ndarray]:
    """Inverse mapping (JAX tree -> torch-style flat dict) for re-export."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        path = f'{prefix}{k}'
        if isinstance(v, dict):
            if 'mean' in v and 'kernel' not in v:  # BN node
                flat[f'{path}.weight'] = np.asarray(v['scale'])
                flat[f'{path}.bias'] = np.asarray(v['bias'])
                flat[f'{path}.running_mean'] = np.asarray(v['mean'])
                flat[f'{path}.running_var'] = np.asarray(v['var'])
            elif 'kernel' in v:
                arr = np.asarray(v['kernel'])
                if 'deconv_layers' in path.split('.'):
                    arr = np.transpose(arr[::-1, ::-1], (2, 3, 0, 1))
                else:
                    arr = np.transpose(arr, (3, 2, 0, 1))
                flat[f'{path}.weight'] = arr
                if 'bias' in v:
                    flat[f'{path}.bias'] = np.asarray(v['bias'])
            else:
                flat.update(tree_to_state_dict(v, prefix=f'{path}.'))
    return flat
