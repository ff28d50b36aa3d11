"""Checkpoint I/O: native pytree format + torch interop.

Mirrors the reference's misc/checkpoint.py contract (save/load of
``{epoch, model, optimizer, params}`` — checkpoint.py:5-59) with TPU-native
storage:

  * ``save``/``load``        — single-file ``.npz`` of a flattened pytree
                               (fast, dependency-free; inference params).
  * ``save_train``/``load_train`` — orbax-backed full training state
                               (params + opt_state + epoch + config).
  * ``.pth``                 — auto-converted on load via models/convert.py;
                               both official weight files and harness
                               checkpoints are accepted, matching
                               SimpleHRNet.py:117-121's 'model'-key probe.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

SEP = '|'  # path separator in flattened npz keys ('.' appears in no key names)


def _flatten(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree:
            # an empty subtree would silently VANISH from the npz and
            # KeyError only after reload — reject at save time
            raise ValueError(f'cannot save empty dict at {prefix[:-1]!r}')
        for k, v in tree.items():
            flat.update(_flatten(v, f'{prefix}{k}{SEP}'))
    elif isinstance(tree, (list, tuple)):
        # np.asarray would stack same-shape entries into ONE array and the
        # reload would not round-trip the container — the npz format is
        # dicts-of-arrays only (orbax save_train handles general pytrees)
        raise TypeError(
            f'npz checkpoints hold nested dicts of arrays only; got '
            f'{type(tree).__name__} at {prefix[:-1]!r} (use save_train '
            f'for general pytrees such as optimizer state)')
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save(path: str, tree: Any) -> None:
    """Save a params pytree as one .npz file."""
    np.savez(path, **_flatten(jax.device_get(tree)))


def load(path: str) -> Any:
    """Load a params pytree. Accepts .npz (native) or .pth (auto-convert)."""
    if path.endswith('.pth') or path.endswith('.pt'):
        from simple_hrnet_tpu.models import convert
        return convert.load_pth(path)
    with np.load(path) as f:
        return _unflatten({k: f[k] for k in f.files})


# ---------------------------------------------------------------------------
# Full training state (orbax)
# ---------------------------------------------------------------------------

def save_train(directory: str, step: int, params: Any, opt_state: Any,
               config: Optional[dict] = None, keep: int = 3) -> None:
    """Save a full training checkpoint (reference misc/checkpoint.py:5-28)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True)) as mngr:
        mngr.save(step, args=ocp.args.Composite(
            params=ocp.args.StandardSave(jax.device_get(params)),
            opt_state=ocp.args.StandardSave(jax.device_get(opt_state)),
        ))
        mngr.wait_until_finished()
    if config is not None:
        with open(os.path.join(directory, 'config.json'), 'w') as f:
            json.dump(config, f, indent=2, default=str)


def load_train(directory: str, step: Optional[int] = None,
               target_params: Any = None, target_opt_state: Any = None
               ) -> Tuple[int, Any, Any, Optional[dict]]:
    """Restore (step, params, opt_state, config) from an orbax checkpoint.

    Pass ``target_opt_state`` (a freshly built optimizer state) so optax's
    NamedTuple containers are reconstructed — orbax alone restores plain
    dicts, which optax transforms cannot consume.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with ocp.CheckpointManager(directory) as mngr:
        if step is None:
            step = mngr.latest_step()
        kwargs = {}
        if target_params is not None or target_opt_state is not None:
            kwargs['args'] = ocp.args.Composite(
                params=ocp.args.StandardRestore(
                    jax.device_get(target_params)),
                opt_state=ocp.args.StandardRestore(
                    jax.device_get(target_opt_state)),
            )
        restored = mngr.restore(step, **kwargs)
    config = None
    cfg_path = os.path.join(directory, 'config.json')
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return step, restored['params'], restored['opt_state'], config
