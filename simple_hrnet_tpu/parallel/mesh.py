"""Device mesh + sharding helpers — the framework's entire "comms backend".

The reference's only parallelism is single-process ``torch.nn.DataParallel``
replicate-scatter-gather (SimpleHRNet.py:123-135) and it has no distributed
training at all (SURVEY.md §2.3). The TPU-native equivalent is declarative:
build a ``jax.sharding.Mesh``, annotate the batch axis with
``PartitionSpec('data')``, keep params replicated, and let XLA insert the
ICI collectives (gradient psum, metric reductions). No NCCL/MPI analogue is
needed — ``jax.sharding`` + jit IS the backend.

This model is a CNN with no sequence axis and modest parameter count
(~64M for W48), so tensor/pipeline/sequence/expert parallelism are
deliberately out of scope (documented, SURVEY.md §5.7); the mesh exposes a
single ``data`` axis, over ICI within a pod and DCN across pods if a
multi-host platform provides one.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = 'data') -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'need {n_devices} devices, have {len(devices)} '
                f'(set --xla_force_host_platform_device_count for CPU tests)')
        if n_devices < len(devices) and jax.process_count() > 1:
            # a prefix slice of the GLOBAL device list can exclude every
            # device some process owns — that process would then build
            # shardings it holds no shards of and fail (or silently drop
            # its data) at the first batch
            raise ValueError(
                f'n_devices={n_devices} < {len(devices)} global devices '
                f'in a {jax.process_count()}-process job: a prefix mesh '
                'would exclude some hosts\' devices; use the full mesh '
                '(n_devices=None) in multi-process jobs')
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = 'data') -> Any:
    """Device_put a pytree of host arrays with the batch axis sharded.

    Under a multi-process job (``jax.process_count() > 1``) each process
    passes only its LOCAL rows and the global array is assembled across
    hosts (see parallel/distributed.py); single-process it is a plain
    sharded device_put.
    """
    sharding = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a params pytree across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
