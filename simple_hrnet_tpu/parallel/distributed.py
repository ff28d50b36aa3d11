"""Multi-host (multi-process) data parallelism.

The reference's parallelism ceiling is single-process
``torch.nn.DataParallel`` (reference SimpleHRNet.py:123-135); it has no
distributed training at all (SURVEY.md §2.3). The TPU-native scale-out
model is process-per-host SPMD:

  * every host runs the SAME program;
  * :func:`initialize` wires the processes into one JAX runtime (on TPU
    pods all arguments are auto-detected from the TPU metadata; on
    CPU/GPU clusters pass coordinator/num_processes/process_id
    explicitly);
  * ``make_mesh()`` then spans ALL chips in the job (``jax.devices()`` is
    global after init), params are replicated, the batch axis is sharded;
  * each host feeds only its local shard of the global batch
    (:func:`global_batch`), and XLA inserts the gradient all-reduces over
    ICI within a pod slice and DCN across slices.

No NCCL/MPI analogue is written here — the collectives ARE the XLA ones.
Verified by tests/test_distributed.py: two coordinated CPU processes
(gloo transport) train-step a tiny HRNet and reproduce the single-process
loss bit-for-bit.

Launch recipe (one line per host)::

    python -m simple_hrnet_tpu.cli.train_coco --distributed ...   # TPU pod
    # or explicitly, e.g. 2 CPU/GPU hosts:
    #   host0: initialize('host0:8476', num_processes=2, process_id=0)
    #   host1: initialize('host0:8476', num_processes=2, process_id=1)
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from .mesh import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs) -> None:
    """Join this process into a multi-host JAX job.

    All-``None`` on a TPU pod auto-detects everything from the TPU
    runtime. Idempotent: a second call is a no-op (jax raises if already
    initialized; we swallow exactly that case so library users can call it
    unconditionally).
    """
    if is_initialized():
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kwargs)
    except RuntimeError as e:
        # the docstring's promise must not rest on the is_initialized()
        # private-API probe alone: swallow exactly the already-initialized
        # case, re-raise everything else
        if 'already initialized' not in str(e).lower():
            raise


def is_initialized() -> bool:
    try:
        state = jax._src.distributed.global_state
        return state.client is not None
    except Exception:  # pragma: no cover - private API moved
        return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_batch(batch: Any, mesh: Mesh, axis: str = 'data') -> Any:
    """Assemble a globally-sharded batch from per-process local shards.

    Thin alias of :func:`~simple_hrnet_tpu.parallel.shard_batch`, which is
    already process-count aware (ONE implementation of cross-host batch
    assembly — mesh.py); kept for the name's documentation value.
    """
    from .mesh import shard_batch
    return shard_batch(batch, mesh, axis)


def _selftest(coordinator: str, num_processes: int, process_id: int,
              seed: int = 0) -> float:
    """One process of the multi-host smoke test: a PoseResNet-18 train step
    over the global mesh, each process feeding its local slice of a fixed
    global batch. Prints ``loss=<repr>`` — tests/test_distributed.py
    asserts all processes agree and match the single-process value.
    (ResNet-18 rather than HRNet purely for CPU compile time; the machinery
    under test — gloo rendezvous, global mesh, cross-process batch
    assembly, psum'd gradients — is model-agnostic.)
    """
    jax.config.update('jax_platforms', 'cpu')
    initialize(coordinator, num_processes=num_processes,
               process_id=process_id)
    mesh, params, opt_state, train_step = _selftest_setup(seed)

    n_global = 2 * mesh.devices.size
    batch = _selftest_batch(n_global, seed)
    rows = n_global // num_processes
    lo = process_id * rows
    local = {k: v[lo:lo + rows] for k, v in batch.items()}

    from simple_hrnet_tpu.parallel import replicate, shard_batch
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    _, _, loss, out = train_step(params, opt_state,
                                 shard_batch(local, mesh))
    assert out.shape == (n_global, 16, 16, 17)
    loss = float(loss)
    print(f'loss={loss!r}', flush=True)
    return loss


def _selftest_setup(seed: int = 0):
    """Mesh + model + jitted step shared by the multi-process selftest and
    the single-process reference in tests/test_distributed.py."""
    from functools import partial

    from simple_hrnet_tpu.models import poseresnet
    from simple_hrnet_tpu.parallel import make_mesh
    from simple_hrnet_tpu.train import losses, steps

    mesh = make_mesh()
    params = poseresnet.init(jax.random.PRNGKey(seed), resnet_size=18,
                             nof_joints=17)
    optimizer = steps.make_optimizer('SGD', lr=1e-3, momentum=0.9)
    opt_state = optimizer.init(params)
    train_step = steps.make_train_step(
        partial(poseresnet.apply, resnet_size=18),
        losses.joints_mse_loss, optimizer, mesh=mesh)
    return mesh, params, opt_state, train_step


def _selftest_batch(n_global: int, seed: int = 0):
    import numpy as np
    rng = np.random.default_rng(seed)
    return {
        'image': rng.standard_normal((n_global, 64, 64, 3)).astype('float32'),
        'target': rng.uniform(0, 1, (n_global, 16, 16, 17)).astype('float32'),
        'target_weight': np.ones((n_global, 17, 1), 'float32'),
    }


if __name__ == '__main__':
    import sys
    _selftest(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
