"""Multi-host data parallelism (parallel/distributed.py).

Two coordinated CPU processes (4 virtual devices each, gloo transport)
run one train step of a tiny HRNet over the 8-device global mesh, each
feeding its local half of a fixed global batch. Their losses must agree
with each other AND with the same step executed single-process on an
8-device mesh — i.e. multi-host changes nothing but the launch topology.

The reference has no distributed training whatsoever (SURVEY.md §2.3);
this is capability beyond it, so the spec is internal consistency.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env.pop('JAX_PLATFORMS', None)
    procs = [
        subprocess.Popen(
            [sys.executable, '-m', 'simple_hrnet_tpu.parallel.distributed',
             f'localhost:{port}', '2', str(pid)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f'child failed:\n{out}'
    losses = []
    for out in outs:
        m = re.search(r'loss=([0-9.eE+-]+)', out)
        assert m, f'no loss line in:\n{out}'
        losses.append(float(m.group(1)))
    # both processes see the same (psum'd) global loss
    assert losses[0] == losses[1]

    # single-process 8-device reference (the conftest mesh, same global
    # batch): multi-host must change nothing but the launch topology
    from simple_hrnet_tpu.parallel import distributed, replicate, shard_batch

    mesh, params, opt_state, train_step = distributed._selftest_setup()
    batch = distributed._selftest_batch(2 * mesh.devices.size)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    _, _, ref_loss, _ = train_step(params, opt_state,
                                   shard_batch(batch, mesh))
    np.testing.assert_allclose(losses[0], float(ref_loss), rtol=1e-6)
