"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on virtual CPU devices
(``--xla_force_host_platform_device_count``), mirroring how the driver
validates the multi-chip path — no real TPU pod needed (the reference never
tests multi-GPU at all; see SURVEY.md §4).
"""

import os

# Force CPU regardless of the ambient platform (the session may point
# JAX_PLATFORMS at a real TPU, whose fast-math conv precision would break
# bit-parity assertions). The TPU plugin's register() overrides the env var
# via jax.config, so we override it back before any backend is initialized.
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(0)


def reference_on_path():
    """Make the torch reference importable (for parity tests only).

    The reference imports its own modules as ``models_.*`` from the repo root,
    so we append /root/reference to sys.path. We never import application code
    from it in the framework itself.
    """
    ref = '/root/reference'
    if ref not in sys.path:
        sys.path.append(ref)
    return ref
