"""Drop-in import shim: the reference exposes ``from SimpleHRNet import
SimpleHRNet`` from its repo root (reference SimpleHRNet.py:12); scripts
written against it work unchanged against this framework.
"""

from simple_hrnet_tpu.api import SimpleHRNet  # noqa: F401
