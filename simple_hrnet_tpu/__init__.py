"""simple_hrnet_tpu — a TPU-native multi-person human pose estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``stefanopini/simple-HRNet`` (top-down 2-stage pose estimation: person
detector -> per-crop HRNet/PoseResNet heatmap regression -> decode), designed
for TPU from the start: NHWC/MXU-friendly models, folded-BN inference,
on-device detect->crop->pose->decode with no host round-trips, static padded
shapes, and ``jax.sharding`` data parallelism over device meshes.
"""

__version__ = '0.1.0'
__all__ = ['SimpleHRNet']


def __getattr__(name):
    # Lazy: keep `import simple_hrnet_tpu.models.hrnet` cheap (no cv2 etc.).
    if name == 'SimpleHRNet':
        from simple_hrnet_tpu.api import SimpleHRNet
        return SimpleHRNet
    raise AttributeError(name)
