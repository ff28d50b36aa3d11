"""Model-zoo on-chip throughput for PERF.md completeness: PoseResNet-50,
YOLOv3 detector, W32 grouped+pallas at b64."""
import sys
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet, hrnet_fast, poseresnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.utils.profiling import device_timer

T = dict(iters_lo=2, iters_hi=42, repeats=5)
rng = np.random.default_rng(0)

def report(name, t, n):
    print(f'{name:44s} {t*1e3:7.3f} ms/b{n}  {n/t:7.1f} img/s', flush=True)

# PoseResNet-50 256x192 b16 bf16 (SimpleBaselines config)
pr = L.fold_batch_norm(poseresnet.init(jax.random.PRNGKey(0),
                                       resnet_size=50, nof_joints=17))
x = jnp.asarray(rng.standard_normal((16, 256, 192, 3)), jnp.float32)
t = device_timer(lambda v, p: poseresnet.apply(p, v, resnet_size=50,
                                               dtype=jnp.bfloat16), x, pr,
                 **T)
report('PoseResNet-50 256x192 bf16', t, 16)

# YOLOv3 (full + tiny) 416x416 b16 bf16 — detector forward only
from simple_hrnet_tpu.detectors import darknet
for name, blocks in (('yolov3', darknet.yolov3_blocks()),
                     ('yolov3-tiny', darknet.yolov3_tiny_blocks())):
    dp = darknet.fold_weights(darknet.init(jax.random.PRNGKey(0), blocks))
    xd = jnp.asarray(rng.uniform(0, 1, (16, 416, 416, 3)), jnp.float32)
    t = device_timer(lambda v, p, b=blocks: darknet.apply(
        p, b, v, 416, dtype=jnp.bfloat16), xd, dp, **T)
    report(f'{name} 416x416 bf16 (detector fwd)', t, 16)

# W32 grouped+pallas at b64
p32 = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=32,
                                   nof_joints=17))
pk = hrnet_fast.pack_grouped(p32, group=4, pallas_chains=True)
x64 = jnp.asarray(rng.standard_normal((64, 256, 192, 3)), jnp.float32)
t = device_timer(lambda v, p, k: hrnet_fast.apply_grouped(
    p, k, v, dtype=jnp.bfloat16, fuse_up_pallas=True), x64, p32, pk, **T)
report('W32 grouped+pallas+fuse_up b64', t, 64)
