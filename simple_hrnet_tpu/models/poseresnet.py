"""PoseResNet (SimpleBaselines) — functional JAX/XLA implementation (NHWC).

Re-implements /root/reference/models_/poseresnet.py:16-122: ResNet backbone
(18/34/50/101/152) + three stride-2 4x4 transposed-conv layers (256ch, no
bias) + 1x1 head. Params mirror the official ``pose_resnet_*`` state_dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L

Params = Dict[str, Any]

# resnet_spec (reference poseresnet.py:6-12): block type + per-layer counts.
RESNET_SPEC = {
    18: ('basic', [2, 2, 2, 2]),
    34: ('basic', [3, 4, 6, 3]),
    50: ('bottleneck', [3, 4, 6, 3]),
    101: ('bottleneck', [3, 4, 23, 3]),
    152: ('bottleneck', [3, 8, 36, 3]),
}


def apply(params: Params, x: jnp.ndarray, *, resnet_size: int = 50,
          train: bool = False, stats: Optional[dict] = None,
          axis_name: Optional[str] = None, dtype=None) -> jnp.ndarray:
    """Forward: NHWC in, (N, H/4, W/4, nof_joints) heatmaps out."""
    kw = dict(train=train, stats=stats, axis_name=axis_name, dtype=dtype)
    block_type, counts = RESNET_SPEC[resnet_size]
    block = L.basic_block if block_type == 'basic' else L.bottleneck

    # Stem: 7x7 s2 conv + BN + ReLU + 3x3 s2 maxpool (poseresnet.py:25-28).
    x = L.conv_bn(x, params, 'conv1', 'bn1', stride=2, padding=3, act=True, **kw)
    x = L.max_pool(x, window=3, stride=2, padding=1)

    for li, n_blocks in enumerate(counts, start=1):
        lp = params[f'layer{li}']
        for b in range(n_blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            x = block(lp[str(b)], x, stride=stride,
                      path=f'layer{li}.{b}', **kw)

    # Deconv head: 3x [ConvTranspose(k4,s2,p1,no bias) + BN + ReLU]
    # stored at sequential indices (0,1),(3,4),(6,7) (poseresnet.py:81-106).
    dp = params['deconv_layers']
    for d in range(3):
        ci = str(3 * d)
        bi = str(3 * d + 1)
        x = L.deconv2d(x, dp[ci], stride=2, kernel_size=4, padding=1, dtype=dtype)
        if bi in dp:  # absent once folded
            x = L.batch_norm(x, dp[bi], train=train, stats=stats,
                             path=f'deconv_layers.{bi}', axis_name=axis_name)
        x = L.relu(x)

    out = L.conv2d(x.astype(jnp.float32), params['final_layer'],
                   stride=1, padding=0)
    return out


def init(key, resnet_size: int = 50, nof_joints: int = 17) -> Params:
    """Fresh PoseResNet params matching the official state_dict layout."""
    block_type, counts = RESNET_SPEC[resnet_size]
    expansion = 1 if block_type == 'basic' else 4
    keys = iter(jax.random.split(key, 256))

    p: Params = {'conv1': L.init_conv(next(keys), 7, 3, 64),
                 'bn1': L.init_bn(64)}
    inplanes = 64
    for li, n_blocks in enumerate(counts, start=1):
        planes = 64 * (2 ** (li - 1))
        lp: Params = {}
        for b in range(n_blocks):
            stride = 2 if (li > 1 and b == 0) else 1
            needs_ds = stride != 1 or inplanes != planes * expansion
            if block_type == 'bottleneck':
                bp = L.init_bottleneck(next(keys), inplanes, planes,
                                       downsample=needs_ds)
            else:
                bp = L.init_basic_block(next(keys), inplanes, planes)
                bp['conv1'] = L.init_conv(next(keys), 3, inplanes, planes)
                if needs_ds:
                    bp['downsample'] = {
                        '0': L.init_conv(next(keys), 1, inplanes, planes),
                        '1': L.init_bn(planes),
                    }
            lp[str(b)] = bp
            inplanes = planes * expansion
        p[f'layer{li}'] = lp

    dp: Params = {}
    c_in = inplanes
    for d in range(3):
        # stored pre-flipped HWIO (I = C_in); init symmetric so flip is moot
        dp[str(3 * d)] = L.init_conv(next(keys), 4, c_in, 256)
        dp[str(3 * d + 1)] = L.init_bn(256)
        c_in = 256
    p['deconv_layers'] = dp
    p['final_layer'] = L.init_conv(next(keys), 1, 256, nof_joints, bias=True)
    return p
