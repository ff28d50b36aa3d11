"""Native YOLOv5 implementation tests."""

import numpy as np
import pytest


def test_yolov5_forward_shapes():
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import yolov5 as Y

    cfg = Y.build_config('yolov5n')
    params = Y.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 320, 320, 3))
    out = jax.jit(lambda p, v: Y.apply(p, cfg, v, 320))(params, x)
    # 3 * (40^2 + 20^2 + 10^2) = 6300 anchors
    assert out.shape == (1, 6300, 85)
    assert bool(jnp.isfinite(out).all())

    # width multiples: n -> 16/32/64/128/256 channels
    assert cfg['c64'] == 16 and cfg['c1024'] == 256
    assert Y.build_config('yolov5m')['c64'] == 48
    assert Y.build_config('yolov5m')['n9'] == 6


def test_detect_decode_formula(rng):
    """Decode matches the published v5 formulas on raw logits."""
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import yolov5 as Y

    gh = gw = 4
    img_size = 128  # stride 32 -> P5 anchors
    raw = rng.standard_normal((1, gh, gw, 3 * 85)).astype(np.float32)
    out = np.asarray(Y._detect_decode(jnp.asarray(raw), 2, img_size))

    s = 1 / (1 + np.exp(-raw.reshape(1, gh, gw, 3, 85)))
    stride = img_size / gw
    for a in range(3):
        for y in range(gh):
            for x in range(gw):
                row = out[0, a * gh * gw + y * gw + x]
                np.testing.assert_allclose(
                    row[0], (s[0, y, x, a, 0] * 2 - 0.5 + x) * stride,
                    rtol=1e-5)
                np.testing.assert_allclose(
                    row[1], (s[0, y, x, a, 1] * 2 - 0.5 + y) * stride,
                    rtol=1e-5)
                np.testing.assert_allclose(
                    row[2], (s[0, y, x, a, 2] * 2) ** 2 * Y.ANCHORS[2][a][0],
                    rtol=1e-4)
                np.testing.assert_allclose(
                    row[4], s[0, y, x, a, 4], rtol=1e-5)


class _FakeUltralyticsConv:
    """Defined lazily at module import of torch (see fixture below)."""


def _make_fake_ckpt(tmp_path):
    import torch
    from torch import nn

    class Conv(nn.Module):
        def __init__(self, ci, co, k):
            super().__init__()
            self.conv = nn.Conv2d(ci, co, k, bias=False)
            self.bn = nn.BatchNorm2d(co)

    # register at module scope so pickle can resolve it on save; the LOADER
    # must not need it (we delete it before loading to prove the stub path)
    import sys
    Conv.__qualname__ = Conv.__name__ = '_PickleConv'
    mod = sys.modules[__name__]
    mod._PickleConv = Conv

    inner = nn.Module()
    inner.model = nn.ModuleList([Conv(3, 8, 3), Conv(8, 16, 1)])
    torch.save({'model': inner}, tmp_path / 'fake.pt')
    del mod._PickleConv  # loader cannot resolve the class -> stub path


def test_ultralytics_checkpoint_shim(tmp_path):
    """A pickled module tree (ultralytics-style, class unavailable on the
    loading side) round-trips through the stub unpickler."""
    from simple_hrnet_tpu.detectors import yolov5 as Y

    _make_fake_ckpt(tmp_path)

    flat = Y.load_ultralytics_state_dict(str(tmp_path / 'fake.pt'))
    assert 'model.0.conv.weight' in flat
    assert 'model.0.bn.running_mean' in flat
    assert flat['model.1.conv.weight'].shape == (16, 8, 1, 1)

    tree = Y.state_dict_to_tree(flat)
    assert tree['model']['0']['conv']['kernel'].shape == (3, 3, 3, 8)
    assert 'mean' in tree['model']['0']['bn']


def test_yolov5_adapter_contract(rng):
    """predict_single returns the reference (n, 7) row format (or None)."""
    from simple_hrnet_tpu.detectors.yolov5 import YOLOv5

    det = YOLOv5('yolov5n', img_size=320, conf_thres=0.01)
    frame = rng.uniform(0, 255, (240, 320, 3)).astype(np.uint8)
    out = det.predict_single(frame)
    assert out is None or (out.ndim == 2 and out.shape[1] == 7)
    # batch predict is supported (reference raises NotImplementedError)
    outs = det.predict(np.stack([frame, frame]))
    assert len(outs) == 2


def test_yolov5_phase_stem_parity(rng):
    """The 6x6 s2 stem rewritten as a 3x3 s1 phase conv (ops/phase.py) is
    numerically the same network: raw prediction tensors agree to f32
    noise and the full detect pipeline returns the same rows."""
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import yolov5 as V
    from simple_hrnet_tpu.detectors.yolov3 import (letterbox_device,
                                                   letterbox_device_phase)

    frames = rng.uniform(0, 255, (1, 480, 640, 3)).astype(np.float32)
    dp = V.YOLOv5('yolov5s', phase_stem=True, conf_thres=0.05)
    ds = V.YOLOv5('yolov5s', phase_stem=False, conf_thres=0.05)
    assert dp.phase_stem and not ds.phase_stem
    assert dp.params['model']['0']['conv']['kernel'].shape == (3, 3, 12, 32)

    fj = jnp.asarray(frames)
    ip = letterbox_device_phase(fj, 640, 480, 640)
    istd = letterbox_device(fj, 640, 480, 640)
    pp = np.asarray(V.apply(dp.params, dp.cfg, ip, 640, phase_stem=True))
    ps = np.asarray(V.apply(ds.params, ds.cfg, istd, 640))
    np.testing.assert_allclose(pp, ps, atol=2e-3)  # coords in pixels

    rows_p = dp.predict(frames.copy())
    rows_s = ds.predict(frames.copy())
    for a, b in zip(rows_p, rows_s):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_allclose(a, b, atol=5e-3)
