"""Darknet graph, weights loading, letterbox and NMS tests."""

import io
import os

import numpy as np
import pytest


def test_yolov3_graph_structure():
    """Route targets / conv count match the official cfg layout."""
    from simple_hrnet_tpu.detectors import darknet

    blocks = darknet.yolov3_blocks()
    convs = [i for i, b in enumerate(blocks) if b['type'] == 'convolutional']
    yolos = [i for i, b in enumerate(blocks) if b['type'] == 'yolo']
    routes = [b['layers'] for b in blocks if b['type'] == 'route']
    assert len(convs) == 75              # yolov3 has 75 conv layers
    assert len(yolos) == 3
    assert routes == [[-4], [-1, 61], [-4], [-1, 36]]  # official cfg targets

    tiny = darknet.yolov3_tiny_blocks()
    assert len([b for b in tiny if b['type'] == 'convolutional']) == 13
    assert [b['layers'] for b in tiny if b['type'] == 'route'] == [[-4], [-1, 8]]


@pytest.mark.parametrize('model', ['tiny'])
def test_darknet_forward_shape(model):
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import darknet

    blocks = darknet.yolov3_tiny_blocks()
    params = darknet.init(jax.random.PRNGKey(0), blocks)
    x = jnp.zeros((1, 416, 416, 3))
    out = jax.jit(lambda p, v: darknet.apply(p, blocks, v, 416))(params, x)
    # 3 * (13^2 + 26^2) = 2535 anchors
    assert out.shape == (1, 2535, 85)
    # decoded boxes are finite and within sane bounds
    assert bool(jnp.isfinite(out).all())


def test_darknet_weights_roundtrip(tmp_path, rng):
    """Write a synthetic .weights binary, load it, verify exact placement."""
    import jax
    import numpy as np
    from simple_hrnet_tpu.detectors import darknet

    blocks = darknet.yolov3_tiny_blocks()
    chans = darknet.output_channels(blocks)

    # Build the byte stream exactly as darknet does.
    buf = [np.zeros(5, np.int32).tobytes()]
    expected = {}
    prev_c = 3
    for i, blk in enumerate(blocks):
        if blk['type'] == 'convolutional':
            f, k = blk['filters'], blk['size']
            if blk['bn']:
                parts = {n: rng.standard_normal(f).astype(np.float32)
                         for n in ('bias', 'scale', 'mean', 'var')}
                for n in ('bias', 'scale', 'mean', 'var'):
                    buf.append(parts[n].tobytes())
            else:
                parts = {'bias': rng.standard_normal(f).astype(np.float32)}
                buf.append(parts['bias'].tobytes())
            w = rng.standard_normal((f, prev_c, k, k)).astype(np.float32)
            buf.append(w.tobytes())
            parts['kernel'] = np.transpose(w, (2, 3, 1, 0))
            expected[f'conv_{i}'] = parts
        prev_c = chans[i]

    path = tmp_path / 'tiny.weights'
    path.write_bytes(b''.join(buf))

    params = darknet.load_darknet_weights(str(path), blocks)
    for name, parts in expected.items():
        node = params[name]
        np.testing.assert_array_equal(np.asarray(node['kernel']), parts['kernel'])
        if 'scale' in parts:
            for src, dst in (('scale', 'scale'), ('bias', 'bias'),
                             ('mean', 'mean'), ('var', 'var')):
                np.testing.assert_array_equal(np.asarray(node['bn'][dst]),
                                              parts[src])
        else:
            np.testing.assert_array_equal(np.asarray(node['bias']), parts['bias'])

    # truncated / oversized files must be rejected
    path.write_bytes(b''.join(buf) + np.zeros(3, np.float32).tobytes())
    with pytest.raises(ValueError):
        darknet.load_darknet_weights(str(path), blocks)


def test_letterbox_matches_reference(rng):
    """Device letterbox == reference letterbox (YOLOv3.py:23-45) on pixels."""
    import cv2
    from simple_hrnet_tpu.detectors import yolov3 as Y

    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.uint8)

    # reference implementation (square mode)
    shape = img.shape[:2]
    new_shape = 416
    ratio = float(new_shape) / max(shape)
    new_unpad = (int(round(shape[1] * ratio)), int(round(shape[0] * ratio)))
    dw = (new_shape - new_unpad[0]) / 2
    dh = (new_shape - new_unpad[1]) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    ref = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    ref = cv2.copyMakeBorder(ref, top, bottom, left, right,
                             cv2.BORDER_CONSTANT, value=(127.5, 127.5, 127.5))
    ref = ref.astype(np.float32) / 255.0

    got = np.asarray(Y.letterbox_device(img[None].astype(np.float32),
                                        416, 240, 320))[0]
    assert got.shape == ref.shape
    # matmul letterbox is float-exact bilinear; cv2 resizes uint8 via
    # 11-bit fixed point, so parity is bounded by 1 uint8 LSB everywhere
    diff = np.abs(got - ref)
    assert diff.max() < 1.0 / 255.0 + 1e-6
    assert diff.mean() < 0.002
    # the grey pad is exact (no gather fringe blending into the border)
    assert top > 0 and bottom > 0
    np.testing.assert_array_equal(got[:top], np.float32(127.5 / 255.0))
    np.testing.assert_array_equal(got[-bottom:], np.float32(127.5 / 255.0))


def test_nms_jax_matches_numpy(rng):
    from simple_hrnet_tpu.ops import nms as N

    n = 60
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 200, n)
    boxes[:, 1] = rng.uniform(0, 200, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(20, 120, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(20, 120, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    ref_keep = N.nms_numpy(dets, 0.45)

    keep_idx, keep_valid = N.nms_jax(boxes, scores, 0.45, max_out=n,
                                     plus_one=True)
    got_keep = np.asarray(keep_idx)[np.asarray(keep_valid)].tolist()
    assert got_keep == ref_keep


def test_native_cpp_nms_matches_python(rng):
    from simple_hrnet_tpu.ops import nms as N

    if N._native_nms() is None:
        pytest.skip('libnms.so not built')

    n = 80
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = rng.uniform(0, 300, n)
    boxes[:, 1] = rng.uniform(0, 300, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 150, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 150, n)
    boxes[:, 4] = rng.uniform(0, 1, n)

    native = N.nms_numpy(boxes, 0.4)          # uses C++ when built
    # force pure python
    saved = N._NATIVE
    N._NATIVE = False
    try:
        pure = N.nms_numpy(boxes, 0.4)
    finally:
        N._NATIVE = saved
    assert native == pure

    # tied scores: argsort()[::-1] keeps the HIGHEST index first; the C++
    # comparator must agree (descending-index tie-break)
    tied = boxes.copy()
    tied[:, 4] = np.repeat(rng.uniform(0, 1, n // 4), 4).astype(np.float32)
    native_t = N.nms_numpy(tied, 0.4)
    N._NATIVE = False
    try:
        pure_t = N.nms_numpy(tied, 0.4)
    finally:
        N._NATIVE = saved
    assert native_t == pure_t


def test_detector_chunking_matches_unchunked(rng):
    """Batches larger than max_batch_size run in padded chunks with results
    identical to one unchunked pass (reference YOLOv3.py:128-133)."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    frames = rng.uniform(0, 255, (5, 96, 128, 3)).astype(np.uint8)
    small = YOLOv3(model_def='yolov3-tiny', img_size=160, max_batch_size=2)
    big = YOLOv3(model_def='yolov3-tiny', img_size=160, max_batch_size=16)
    # identical random params (both seeded PRNGKey(0))
    r_small, v_small = small.detect_padded(frames)
    r_big, v_big = big.detect_padded(frames)
    np.testing.assert_array_equal(np.asarray(v_small), np.asarray(v_big))
    np.testing.assert_allclose(np.asarray(r_small), np.asarray(r_big),
                               atol=1e-5)


def test_oks_nms_parity(rng):
    """oks_nms / soft_oks_nms match the reference misc/nms/nms.py outputs."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_nms_standalone', '/root/reference/misc/nms/nms.py')
    # reference module imports compiled cpu_nms/gpu_nms at top; stub them
    import sys, types
    for m in ('cpu_nms', 'gpu_nms'):
        if m not in sys.modules:
            stub = types.ModuleType(m)
            setattr(stub, m, lambda *a, **k: None)
            sys.modules[m] = stub
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from simple_hrnet_tpu.ops import nms as N

    db = []
    for _ in range(12):
        kp = rng.uniform(0, 200, (17, 3))
        kp[:, 2] = rng.uniform(0, 1, 17)
        db.append({'score': float(rng.uniform(0.1, 1)), 'keypoints': kp,
                   'area': float(rng.uniform(1000, 20000))})

    assert N.oks_nms(db, 0.9) == [int(i) for i in ref.oks_nms(db, 0.9)]
    assert N.soft_oks_nms(db, 0.9) == [int(i) for i in ref.soft_oks_nms(db, 0.9)]

    # linear rescore mode matches the reference's rescore() arithmetic
    ovr = rng.uniform(0, 1, 11)
    sc = rng.uniform(0.1, 1, 11)
    got = N.rescore(ovr.copy(), sc.copy(), 0.5, type='linear')
    want = ref.rescore(ovr.copy(), sc.copy(), 0.5, type='linear')
    np.testing.assert_allclose(got, want)
    got_g = N.rescore(ovr.copy(), sc.copy(), 0.5)
    want_g = ref.rescore(ovr.copy(), sc.copy(), 0.5)
    np.testing.assert_allclose(got_g, want_g)
    # and the full soft-NMS run in linear mode is deterministic + bounded
    keep_lin = N.soft_oks_nms(db, 0.3, rescore_type='linear')
    assert len(keep_lin) <= 20 and len(set(keep_lin)) == len(keep_lin)


def test_full_yolov3_forward_shape():
    """The full (non-tiny) graph produces the canonical anchor count."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import darknet

    blocks = darknet.yolov3_blocks()
    params = darknet.init(jax.random.PRNGKey(0), blocks)
    out = jax.jit(lambda p, v: darknet.apply(p, blocks, v, 320))(
        params, jnp.zeros((1, 320, 320, 3)))
    # 3 * (10^2 + 20^2 + 40^2) = 6300 at 320; at 416 it is the reference's
    # fixed 10647 (YOLOv3.py:131)
    assert out.shape == (1, 6300, 85)
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# Producer-fused space-to-depth stem (ops/phase.py, round 4)
# ---------------------------------------------------------------------------

def test_phase_kernel_transforms_exact(rng):
    """Phase-space conv == full-res conv for both stem forms (ops/phase.py):
    stride-1 3x3 (phase-to-phase) and stride-2 3x3 / 6x6 (exits to the
    standard layout). Exact zero-pad-preserving rewrites, f32 on CPU."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.ops import phase as P

    def conv(x, k, stride, pad):
        pp = pad if isinstance(pad, tuple) else ((pad, pad), (pad, pad))
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), list(pp),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    x = jnp.asarray(rng.standard_normal((2, 12, 16, 3)), jnp.float32)
    xp = jnp.asarray(P.space_to_depth_host(np.asarray(x)))

    # stride-1 3x3: output stays phase-space
    k = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    kp, pads = P.phase_kernel_s1(k, pad=1)
    assert pads == ((1, 1), (1, 1))
    want = P.space_to_depth_host(np.asarray(conv(x, jnp.asarray(k), 1, 1)))
    got = np.asarray(conv(xp, jnp.asarray(kp), 1, pads))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # stride-2 3x3 pad 1 (darknet down1) and 6x6 pad 2 (yolov5 stem):
    # output is the standard layout
    for kh, pad in ((3, 1), (6, 2)):
        k = rng.standard_normal((kh, kh, 3, 5)).astype(np.float32)
        kp, pads = P.phase_kernel_s2(k, pad=pad)
        want = np.asarray(conv(x, jnp.asarray(k), 2, pad))
        got = np.asarray(conv(xp, jnp.asarray(kp), 1, pads))
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('in_hw', [(480, 640), (500, 640), (333, 501)])
def test_letterbox_phase_matches_standard(rng, in_hw):
    """letterbox_device_phase == space-to-depth(letterbox_device) to f32 ulp
    — including geometries whose pad offset is odd (the grey border
    straddles a phase row; the pad is folded into the resize matrices)."""
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import yolov3 as Y
    from simple_hrnet_tpu.ops import phase as P

    frames = rng.uniform(0, 255, (2, *in_hw, 3)).astype(np.float32)
    std = np.asarray(Y.letterbox_device(jnp.asarray(frames), 416, *in_hw))
    ph = np.asarray(Y.letterbox_device_phase(jnp.asarray(frames), 416,
                                             *in_hw))
    assert ph.shape == (2, 208, 208, 12)
    np.testing.assert_allclose(ph, P.space_to_depth_host(std), atol=1e-6)


def test_phase_stem_gating():
    """Auto-gate: both the conv+conv (yolov3) and conv+maxpool (tiny,
    round 5) stems qualify; explicit phase_stem=False wins over auto."""
    from simple_hrnet_tpu.detectors import darknet
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    assert darknet.stem_phaseable(darknet.yolov3_blocks())
    assert darknet.stem_phaseable(darknet.yolov3_tiny_blocks())
    assert YOLOv3(model_def='yolov3-tiny').phase_stem
    assert not YOLOv3(phase_stem=False).phase_stem
    assert not YOLOv3(model_def='yolov3-tiny', phase_stem=False).phase_stem


def test_phase_stem_invalid_request_raises():
    """Explicit phase_stem=True on a non-qualifying graph or odd img_size
    fails loudly (ADVICE r4) instead of silently wrong numerics."""
    import pytest
    from simple_hrnet_tpu.detectors import darknet
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    with pytest.raises(ValueError, match='even img_size'):
        YOLOv3(phase_stem=True, img_size=415)
    # a 3x3 s2 maxpool stem (not 2x2) must NOT phase
    blocks = darknet.yolov3_tiny_blocks()
    blocks[1] = dict(blocks[1], size=3)
    assert not darknet.stem_phaseable(blocks)
    import jax
    params = darknet.fold_weights(darknet.init(jax.random.PRNGKey(0),
                                               blocks))
    with pytest.raises(ValueError, match='not qualify'):
        darknet.phase_stem_params(params, blocks)


def test_yolov3_tiny_phase_stem_detect_parity(rng):
    """conv+maxpool phase stem (round 5): a 2x2 s2 maxpool in phase space
    is an elementwise max over the 4 phase channel blocks. Full tiny
    detect pipeline: phase detections == standard detections."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    frames = rng.uniform(0, 255, (2, 240, 320, 3)).astype(np.float32)
    det_p = YOLOv3(model_def='yolov3-tiny', phase_stem=True)
    det_s = YOLOv3(model_def='yolov3-tiny', phase_stem=False)
    assert det_p.phase_stem and not det_s.phase_stem
    rows_p = det_p.predict(frames.copy())
    rows_s = det_s.predict(frames.copy())
    for a, b in zip(rows_p, rows_s):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=5e-4)


def test_yolov3_phase_stem_detect_parity(rng):
    """Full detect pipeline (letterbox -> darknet -> NMS -> rescale):
    phase-stem detections match the standard stem on random weights.
    2.73x measured on the stem chain (PERF.md round 4)."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    frames = rng.uniform(0, 255, (2, 480, 640, 3)).astype(np.float32)
    det_p = YOLOv3(phase_stem=True)
    det_s = YOLOv3(phase_stem=False)
    assert det_p.phase_stem and not det_s.phase_stem
    rows_p = det_p.predict(frames.copy())
    rows_s = det_s.predict(frames.copy())
    for a, b in zip(rows_p, rows_s):
        assert (a is None) == (b is None)
        if a is not None:
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=5e-4)


def test_parse_cfg_extended_semantics(tmp_path, rng):
    """User-cfg robustness (review round 5): mish/logistic activations
    actually apply (were silently linear), route groups split channels
    (yolov4-tiny), shortcut 'from' >= 0 is an absolute index, and an
    unknown activation fails at PARSE time, not as garbage detections."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.detectors import darknet

    cfg = tmp_path / 'toy.cfg'
    cfg.write_text("""
[net]
width=32
height=32

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=mish

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=logistic

[shortcut]
from=0
activation=linear

[route]
layers=-1
groups=2
group_id=1

[convolutional]
filters=6
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0
anchors=10,14, 23,27, 37,58
classes=1
""")
    blocks = darknet.parse_cfg(str(cfg))
    assert blocks[2]['from'] == 0
    assert blocks[3]['groups'] == 2 and blocks[3]['group_id'] == 1
    chans = darknet.output_channels(blocks)
    assert chans[3] == 4  # 8 channels route-split into 2 groups

    params = darknet.init(jax.random.PRNGKey(0), blocks)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    out = darknet.apply(params, blocks, x, img_size=32)
    assert out.shape == (1, 32 * 32, 6)  # 1 masked anchor, 1 class
    assert np.isfinite(np.asarray(out)).all()

    # the activations must actually be APPLIED (they were silently
    # dropped to linear before): the same weights under an all-linear
    # parse must produce different detections
    blocks_lin = [dict(b) for b in blocks]
    for b in blocks_lin:
        if b.get('activation') in ('mish', 'logistic'):
            b['activation'] = 'linear'
    out_lin = darknet.apply(params, blocks_lin, x, img_size=32)
    assert not np.allclose(np.asarray(out), np.asarray(out_lin))

    bad = tmp_path / 'bad.cfg'
    bad.write_text("""
[convolutional]
filters=4
size=3
stride=1
pad=1
activation=hardswish
""")
    import pytest
    with pytest.raises(ValueError, match='hardswish'):
        darknet.parse_cfg(str(bad))
