"""Int8 post-training quantization (models/quantize.py).

The int8 conv itself is bit-exact integer arithmetic on every backend
(pinned below); the quantization error budget is the scales, pinned via
rel-error bounds and end-to-end heatmap argmax parity on a random-weight
HRNet — the same guarantee TRT int8 gives (calibrated engines keep peak
locations; absolute values shift by <~1%).
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + 8 virtual devices)

import jax
import jax.numpy as jnp

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.models import quantize as Q


def test_int8_conv_matches_integer_reference(rng):
    """The quantized conv's integer core is exact: int8 conv == f32 conv of
    the quantized operands (no hidden saturation/rounding in the backend)."""
    x = rng.standard_normal((2, 16, 12, 32)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 32, 32)) * 0.1).astype(np.float32)
    node = {'kernel': jnp.asarray(k), 'bias': jnp.zeros((32,))}
    qnode = Q.quantize_folded({'c': node}, {id(node): float(np.abs(x).max())},
                              policy=lambda s: True)['c']
    got = L.conv2d(jnp.asarray(x), qnode, stride=1, padding=1)

    a = float(qnode['ascale'])
    xq = np.clip(np.round(x / a), -127, 127)
    kq = np.asarray(qnode['kernel_q'], np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq * a), jnp.asarray(kq) * qnode['wscale'],
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_conv_rel_error_bound(rng):
    """8-bit symmetric quantization of a single conv stays under ~2% rel
    error on gaussian data (the per-layer budget the policy assumes)."""
    x = rng.standard_normal((2, 24, 18, 48)).astype(np.float32)
    k = (rng.standard_normal((3, 3, 48, 48)) * 0.08).astype(np.float32)
    node = {'kernel': jnp.asarray(k)}
    f32 = L.conv2d(jnp.asarray(x), node, stride=1, padding=1)
    qnode = Q.quantize_folded({'c': node}, {id(node): float(np.abs(x).max())},
                              policy=lambda s: True)['c']
    q = L.conv2d(jnp.asarray(x), qnode, stride=1, padding=1)
    rel = float(jnp.linalg.norm(q - f32) / jnp.linalg.norm(f32))
    assert rel < 0.02, rel


def test_calibrate_and_policy_selection(rng):
    """Calibration records every eager conv input; the default policy
    quantizes the 3x3 C-in-[16,128] trunk and leaves the stem (C_in=3)
    and the final 1x1 decode layer untouched."""
    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=32,
                                          nof_joints=17))
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    qp = Q.quantize_model(lambda p, v: hrnet.apply(p, v), params, [x])

    assert 'kernel' in qp['conv1'], 'image stem must stay unquantized'
    assert 'kernel' in qp['final_layer'], 'decode 1x1 must stay unquantized'
    # branch convs (C=32/64/128) are the targets
    assert 'kernel_q' in qp['stage2']['0']['branches']['0']['0']['conv1']
    leaves = []

    def count(t):
        if isinstance(t, dict):
            if 'kernel_q' in t:
                leaves.append(t)
            for v in t.values():
                count(v)
    count(qp)
    assert len(leaves) > 30, f'only {len(leaves)} convs quantized'
    for t in leaves:
        ci, co = t['kernel_q'].shape[2], t['kernel_q'].shape[3]
        assert 16 <= ci <= 128 and 16 <= co <= 128


def test_int8_hrnet_heatmap_parity():
    """End-to-end: int8 HRNet keeps the f32 model's heatmap argmax on a
    smooth input, and the heatmaps stay within a few percent."""
    # dedicated generator: the shared session rng's state depends on test
    # ORDER, and argmax agreement of near-flat random-weight heatmaps is
    # sensitive to the exact sample (observed 0.79-0.85 across orderings)
    rng = np.random.default_rng(1234)
    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(1), c=32,
                                          nof_joints=17))
    # smooth image-like input: coarse noise field upsampled 8x
    coarse = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    x = np.kron(coarse.transpose(0, 3, 1, 2),
                np.ones((8, 8), np.float32)).transpose(0, 2, 3, 1)
    qp = Q.quantize_model(lambda p, v: hrnet.apply(p, v), params,
                          [x.astype(np.float32)])

    hm32 = np.asarray(hrnet.apply(params, jnp.asarray(x)))
    hmq = np.asarray(hrnet.apply(qp, jnp.asarray(x)))
    rel = np.linalg.norm(hmq - hm32) / np.linalg.norm(hm32)
    assert rel < 0.05, rel
    h, w = hm32.shape[1:3]
    flat32 = hm32.reshape(2, -1, 17).argmax(axis=1)
    flatq = hmq.reshape(2, -1, 17).argmax(axis=1)
    agree = np.mean(flat32 == flatq)
    assert agree >= 0.8, agree
    # random-weight heatmaps have near-flat maxima, so when the argmax
    # moves it must move to a nearby, near-equal peak — pin peak-value
    # closeness rather than exact location
    peak32 = hm32.reshape(2, -1, 17).max(axis=1)
    peakq = hmq.reshape(2, -1, 17).max(axis=1)
    np.testing.assert_allclose(peakq, peak32,
                               atol=0.05 * np.abs(peak32).max())


def test_quantized_apply_is_jittable(rng):
    """The quantized tree runs under jit with static scales baked in as
    ordinary params (no retrace per batch)."""
    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(2), c=32,
                                          nof_joints=17))
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    qp = Q.quantize_model(lambda p, v: hrnet.apply(p, v), params, [x])
    f = jax.jit(lambda p, v: hrnet.apply(p, v, dtype=jnp.bfloat16))
    y1 = f(qp, jnp.asarray(x))
    y2 = f(qp, jnp.asarray(x * 0.5))
    assert y1.shape == (1, 16, 16, 17) and not np.allclose(y1, y2)


def test_int8_packed_chain_matches_per_conv_quantized(rng):
    """The packed int8 chain (blockdiag_chain_int8_grouped) reproduces the
    per-conv quantized BasicBlock chain exactly — same scales, same int8
    weights block-diag tiled, exact int32 conv cores, f32 handoffs."""
    from simple_hrnet_tpu.ops.pallas import fused_block as FB

    c, group = 32, 2
    blocks, amax = [], {}
    x = rng.standard_normal((4, 16, 16, c)).astype(np.float32)
    for i in range(4):
        blk = {}
        for ck in ('conv1', 'conv2'):
            blk[ck] = {'kernel': jnp.asarray(
                rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1),
                'bias': jnp.asarray(
                    rng.standard_normal(c).astype(np.float32) * 0.05)}
        blocks.append(blk)

    # reference: per-conv quantized chain via layers.conv2d, recording the
    # same calibration amaxes the packed path consumes
    v = jnp.asarray(x)
    qnodes = []
    for blk in blocks:
        res = v
        for j, ck in enumerate(('conv1', 'conv2')):
            amax[id(blk[ck])] = float(jnp.max(jnp.abs(v)))
            qn = Q.quantize_folded(
                {'c': blk[ck]}, {id(blk[ck]): amax[id(blk[ck])]},
                policy=lambda s: True)['c']
            qnodes.append(qn)
            v = L.conv2d(v, qn, stride=1, padding=1)
            v = jnp.maximum(v + (res if j == 1 else 0.0), 0.0)
    ref = v

    q = FB.pack_chain_weights_int8(blocks, amax, group=group)
    step = x.shape[0] // group
    xg = jnp.concatenate([jnp.asarray(x[g * step:(g + 1) * step])
                          for g in range(group)], axis=-1)
    out = FB.blockdiag_chain_int8_grouped(xg, q, dtype=jnp.float32)
    got = jnp.concatenate([out[..., g * c:(g + 1) * c] for g in range(group)],
                          axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_int8_grouped_model_close_to_plain_quantized(rng):
    """apply_grouped with int8 chains tracks the plain quantized forward.

    Not bit-equal by design: packed 3x3 transitions/fuse-downs quantize
    whole-packed-tensor (per-packed-output-channel weight scales) while
    the plain tree quantizes per original conv, and the plain policy's
    channel bounds differ from the packer's kernel-size-only rule — the
    two paths differ by independent-rounding error only."""
    from simple_hrnet_tpu.models import hrnet_fast

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(3), c=32,
                                          nof_joints=17))
    x = rng.standard_normal((4, 64, 64, 3)).astype(np.float32)
    amax = Q.calibrate(lambda p, v: hrnet.apply(p, v), params, [x])
    # group=2 -> 64 packed lanes != 128: the int8 chains engage (at 128
    # the Pallas bf16 kernel wins and pack_grouped keeps it instead)
    packed = hrnet_fast.pack_grouped(params, group=2, int8_amax=amax)
    found = [k for k in packed['stage2']['0']['branches']
             if k.endswith('_q')]
    assert found, 'int8 chain entries missing from packed tree'

    qp = Q.quantize_folded(params, amax)
    ref = np.asarray(hrnet.apply(qp, jnp.asarray(x)))
    got = np.asarray(hrnet_fast.apply_grouped(qp, packed, jnp.asarray(x)))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_facade_int8(tmp_path, rng):
    """SimpleHRNet(dtype='int8') calibrates, quantizes and predicts."""
    import conftest as _c
    _c.reference_on_path()
    import torch
    from models_.hrnet import HRNet as TorchHRNet
    from simple_hrnet_tpu.api import SimpleHRNet

    torch.manual_seed(0)
    path = tmp_path / 'pose_hrnet_w32.pth'
    torch.save(TorchHRNet(c=32, nof_joints=17).state_dict(), str(path))

    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    m8 = SimpleHRNet(32, 17, str(path), multiperson=False,
                     resolution=(64, 64), dtype='int8')
    mf = SimpleHRNet(32, 17, str(path), multiperson=False,
                     resolution=(64, 64))
    pts8 = m8.predict(img)
    ptsf = mf.predict(img)
    assert pts8.shape == ptsf.shape == (1, 17, 3)
    # int8 keypoints stay near the f32 ones on the 16x16 heatmap grid
    assert np.median(np.abs(pts8[..., :2] - ptsf[..., :2])) <= 8.0


def test_int8_fused_engine_export(tmp_path, rng, monkeypatch):
    """--int8 --fused engines: calibrated int8 + grouped trunk baked into
    the serialized module; outputs track the live f32 model."""
    import jax
    from simple_hrnet_tpu.utils import checkpoint as ckpt
    from simple_hrnet_tpu.utils.export import Engine, export_engine

    # interpret mode ON so that if export ever packed pallas-eligible
    # ('_q') chains, the CPU trace would at least take the kernel path
    # (as interpreted ops); the byte-level custom-call assertion below is
    # load-bearing on TPU exports, structural _qx packing on all backends
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')

    params = hrnet.init(jax.random.PRNGKey(0), c=32, nof_joints=17)
    ckpt_path = str(tmp_path / 'w32.npz')
    ckpt.save(ckpt_path, params)
    out = export_engine(str(tmp_path / 'w32_int8.jaxpose'), ckpt_path, c=32,
                        model_name='HRNet', resolution=(64, 64),
                        batch_size=2, int8=True, fused=True)
    engine = Engine(out)
    assert engine.meta['int8'] and engine.meta['fused']

    # portability: fused engines must never bake a Mosaic custom call
    # (pack_grouped stores XLA-only chain weights under the _qx key)
    import zipfile
    with zipfile.ZipFile(out) as z:
        assert b'tpu_custom_call' not in z.read('module.shlo')

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    y = np.asarray(engine(x))
    ref = np.asarray(hrnet.apply(L.fold_batch_norm(params), jnp.asarray(x)))
    assert y.shape == ref.shape == (2, 16, 16, 17)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.1, rel  # int8+bf16 vs f32, random weights


def test_yolov3_int8(rng):
    """YOLOv3(dtype='int8'): small graphs (tiny, 13 convs) skip the
    quantization and run pure bf16 — measured faster than the quantized
    mix at every stem (PERF.md round 5) — while still detecting; the
    full graph's quantization is pinned in test_yolov3_int8_phase_stem."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    d8 = YOLOv3(model_def='yolov3-tiny', dtype='int8')
    df = YOLOv3(model_def='yolov3-tiny')

    qcount = []

    def count(t):
        if isinstance(t, dict):
            if 'kernel_q' in t:
                qcount.append(t)
            for v in t.values():
                count(v)
    count(d8.params)
    assert not qcount, 'tiny must skip quantization (bf16 measured faster)'
    assert d8.dtype == jnp.bfloat16

    frames = rng.integers(0, 255, (2, 224, 320, 3), dtype=np.uint8)
    r8, v8 = d8._detect(jnp.asarray(frames, jnp.float32))
    rf, vf = df._detect(jnp.asarray(frames, jnp.float32))
    assert r8.shape == rf.shape
    assert np.asarray(v8).shape == np.asarray(vf).shape


def test_yolov5_int8(rng):
    """YOLOv5(dtype='int8') runs pure bf16 — quantizing its small-channel
    C3 convs measured a net LOSS (7.26 vs 6.90 ms b8, PERF.md round 5) so
    'int8' resolves to the fastest mixed precision — and still detects."""
    from simple_hrnet_tpu.detectors.yolov5 import YOLOv5

    d8 = YOLOv5(model_def='yolov5n', img_size=320, dtype='int8')
    qcount = []

    def count(t):
        if isinstance(t, dict):
            if 'kernel_q' in t:
                qcount.append(t)
            for v in t.values():
                count(v)
    count(d8.params)
    assert not qcount, 'yolov5 must skip quantization (bf16 faster)'
    assert d8.dtype == jnp.bfloat16
    frames = rng.integers(0, 255, (1, 224, 320, 3), dtype=np.uint8)
    rows, valid = d8._detect(jnp.asarray(frames, jnp.float32))
    assert rows.shape[0] == 1 and rows.shape[2] == 7


def test_pallas_int8_chain_matches_xla_int8(rng, monkeypatch):
    """The VMEM-resident int8 chain kernel tracks the XLA int8 blockdiag
    chain (interpret mode on CPU). Not bit-equal: the kernel quantizes mid
    activations from f32 where the XLA path round-trips them through bf16
    first — a few int8 bins shift near rounding boundaries."""
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')
    from simple_hrnet_tpu.ops.pallas import fused_block as FB

    c, group = 32, 4  # 128 packed lanes: the shape the kernel engages at
    blocks, amax = [], {}
    x = (rng.standard_normal((8, 16, 16, c)) * 0.5).astype(np.float32)
    v = jnp.asarray(x)
    for i in range(4):
        blk = {}
        for ck in ('conv1', 'conv2'):
            blk[ck] = {'kernel': jnp.asarray(
                rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.08),
                'bias': jnp.asarray(
                    rng.standard_normal(c).astype(np.float32) * 0.05)}
        blocks.append(blk)
        res = v
        for j, ck in enumerate(('conv1', 'conv2')):
            amax[id(blk[ck])] = float(jnp.max(jnp.abs(v)))
            v = jax.lax.conv_general_dilated(
                v, blk[ck]['kernel'], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + blk[ck]['bias']
            v = jnp.maximum(v + (res if j == 1 else 0.0), 0.0)

    q = FB.pack_chain_weights_int8(blocks, amax, group=group)
    step = x.shape[0] // group
    xg = jnp.concatenate([jnp.asarray(x[g * step:(g + 1) * step])
                          for g in range(group)], axis=-1)
    assert FB.chain_pallas_int8_ok(xg.shape[2], q['wq'].shape[-1])
    ref = np.asarray(FB.blockdiag_chain_int8_grouped(xg, q,
                                                     dtype=jnp.float32))
    got = np.asarray(FB.chain_pallas_int8_grouped(xg, q))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, rel
    # and both track the f32 chain
    f32 = np.asarray(v)
    relf = np.linalg.norm(
        np.concatenate([got[..., g * c:(g + 1) * c] for g in range(group)])
        - f32) / np.linalg.norm(f32)
    assert relf < 0.1, relf


def test_facade_int8_real_calibration(tmp_path, rng):
    """calibration_images feeds real frames into the int8 scale
    calibration instead of the synthetic default."""
    import conftest as _c
    _c.reference_on_path()
    import torch
    from models_.hrnet import HRNet as TorchHRNet
    from simple_hrnet_tpu.api import SimpleHRNet

    torch.manual_seed(0)
    path = tmp_path / 'w32.pth'
    torch.save(TorchHRNet(c=32, nof_joints=17).state_dict(), str(path))

    cal = [rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
           for _ in range(2)]
    m = SimpleHRNet(32, 17, str(path), multiperson=False,
                    resolution=(64, 64), dtype='int8',
                    calibration_images=cal)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    pts = m.predict(img)
    assert pts.shape == (1, 17, 3)

    found = []

    def count(t):
        if isinstance(t, dict):
            if 'kernel_q' in t:
                found.append(t)
            for v in t.values():
                count(v)
    count(m.params)
    assert found


def test_yolov3_int8_phase_stem(rng):
    """int8 + phase_stem compose (ADVICE r4): the phase conv_0/conv_1
    fall outside the int8 policy (their (3,3,12,128)/(2,2,128,64) forms
    are rejected), so enabling phase_stem trades conv_1's int8 coverage
    for the 2.73x phase chain — one fewer node quantized than plain, and
    the combined graph constructs and detects."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    dp = YOLOv3(dtype='int8', phase_stem=True)
    ds = YOLOv3(dtype='int8', phase_stem=False)
    assert dp.phase_stem and not ds.phase_stem

    def qnames(det):
        return {k for k, v in det.params.items()
                if isinstance(v, dict) and 'kernel_q' in v}
    qp, qs = qnames(dp), qnames(ds)
    assert 'conv_1' in qs and 'conv_1' not in qp
    assert 'conv_0' not in qp and 'conv_0' not in qs
    assert qp == qs - {'conv_1'}

    frames = rng.integers(0, 255, (2, 224, 320, 3), dtype=np.uint8)
    rp, vp = dp._detect(jnp.asarray(frames, jnp.float32))
    rs, vs = ds._detect(jnp.asarray(frames, jnp.float32))
    assert rp.shape == rs.shape
    assert np.asarray(vp).shape == np.asarray(vs).shape


def test_facade_int8_exclude_stage(tmp_path, rng):
    """int8_exclude keeps named param groups bf16 (the accuracy-policy
    knob from the round-5 per-stage sensitivity sweep): no conv under the
    excluded prefix carries kernel_q, everything else quantizes as
    before, and predict still works."""
    import conftest as _c
    _c.reference_on_path()
    import torch
    from models_.hrnet import HRNet as TorchHRNet
    from simple_hrnet_tpu.api import SimpleHRNet
    from simple_hrnet_tpu.models import quantize as Q

    torch.manual_seed(0)
    path = tmp_path / 'pose_hrnet_w32.pth'
    torch.save(TorchHRNet(c=32, nof_joints=17).state_dict(), str(path))

    def qpaths(params):
        return {p for i, p in Q.node_paths(params).items()
                if _node_by_path(params, p).get('kernel_q') is not None}

    m_all = SimpleHRNet(32, 17, str(path), multiperson=False,
                        resolution=(64, 64), dtype='int8',
                        use_fused_kernels=False)
    m_exc = SimpleHRNet(32, 17, str(path), multiperson=False,
                        resolution=(64, 64), dtype='int8',
                        use_fused_kernels=False,
                        int8_exclude=('stage4',))
    q_all, q_exc = qpaths(m_all.params), qpaths(m_exc.params)
    assert any(p.startswith('stage4.') for p in q_all)
    assert not any(p.startswith('stage4.') for p in q_exc)
    assert q_exc == {p for p in q_all if not p.startswith('stage4.')}
    assert q_exc  # the rest still quantizes

    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    assert m_exc.predict(img).shape == (1, 17, 3)


def _node_by_path(params, dotted):
    node = params
    for k in dotted.split('.'):
        node = node[k]
    return node


def test_filter_amax_unmatched_prefix_raises():
    """The int8_exclude accuracy knob must fail loudly on a typo'd or
    wrong-model prefix instead of silently quantizing everything."""
    params = {'stage4': {'0': {'kernel': np.zeros((3, 3, 8, 8))}},
              'conv1': {'kernel': np.zeros((3, 3, 3, 8))}}
    amax = {i: 1.0 for i in Q.node_paths(params)}

    kept = Q.filter_amax(params, amax, ('stage4',))
    assert len(kept) == 1  # conv1 survives

    with pytest.raises(ValueError, match='stage_4'):
        Q.filter_amax(params, amax, ('stage_4',))
    with pytest.raises(ValueError, match='Stage4'):
        Q.filter_amax(params, amax, ('Stage4',))


def test_int8_exclude_requires_int8_dtype(tmp_path):
    """int8_exclude with dtype!='int8' is a misconfiguration (nothing is
    quantized), not a silent no-op."""
    from simple_hrnet_tpu.api import SimpleHRNet
    with pytest.raises(ValueError, match='int8_exclude'):
        SimpleHRNet(32, 17, str(tmp_path / 'absent.pth'),
                    dtype='bfloat16', int8_exclude=('stage4',))


def test_cli_export_exclude_parsing():
    from simple_hrnet_tpu.cli.export import main, parse_int8_exclude
    assert parse_int8_exclude('stage4, transition3') == (
        'stage4', 'transition3')
    assert parse_int8_exclude(' ') == ()
    assert parse_int8_exclude(('stage4',)) == ('stage4',)
    with pytest.raises(ValueError, match='int8_exclude'):
        main(int8=False, int8_exclude='stage4')


def test_yolov3_quantize_int8_override(rng):
    """quantize_int8= overrides the measured graph-size policy both ways
    (tiny normally skips PTQ; forcing it quantizes the eligible convs)."""
    from simple_hrnet_tpu.detectors.yolov3 import YOLOv3

    with pytest.raises(ValueError, match='quantize_int8'):
        YOLOv3(model_def='yolov3-tiny', quantize_int8=True)

    forced = YOLOv3(model_def='yolov3-tiny', img_size=320, dtype='int8',
                    quantize_int8=True)
    assert _count_quantized(forced.params), 'forced PTQ must quantize'
    frames = rng.integers(0, 255, (1, 224, 320, 3), dtype=np.uint8)
    r, v = forced._detect(jnp.asarray(frames, jnp.float32))
    assert r.shape[0] == 1 and np.asarray(v).shape[0] == 1


def test_yolov5_quantize_int8_override(rng):
    """YOLOv5's measured policy (pure bf16 under 'int8') has the same
    escape hatch as YOLOv3: quantize_int8=True runs the real PTQ path."""
    from simple_hrnet_tpu.detectors.yolov5 import YOLOv5

    with pytest.raises(ValueError, match='quantize_int8'):
        YOLOv5(model_def='yolov5n', quantize_int8=True)

    forced = YOLOv5(model_def='yolov5n', img_size=320, dtype='int8',
                    quantize_int8=True)
    assert _count_quantized(forced.params), 'forced PTQ must quantize'
    assert forced.dtype == jnp.bfloat16
    frames = rng.integers(0, 255, (1, 224, 320, 3), dtype=np.uint8)
    dets = forced.predict_single(frames[0])
    assert dets is None or dets.shape[1] == 7


def _count_quantized(params):
    n = []

    def walk(t):
        if isinstance(t, dict):
            if 'kernel_q' in t:
                n.append(t)
            for v in t.values():
                walk(v)
    walk(params)
    return len(n)
