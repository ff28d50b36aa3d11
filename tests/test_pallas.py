"""Pallas kernel parity tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import pytest


def _boxes_scores(rng, n):
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 300, n)
    boxes[:, 1] = rng.uniform(0, 300, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(10, 150, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(10, 150, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    scores[rng.uniform(0, 1, n) < 0.1] = 0.0  # padding entries
    return boxes, scores


@pytest.mark.parametrize('n', [64, 256])
def test_nms_pallas_matches_nms_jax(n, rng):
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from simple_hrnet_tpu.ops import nms as N
    from simple_hrnet_tpu.ops.pallas.nms_pallas import nms_pallas

    boxes, scores = _boxes_scores(rng, n)
    ref_idx, ref_valid = N.nms_jax(boxes, scores, 0.45, max_out=32)

    with pltpu.force_tpu_interpret_mode():  # CPU test env
        idx, valid = nms_pallas(boxes, scores, 0.45, max_out=32)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)],
                                  np.asarray(ref_idx)[np.asarray(ref_valid)])


def test_nms_pallas_vmap_matches_nms_jax(rng):
    """The custom_vmap rule (grid-batched kernel — what the vmapped
    detect graph traces, detectors/yolov3.py via ops/nms.nms_ingraph)
    matches a vmapped nms_jax slot-for-slot."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from simple_hrnet_tpu.ops import nms as N
    from simple_hrnet_tpu.ops.pallas.nms_pallas import nms_pallas

    bn, n = 5, 128
    boxes = np.stack([_boxes_scores(rng, n)[0] for _ in range(bn)])
    scores = np.stack([_boxes_scores(rng, n)[1] for _ in range(bn)])

    ref_idx, ref_valid = jax.vmap(
        lambda b, s: N.nms_jax(b, s, 0.45, 32))(boxes, scores)
    with pltpu.force_tpu_interpret_mode():  # CPU test env
        idx, valid = jax.vmap(
            lambda b, s: nms_pallas(b, s, 0.45, 32))(boxes, scores)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_valid))
    rv = np.asarray(ref_valid)
    np.testing.assert_array_equal(np.asarray(idx)[rv],
                                  np.asarray(ref_idx)[rv])


def test_fused_basic_chain_matches_unfused(rng, monkeypatch):
    """Pallas fused 4-BasicBlock chain == sequential blocks (interpreter)."""
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fused_block import (fused_basic_chain,
                                                         pack_chain_weights)

    C, H, W, B = 16, 16, 16, 4
    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, C, C)))
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    y_ref = x
    for bp in blocks:
        y_ref = L.basic_block(bp, y_ref)

    wts, bias = pack_chain_weights(blocks, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = fused_basic_chain(x, wts, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_blockdiag_chain_matches_unfused(rng):
    """XLA block-diagonal image-pair chain == sequential blocks (f32, CPU),
    including the odd-batch padding path."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fused_block import (blockdiag_chain,
                                                         pack_chain_weights)

    C, H, W = 16, 16, 12
    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, C, C)))
    wts, bias = pack_chain_weights(blocks, dtype=jnp.float32)

    for B in (4, 3):  # even and odd batches
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        y_ref = x
        for bp in blocks:
            y_ref = L.basic_block(bp, y_ref)
        y = blockdiag_chain(x, wts, bias, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


def test_hrnet_apply_with_fused_chains(rng):
    """hrnet.apply(fused_chains=...) == plain apply (f32, CPU)."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=4,
                                          nof_joints=5))
    chains = hrnet.pack_fused_chains(params, dtype=jnp.float32,
                                     branches=(0,))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y0 = hrnet.apply(params, x)
    y1 = hrnet.apply(params, x, fused_chains=chains)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-4, rtol=1e-4)


def test_fuse_up_kernel_matches_xla_fuse(rng):
    """Pallas fuse_up == conv1x1 + nearest-upsample + add + relu (f32 exact,
    interpreter on CPU; compiled parity re-checked on the chip in PERF.md)."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fuse_up import fuse_up, fuse_up_supported

    B, H, W, C = 3, 24, 16, 48
    shapes = [(B, 12, 8, 96), (B, 6, 4, 192), (B, 3, 2, 384)]
    base = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    ys = [jnp.asarray(rng.standard_normal(s), jnp.float32) for s in shapes]
    ks = [jnp.asarray(rng.standard_normal((1, 1, s[3], C)) * 0.1, jnp.float32)
          for s in shapes]
    bs = [jnp.asarray(rng.standard_normal((C,)), jnp.float32) for _ in shapes]
    assert fuse_up_supported(base.shape, shapes)

    acc = base
    for y, k, b in zip(ys, ks, bs):
        t = jax.lax.conv_general_dilated(
            y, k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + b
        acc = acc + L.upsample_nearest(t, H // y.shape[1])
    ref = np.asarray(jnp.maximum(acc, 0.0))

    got = np.asarray(fuse_up(base, ys, ks, bs))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    # unsupported shapes are rejected (W not a multiple of 8 / factor 1)
    assert not fuse_up_supported((B, 24, 12, C), shapes)
    assert not fuse_up_supported(base.shape, [(B, 24, 16, 96)])


def test_hrnet_apply_with_fuse_up_pallas(rng, monkeypatch):
    """hrnet.apply(fuse_up_pallas=True) == plain apply (f32, CPU), and the
    flag is a no-op in training mode (unfolded BN)."""
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=8,
                                          nof_joints=5))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    y0 = hrnet.apply(params, x)
    y1 = hrnet.apply(params, x, fuse_up_pallas=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)

    unfolded = hrnet.init(jax.random.PRNGKey(0), c=8, nof_joints=5)
    stats = {}
    out = hrnet.apply(unfolded, x, train=True, stats=stats,
                      fuse_up_pallas=True)  # must silently fall back
    assert out.shape == (2, 16, 16, 5)


def test_grouped_trunk_pallas_chain_matches_plain(rng, monkeypatch):
    """Grouped trunk with the 128-lane Pallas chain on grouped branch0
    (W32's G=4 x C=32 production path) == plain apply (f32, interpreter)."""
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet, hrnet_fast
    from simple_hrnet_tpu.models import layers as L

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=32,
                                          nof_joints=5))
    packed = hrnet_fast.pack_grouped(params, group=4, pallas_chains=True)
    assert 'chain0' in packed['stage2']['0']['branches']
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    y0 = hrnet.apply(params, x)
    y1 = hrnet_fast.apply_grouped(params, packed, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-3, rtol=1e-4)


def test_fused_chain_auto_mode_and_fallback(rng):
    """pack_fused_chains(mode='auto') picks pallas only at 128 packed
    lanes, and fused_basic_chain falls back to blockdiag on W % 8 != 0."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fused_block import (fused_basic_chain,
                                                         pack_chain_weights)

    p32 = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=32,
                                       nof_joints=5))
    modes32 = {m for m, _, _ in hrnet.pack_fused_chains(p32).values()}
    assert modes32 == {'pallas'}  # 32 x G=4 == 128 lanes
    p48 = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(1), c=48,
                                       nof_joints=5))
    modes48 = {m for m, _, _ in hrnet.pack_fused_chains(p48).values()}
    assert modes48 == {'blockdiag'}  # 48 x G=2 == 96 lanes: XLA wins

    # W % 8 != 0 silently takes the blockdiag path (no Mosaic constraint)
    C = 16
    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, C, C)))
    wts, bias = pack_chain_weights(blocks, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 16, 12, C)), jnp.float32)
    y_ref = x
    for bp in blocks:
        y_ref = L.basic_block(bp, y_ref)
    y = fused_basic_chain(x, wts, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_grouped_trunk_matches_plain(rng):
    """hrnet_fast.apply_grouped == hrnet.apply (f32, CPU)."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet, hrnet_fast
    from simple_hrnet_tpu.models import layers as L

    params = L.fold_batch_norm(hrnet.init(jax.random.PRNGKey(0), c=4,
                                          nof_joints=5))
    packed = hrnet_fast.pack_grouped(params, group=2)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    y0 = hrnet.apply(params, x)
    y1 = hrnet_fast.apply_grouped(params, packed, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-3, rtol=1e-4)


def test_winograd_chain_pallas_matches_unfused(rng, monkeypatch):
    """Winograd-H Pallas chain == sequential blocks (f32, interpreter).

    F(2,3) along H with taps-on-lanes kx (winograd_chain.py); exactness
    here is the {0, +-1, +-0.5} transform arithmetic, f32."""
    monkeypatch.setenv('SHT_PALLAS_CPU_INTERPRET', '1')
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fused_block import pack_chain_weights
    from simple_hrnet_tpu.ops.pallas.winograd_chain import (
        chain_pallas_grouped_wino, pack_winograd_weights)

    C, H, W, B, G = 16, 16, 16, 4, 2
    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, C, C)))
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    y_ref = x
    for bp in blocks:
        y_ref = L.basic_block(bp, y_ref)

    wts, bias = pack_chain_weights(blocks, dtype=jnp.float32, group=G)
    w_wino = pack_winograd_weights(wts, dtype=jnp.float32)
    # batch-halves packing (as fused_basic_chain)
    step = B // G
    xg = jnp.concatenate([x[g * step:(g + 1) * step] for g in range(G)],
                         axis=-1)
    with pltpu.force_tpu_interpret_mode():
        yg = chain_pallas_grouped_wino(xg, w_wino, bias)
    y = jnp.concatenate([yg[..., g * C:(g + 1) * C] for g in range(G)],
                        axis=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_winograd_chain_xla_matches_unfused(rng):
    """Pure-XLA Winograd-H blockdiag chain == sequential blocks (f32, CPU),
    including the odd-batch padding path."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import layers as L
    from simple_hrnet_tpu.ops.pallas.fused_block import pack_chain_weights
    from simple_hrnet_tpu.ops.pallas.winograd_chain import (
        blockdiag_chain_wino, pack_winograd_weights_xla)

    C, H, W = 16, 16, 12
    key = jax.random.PRNGKey(1)
    blocks = []
    for _ in range(4):
        key, k = jax.random.split(key)
        blocks.append(L.fold_batch_norm(L.init_basic_block(k, C, C)))
    wts, bias = pack_chain_weights(blocks, dtype=jnp.float32)
    w4 = pack_winograd_weights_xla(wts)

    for B in (4, 3):
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
        y_ref = x
        for bp in blocks:
            y_ref = L.basic_block(bp, y_ref)
        y = blockdiag_chain_wino(x, w4, bias, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)
