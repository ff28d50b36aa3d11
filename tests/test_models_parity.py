"""Bit-faithful parity of the JAX models vs the torch reference.

Strategy (SURVEY.md §4): random-init the reference torch model (including
randomized BN affine + running stats so every converter mapping is
load-bearing), convert its state_dict with our converter, and compare forward
outputs on random inputs. This is exactly the guarantee users need for
official ``pose_hrnet_*`` / ``pose_resnet_*`` checkpoints
(reference hrnet.py:192-216 smoke recipe), without shipping weights.
"""

import numpy as np
import pytest

import conftest


def _randomize_torch_bn(model, gen):
    import torch
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.from_numpy(
                    gen.uniform(0.5, 1.5, m.weight.shape).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    gen.uniform(-0.2, 0.2, m.bias.shape).astype(np.float32)))
                m.running_mean.copy_(torch.from_numpy(
                    gen.uniform(-0.5, 0.5, m.running_mean.shape).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    gen.uniform(0.5, 2.0, m.running_var.shape).astype(np.float32)))


def _forward_torch(model, x_nchw):
    import torch
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(x_nchw)).numpy()


@pytest.mark.parametrize('c,hw', [(32, (64, 64))])
def test_hrnet_parity(c, hw, rng):
    conftest.reference_on_path()
    from models_.hrnet import HRNet as TorchHRNet  # reference model

    import jax
    from simple_hrnet_tpu.models import convert, hrnet
    from simple_hrnet_tpu.models import layers as L

    torch_model = TorchHRNet(c=c, nof_joints=17)
    _randomize_torch_bn(torch_model, rng)
    x = rng.standard_normal((2, 3, *hw)).astype(np.float32)
    ref = _forward_torch(torch_model, x)

    tree = convert.state_dict_to_tree(torch_model.state_dict())
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    out = jax.jit(hrnet.apply)(tree, x_nhwc)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)

    # Folded-BN inference path must match the unfolded one.
    folded = L.fold_batch_norm(tree)
    out_folded = jax.jit(hrnet.apply)(folded, x_nhwc)
    out_folded = np.transpose(np.asarray(out_folded), (0, 3, 1, 2))
    np.testing.assert_allclose(out_folded, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize('size,hw', [(18, (64, 64)), (50, (64, 64))])
def test_poseresnet_parity(size, hw, rng):
    conftest.reference_on_path()
    import torch
    from models_.poseresnet import PoseResNet as TorchPoseResNet

    import jax
    from simple_hrnet_tpu.models import convert, poseresnet

    if size in (18, 34):
        # Reference BasicBlock builds conv2 with in_channels=inplanes
        # (modules.py:51), which crashes for PoseResNet-18/34 the moment a
        # stride-2 stage changes the width. Verify the latent bug, then skip.
        torch_model = TorchPoseResNet(resnet_size=size, nof_joints=17)
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                torch_model(torch.zeros(1, 3, *hw))
        return

    torch_model = TorchPoseResNet(resnet_size=size, nof_joints=17)
    _randomize_torch_bn(torch_model, rng)
    x = rng.standard_normal((2, 3, *hw)).astype(np.float32)
    ref = _forward_torch(torch_model, x)

    tree = convert.state_dict_to_tree(torch_model.state_dict())
    out = jax.jit(lambda p, v: poseresnet.apply(p, v, resnet_size=size))(
        tree, np.transpose(x, (0, 2, 3, 1)))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_roundtrip_state_dict(rng):
    """tree -> state_dict -> tree is the identity (export path)."""
    import jax
    from simple_hrnet_tpu.models import convert, poseresnet

    tree = poseresnet.init(jax.random.PRNGKey(0), resnet_size=50)
    sd = convert.tree_to_state_dict(tree)
    tree2 = convert.state_dict_to_tree(sd)

    flat1 = jax.tree_util.tree_leaves_with_path(tree)
    flat2 = jax.tree_util.tree_leaves_with_path(tree2)
    assert len(flat1) == len(flat2)
    for (p1, v1), (p2, v2) in zip(sorted(flat1, key=lambda t: str(t[0])),
                                  sorted(flat2, key=lambda t: str(t[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_fold_batch_norm_key_order_insensitive(rng):
    """Folding must not depend on dict iteration order (npz-loaded trees
    alphabetize 'bn1' before 'conv1'; regression for a silent double-BN)."""
    import jax
    from simple_hrnet_tpu.models import layers as L

    blk = L.init_basic_block(jax.random.PRNGKey(0), 8, 8)
    reordered = {k: blk[k] for k in sorted(blk.keys())}  # bn1 first
    f1 = L.fold_batch_norm(blk)
    f2 = L.fold_batch_norm(reordered)
    assert sorted(f1.keys()) == sorted(f2.keys()) == ['conv1', 'conv2']
    x = np.asarray(rng.standard_normal((1, 8, 8, 8)), np.float32)
    np.testing.assert_allclose(np.asarray(L.basic_block(f1, x)),
                               np.asarray(L.basic_block(f2, x)), atol=1e-6)


def test_init_conv_matches_torch_bound(rng):
    """init_conv's uniform bound must equal torch nn.Conv2d's default
    kaiming_uniform(a=sqrt(5)) bound of 1/sqrt(fan_in) — an earlier
    revision dropped the sqrt(1/3) gain and was sqrt(3)x too wide."""
    import jax
    from simple_hrnet_tpu.models import layers as L

    k, c_in, c_out = 3, 64, 64
    fan_in = c_in * k * k
    bound = 1.0 / np.sqrt(fan_in)

    p = L.init_conv(jax.random.PRNGKey(0), k, c_in, c_out, bias=True)
    w = np.asarray(p['kernel'])
    assert np.abs(w).max() <= bound * 1.0001
    assert np.abs(w).max() >= bound * 0.99       # 36k samples fill the range
    assert abs(w.std() - bound / np.sqrt(3)) < 0.02 * bound  # uniform std
    b = np.asarray(p['bias'])
    assert np.abs(b).max() <= 1.0 / np.sqrt(fan_in) * 1.0001

    # torch cross-check on the same geometry
    import torch
    torch.manual_seed(0)
    tw = torch.nn.Conv2d(c_in, c_out, k).weight.detach().numpy()
    assert abs(np.abs(tw).max() - np.abs(w).max()) < 0.05 * bound

    # the darknet init shares the same arithmetic (it reuses init_conv)
    from simple_hrnet_tpu.detectors import darknet
    params = darknet.init(jax.random.PRNGKey(1),
                          darknet.yolov3_tiny_blocks())
    w0 = np.asarray(params['conv_0']['kernel'])   # 3x3x3 -> fan_in 27
    assert np.abs(w0).max() <= 1.0 / np.sqrt(27) * 1.0001


def test_fused_chains_ignored_in_train_mode(rng):
    """The inference-only packed-chain fast path must NOT engage under
    train=True (frozen folded constants would zero branch gradients and
    record no BN stats): garbage chain entries are never touched."""
    import jax
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import hrnet

    params = hrnet.init(jax.random.PRNGKey(0), c=4, nof_joints=5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    junk = {f'stage{s}.{m}.branches.{b}': ('blockdiag', object(), object())
            for s in (2, 3, 4) for m in range(4) for b in range(4)}

    stats = {}
    out = hrnet.apply(params, x, train=True, stats=stats,
                      fused_chains=junk)   # junk untouched => gated off
    assert out.shape[0] == 2 and out.shape[-1] == 5
    assert any('branches' in k for k in stats)  # branch BNs recorded

    with pytest.raises(Exception):
        # sanity: in EVAL mode the junk chains WOULD be dereferenced
        hrnet.apply(params, x, train=False, fused_chains=junk)


def test_max_pool_integer_dtype():
    import jax.numpy as jnp
    from simple_hrnet_tpu.models import layers as L

    x = jnp.arange(16, dtype=jnp.int32).reshape(1, 4, 4, 1)
    y = L.max_pool(x, window=3, stride=2, padding=1)
    assert y.shape == (1, 2, 2, 1)
    assert int(y[0, 1, 1, 0]) == 15
