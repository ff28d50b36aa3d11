"""Grouped-trunk TRAINING parity (train/grouped.py): forward, BN batch
statistics, gradients and a full optimizer step must match the plain
models/hrnet.apply path to f32 reduction-reorder tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from simple_hrnet_tpu.models import hrnet
from simple_hrnet_tpu.models import layers as L
from simple_hrnet_tpu.train import grouped as G
from simple_hrnet_tpu.train import losses, steps


C = 16
RES = (64, 64)
BATCH = 4
GROUP = 2


@pytest.fixture(scope='module')
def setup():
    # deterministic draw: with the session-scoped rng the data (and so the
    # f32 BN-variance cancellation noise on the loss) depended on which
    # test files ran before this one — observed 5.7e-6 absolute loss diff
    # in one ordering and a test_gradient_parity failure in another
    rng = np.random.default_rng(20260817)
    params = hrnet.init(jax.random.PRNGKey(0), c=C, nof_joints=17)
    x = jnp.asarray(rng.standard_normal((BATCH, *RES, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal(
        (BATCH, RES[0] // 4, RES[1] // 4, 17)), jnp.float32)
    tw = jnp.ones((BATCH, 17, 1), jnp.float32)
    return params, x, tgt, tw


def test_forward_and_stats_parity(setup):
    params, x, _, _ = setup
    stats_p, stats_g = {}, {}
    out_p = hrnet.apply(params, x, train=True, stats=stats_p)
    out_g = G.apply_grouped(params, x, group=GROUP, train=True,
                            stats=stats_g)
    # tolerance floor: BOTH paths compute batch var as E[x^2]-m^2 in f32
    # (matching torch BN semantics); the cancellation noise differs with
    # reduction order (measured: f64 activations + f32 stats still leave
    # ~2e-4 — the grouped algebra itself is EXACT, eval f64 diff is 0.0)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_p),
                               atol=1e-3, rtol=1e-4)
    assert set(stats_g) == set(stats_p)
    for path in stats_p:
        mp, vp, np_ = stats_p[path]
        mg, vg, ng = stats_g[path]
        assert np_ == ng, path
        np.testing.assert_allclose(np.asarray(mg), np.asarray(mp),
                                   atol=1e-4, err_msg=path)
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vp),
                                   atol=1e-3, rtol=1e-4, err_msg=path)


def test_eval_mode_parity(setup):
    params, x, _, _ = setup
    out_p = hrnet.apply(params, x, train=False)
    out_g = G.apply_grouped(params, x, group=GROUP, train=False)
    # grouped convs contract K=G*C with zero blocks: f32 reduction-order
    # drift only (f64 eval diff is exactly 0.0)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_p),
                               atol=2e-3, rtol=1e-4)


def test_gradient_parity(setup):
    """Grouped-trunk gradients == plain gradients, compared in f64.

    In f32 this comparison is a tolerance race: the BN batch-variance
    E[x^2]-m^2 cancellation noise propagates through backprop with
    draw-dependent leaf-relative magnitude (observed 2.3e-2 to beyond a
    4e-2 bound across rng seeds). In f64 the noise floor drops ~9 orders
    of magnitude, so the grouped algebra's EXACTNESS is what's asserted
    — any real algebra error would exceed these bounds by ~1e6x."""
    params, x, tgt, tw = setup
    loss_fn = losses.joints_mse_loss

    with jax.enable_x64():
        to64 = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), t)
        p64, x64, t64, w64 = to64(params), to64(x), to64(tgt), to64(tw)

        def loss_of(apply_fn):
            def f(p):
                out = apply_fn(p, x64, train=True, stats={})
                return loss_fn(out, t64, w64)
            return f

        lp, gp = jax.value_and_grad(loss_of(hrnet.apply))(p64)
        lg, gg = jax.value_and_grad(loss_of(G.make_apply(GROUP)))(p64)
        assert abs(float(lp) - float(lg)) <= 1e-10 * max(1.0, abs(float(lp)))
        flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
        flat_g = dict(jax.tree_util.tree_flatten_with_path(gg)[0])
        # dict lookups by path keep error messages attributable
        for path, leaf_p in flat_p:
            leaf_g = flat_g[path]
            scale = max(float(jnp.abs(leaf_p).max()), 1e-8)
            err = float(jnp.abs(leaf_g - leaf_p).max())
            # f64 reduction-reorder noise only (measured max ~1e-13 rel)
            assert err <= 1e-9 * scale + 1e-12, (path, err, scale)


def test_full_train_step_parity(setup):
    params, x, tgt, tw = setup
    loss_fn = losses.joints_mse_loss
    opt = optax.adam(1e-3)
    batch = {'image': x, 'target': tgt, 'target_weight': tw}

    step_p = steps.make_train_step(hrnet.apply, loss_fn, opt, donate=False)
    step_g = steps.make_train_step(G.make_apply(GROUP), loss_fn, opt,
                                   donate=False)
    os0 = opt.init(params)
    p1, _, l1, _ = step_p(params, os0, batch)
    p2, _, l2, _ = step_g(params, os0, batch)
    assert abs(float(l1) - float(l2)) < 1e-4 * max(1.0, abs(float(l1)))
    # Adam's first step is ~±lr per element (m/sqrt(v) ≈ sign(g)), so
    # near-zero grads whose sign flips under reduction noise move 2*lr
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p1)[0],
            jax.tree_util.tree_flatten_with_path(p2)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2.1e-3,
                                   err_msg=str(path))


def test_batch_not_divisible_raises(setup):
    params, x, _, _ = setup
    with pytest.raises(ValueError):
        G.apply_grouped(params, x[:3], group=2, train=False)


def test_grouped_step_matches_single_device_on_mesh(setup):
    """The grouped trunk's batch-halves slice + channel concat must stay
    semantics-preserving under GSPMD batch sharding (XLA reshards the
    halves across device subsets): 8-way sharded grouped step == 1-device
    grouped step."""
    from simple_hrnet_tpu.parallel import make_mesh, replicate, shard_batch
    from simple_hrnet_tpu.train import steps

    params, x, tgt, tw = setup
    apply_fn = G.make_apply(GROUP)
    opt = steps.make_optimizer('SGD', lr=1e-2, momentum=0.9)
    batch = {'image': x, 'target': tgt, 'target_weight': tw}

    step1 = steps.make_train_step(apply_fn, losses.joints_mse_loss, opt,
                                  donate=False)
    p1, _, l1, _ = step1(params, opt.init(params), batch)

    mesh = make_mesh(4)  # batch 4 -> 1 image/device, halves span devices
    step4 = steps.make_train_step(apply_fn, losses.joints_mse_loss, opt,
                                  mesh=mesh, donate=False)
    p4, _, l4, _ = step4(replicate(params, mesh),
                         replicate(opt.init(params), mesh),
                         shard_batch(batch, mesh))

    np.testing.assert_allclose(float(l4), float(l1), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p1)[0],
            jax.tree_util.tree_flatten_with_path(p4)[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3,
                                   err_msg=str(path))
