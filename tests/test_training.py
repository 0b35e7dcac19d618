"""Training system tests: losses, pool, optimizer, end-to-end smoke training."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from sph_nca_tpu import ops
from sph_nca_tpu.models import SPHNCAConfig
from sph_nca_tpu.training import (
    MSELossConfig,
    Pool,
    TrainConfig,
    Trainer,
    bucket_steps,
    make_mse_bundle,
    make_optimizer,
    mse_loss,
    moment_loss,
    normalize_grads,
    overflow_penalty,
    progressive_steps,
    relaxed_emd,
)
from sph_nca_tpu.utils.geometry import grange
from sph_nca_tpu.utils.seeds import plane_seed


def test_overflow_penalty():
    A = jnp.asarray([[0.5, -1.5, 2.0]])
    assert np.isclose(float(overflow_penalty(A)), 0.5 + 1.0)


def test_mse_loss_zero_for_perfect_match():
    m = 8
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])).reshape(-1, 2)
    img = jnp.asarray(np.random.default_rng(0).random((m, m, 4)).astype(np.float32))
    cfg = MSELossConfig(gmin=(-1, -1), gsize=(2, 2), image_scale=1.0)
    # build A whose rgba matches the image at the grid exactly
    A = jnp.zeros((m * m, 16))
    img_flat = np.asarray(img).reshape(-1, 4)
    A = A.at[:, :3].set(img_flat[:, :3]).at[:, 3].set(img_flat[:, 3])
    loss = float(mse_loss(x, A, img, cfg))
    assert loss < 1e-10


def test_ot_components():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    # identical sets -> zero EMD and zero moment distance
    assert float(relaxed_emd(x, x)) < 1e-5
    assert float(moment_loss(x, x)) < 1e-6
    y = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32) + 3.0)
    assert float(relaxed_emd(x, y)) > 0.01
    assert float(moment_loss(x, y)) > 0.5


def test_pool_sample_update_replace():
    rng = np.random.default_rng(0)
    x = rng.random((20, 2)).astype(np.float32)
    seed_A = rng.random((20, 4)).astype(np.float32)
    pool = Pool(x, seed_A, total_size=16)
    idx, A = pool.sample(4)
    assert A.shape == (4, 20, 4)
    losses = np.array([0.1, 5.0, 0.2, 0.3])
    idx2, A2 = pool.replace_worst(idx, A, losses)
    assert idx2[0] == idx[1]  # worst first
    assert np.allclose(A2[0], seed_A)  # replaced with fresh seed
    new = np.ones_like(A2)
    pool.update(idx2, new)
    assert np.allclose(pool.A[idx2], 1.0)


def test_pool_damage_options():
    rng = np.random.default_rng(0)
    x = (rng.random((50, 2)) * 2 - 1).astype(np.float32)
    seed_A = np.ones((50, 4), np.float32)
    pool = Pool(x, seed_A, total_size=8)
    _, A = pool.sample(4, erase_radius=0.5)
    assert (A == 0).any(), "erase_radius should zero a disk"
    _, A = pool.sample(4, degrade_prob=0.5)
    assert not np.allclose(A, 1.0)


def test_normalize_grads_transform():
    tx = normalize_grads()
    g = {"a": jnp.asarray([3.0, 4.0])}
    out, _ = tx.update(g, tx.init(g))
    assert np.allclose(np.asarray(out["a"]), np.asarray([0.6, 0.8]), atol=1e-6)


def test_lr_schedule_matches_linearlr():
    """Adam lr decays 1.0 -> 0.1 linearly over 2000 steps (train.py:285)."""
    opt = make_optimizer(1.0, end_factor=0.1, decay_steps=10, grad_norm=False)
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    # inspect the schedule through optax's count
    sched = optax.linear_schedule(1.0, 0.1, 10)
    assert np.isclose(float(sched(0)), 1.0)
    assert np.isclose(float(sched(5)), 0.55)
    assert np.isclose(float(sched(10)), 0.1)
    assert np.isclose(float(sched(100)), 0.1)


def test_progressive_steps_schedule():
    """max_iter = i//inc + 1 until mean*inc, then random in range
    (reference train.py:297-300)."""
    rng = np.random.default_rng(0)
    assert progressive_steps(0, (32, 48), 5, rng) == 1
    assert progressive_steps(9, (32, 48), 5, rng) == 2
    assert progressive_steps(199, (32, 48), 5, rng) == 40
    n = progressive_steps(40 * 5, (32, 48), 5, rng)
    assert 32 <= n < 48
    # increment disabled -> always random
    n = progressive_steps(0, (32, 48), 0, rng)
    assert 32 <= n < 48


def test_bucket_steps():
    assert bucket_steps(1, 48) == 8
    assert bucket_steps(8, 48) == 8
    assert bucket_steps(9, 48) == 16
    assert bucket_steps(47, 48) == 48


def test_end_to_end_training_reduces_loss():
    """Minimum end-to-end slice: tiny gecko-style config must learn.

    16x16 grid, flat orange target, 40 iterations. The loss on a fresh
    seed rollout must drop substantially (reference trains 8000 iters;
    this is the smoke version of SURVEY.md §7 stage 4)."""
    m = 16
    h = 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0])).reshape(-1, 2)
    dims = ops.default_dims(h)
    mpc, k = ops.suggest_capacity(np.asarray(x), h, dims)
    graph = ops.build_graph(x, h, dims, max_per_cell=mpc, k=k)

    # flat color target (reference train.py:229-233)
    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0] = 1.0
    img[..., 1] = 0.5
    img[..., 3] = 1.0
    img = jnp.asarray(img)

    # use_alpha=False makes this a pure color regression (no alive-mask
    # growth dynamics), which converges in tens of iterations
    model_cfg = SPHNCAConfig(
        channels=8, hidden=32, normalize_perception=1.0 / h, use_alpha=False
    )
    loss_cfg = MSELossConfig(
        gmin=(-1, -1), gsize=(2, 2), image_scale=1.0, overflow_weight=0.05,
        use_alpha=False,
    )
    bundle = make_mse_bundle(img, loss_cfg)
    train_cfg = TrainConfig(
        batch_size=2,
        pool_size=8,
        steps_range=(6, 10),
        steps_increment=2,
        lr=5e-3,
        lr_decay_steps=60,
    )
    trainer = Trainer(model_cfg, train_cfg, graph, x, bundle, h)

    A_seed = plane_seed(x, model_cfg.channels, gmin=(-1, -1), gsize=(2, 2), radius=h)
    pool = Pool(np.asarray(x), np.asarray(A_seed), train_cfg.pool_size)

    losses = [trainer.run_iteration(i, pool) for i in range(60)]
    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.3, f"loss did not improve: {early} -> {late}"


def test_trainer_on_cell_engine_learns():
    """Same smoke training through the cell-dense engine + Pallas path."""
    from sph_nca_tpu.ops.cells import build_cell_engine

    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h)

    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0], img[..., 1], img[..., 3] = 1.0, 0.5, 1.0
    model_cfg = SPHNCAConfig(
        channels=8, hidden=32, normalize_perception=1.0 / h, use_alpha=False
    )
    bundle = make_mse_bundle(
        jnp.asarray(img),
        MSELossConfig(gmin=(-1, -1), gsize=(2, 2), image_scale=1.0,
                      use_alpha=False),
    )
    tc = TrainConfig(batch_size=2, pool_size=8, steps_range=(6, 10),
                     steps_increment=2, lr=5e-3, lr_decay_steps=60)
    tr = Trainer(model_cfg, tc, eng, x, bundle, h)
    pool = Pool(
        np.asarray(x),
        np.asarray(plane_seed(x, 8, gmin=(-1, -1), gsize=(2, 2), radius=h)),
        tc.pool_size,
    )
    losses = [tr.run_iteration(i, pool) for i in range(40)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.3


def test_trainer_on_batched_lane_engine_learns():
    """Same smoke training through the batched-lane table path (the
    engine built with pair_tables routes Trainer.run_rollout through
    ops/batched.py — the TPU throughput path)."""
    from sph_nca_tpu.ops.cells import build_cell_engine

    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(x, h, pair_tables="float32")
    assert eng.blk_md is not None

    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0], img[..., 1], img[..., 3] = 1.0, 0.5, 1.0
    model_cfg = SPHNCAConfig(
        channels=8, hidden=32, normalize_perception=1.0 / h, use_alpha=False
    )
    bundle = make_mse_bundle(
        jnp.asarray(img),
        MSELossConfig(gmin=(-1, -1), gsize=(2, 2), image_scale=1.0,
                      use_alpha=False),
    )
    tc = TrainConfig(batch_size=2, pool_size=8, steps_range=(6, 10),
                     steps_increment=2, lr=5e-3, lr_decay_steps=60)
    tr = Trainer(model_cfg, tc, eng, x, bundle, h)
    pool = Pool(
        np.asarray(x),
        np.asarray(plane_seed(x, 8, gmin=(-1, -1), gsize=(2, 2), radius=h)),
        tc.pool_size,
    )
    losses = [tr.run_iteration(i, pool) for i in range(40)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.3


def test_trainer_wrapped_periodic_learns():
    """Wrapped (periodic) training through the BATCHED cell engine +
    DevicePool: the TPU-native replacement for the reference's
    ghost-particle path (nca.py:245-299), on the exact stack the OT
    texture CLI config uses."""
    from sph_nca_tpu.ops.cells import build_cell_engine
    from sph_nca_tpu.training.pool import DevicePool

    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_cell_engine(
        x, h, period=jnp.asarray([2.0, 2.0]), pair_tables="float32"
    )

    img = np.zeros((8, 8, 4), np.float32)
    img[..., 2], img[..., 3] = 0.9, 1.0
    model_cfg = SPHNCAConfig(
        channels=8, hidden=32, normalize_perception=1.0 / h, use_alpha=False
    )
    bundle = make_mse_bundle(
        jnp.asarray(img),
        MSELossConfig(gmin=(-1, -1), gsize=(2, 2), image_scale=1.0,
                      use_alpha=False),
    )
    tc = TrainConfig(batch_size=2, pool_size=8, steps_range=(6, 10),
                     steps_increment=2, lr=5e-3, lr_decay_steps=60)
    tr = Trainer(model_cfg, tc, eng, x, bundle, h)
    pool = DevicePool(
        np.asarray(x),
        np.asarray(plane_seed(x, 8, gmin=(-1, -1), gsize=(2, 2), radius=h,
                              randomized=True, key=jax.random.key(0))),
        tc.pool_size, randomized_feat=True,
    )
    losses = [float(tr.run_iteration(i, pool)) for i in range(40)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.5


def test_device_pool_matches_host_pool_semantics():
    """DevicePool sample/update/replace flow preserves Pool's contract:
    same index law (shared numpy Generator), states round-trip, damage
    ops produce the documented effects."""
    from sph_nca_tpu.training.pool import DevicePool

    n, c = 50, 4
    x = np.random.default_rng(0).uniform(-1, 1, (n, 2)).astype(np.float32)
    seed_A = np.random.default_rng(1).random((n, c)).astype(np.float32)

    hp = Pool(x, seed_A, 16, rng=np.random.default_rng(7))
    dp = DevicePool(x, seed_A, 16, rng=np.random.default_rng(7))

    hi, hA = hp.sample(4)
    di, dA = dp.sample(4)
    np.testing.assert_array_equal(hi, di)  # same index stream
    np.testing.assert_allclose(np.asarray(dA), hA)

    # update writes back on device
    newA = np.random.default_rng(2).random((4, n, c)).astype(np.float32)
    dp.update(di, jnp.asarray(newA))
    _, dA2 = dp.sample(16)  # whole pool
    got = np.asarray(dp.A)[di]
    np.testing.assert_allclose(got, newA, rtol=1e-6)

    # erase_radius zeroes a disk in every sample
    _, dmg = dp.sample(4, erase_radius=0.5)
    dmg = np.asarray(dmg)
    assert (np.abs(dmg) < 1e-9).all(axis=-1).any(), "no erased disk found"

    # state round-trip (resume path)
    snap = dp.state_np()
    dp.update(jnp.asarray([0]), jnp.zeros((1, n, c)))
    dp.load_state(snap)
    np.testing.assert_allclose(np.asarray(dp.A), snap)


def test_named_optimizers_step():
    """--optimizer parity (reference train.py:56,283-285): named optax
    optimizers build and step; unknown names fall back to Adam."""
    import optax

    from sph_nca_tpu.training.trainer import make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.25)}
    outs = {}
    for name in ("adam", "SGD", "rmsprop", "nosuch_optimizer"):
        opt = make_optimizer(1e-2, name=name, grad_norm=False)
        st = opt.init(params)
        upd, _ = opt.update(grads, st, params)
        new = optax.apply_updates(params, upd)
        outs[name] = np.asarray(new["w"])
        assert np.all(np.isfinite(outs[name]))
    # the fallback equals adam; sgd differs from adam
    np.testing.assert_allclose(outs["nosuch_optimizer"], outs["adam"])
    assert np.abs(outs["SGD"] - outs["adam"]).max() > 1e-6


def test_cli_optimizer_and_damage_flags():
    """The new flags reach TrainConfig."""
    from sph_nca_tpu.cli.train import build_parser

    args = build_parser().parse_args(
        ["--optimizer", "sgd", "--degrade_prob", "0.25",
         "--erase_radius", "0.1"]
    )
    assert args.optimizer == "sgd"
    assert args.degrade_prob == 0.25
    assert args.erase_radius == 0.1


def test_trainer_on_band_engine_learns():
    """Same smoke training through the BAND engine (cli/train.py's
    default since round 3): dispatch via ops/batched.py's batched-lane
    rollout, loss must drop as on the other engines."""
    from sph_nca_tpu.ops.bands import build_band_engine

    m, h = 16, 0.25
    x = grange((m, m), jnp.asarray([-1.0, -1.0]), jnp.asarray([2.0, 2.0]))
    x = x.reshape(-1, 2)
    eng = build_band_engine(np.asarray(jnp.pad(x, ((0, 0), (0, 1)))), h)

    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0] = 1.0
    img[..., 1] = 0.5
    img[..., 3] = 1.0
    img = jnp.asarray(img)

    model_cfg = SPHNCAConfig(
        channels=8, hidden=32, normalize_perception=1.0 / h, use_alpha=False
    )
    loss_cfg = MSELossConfig(
        gmin=(-1, -1), gsize=(2, 2), image_scale=1.0, overflow_weight=0.05,
        use_alpha=False,
    )
    bundle = make_mse_bundle(img, loss_cfg)
    train_cfg = TrainConfig(
        batch_size=2, pool_size=8, steps_range=(6, 10), steps_increment=2,
        lr=5e-3, lr_decay_steps=60,
    )
    trainer = Trainer(model_cfg, train_cfg, eng, x, bundle, h)
    A_seed = plane_seed(x, model_cfg.channels, gmin=(-1, -1),
                        gsize=(2, 2), radius=h)
    pool = Pool(np.asarray(x), np.asarray(A_seed), train_cfg.pool_size)
    losses = [trainer.run_iteration(i, pool) for i in range(60)]
    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < early * 0.3, f"loss did not improve: {early} -> {late}"
