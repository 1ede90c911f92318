"""Training-step tests: loss decreases on a learnable synthetic problem,
ensemble CRPS path runs, remat matches non-remat
(reference test model: fme/ace/stepper tests + fme/core/test_loss.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.config import from_dict
from ace_tpu.core.loss import (
    LpLoss,
    MSELoss,
    StepLossConfig,
    WeightedMappingLoss,
    get_crps,
)
from ace_tpu.core.normalizer import StandardNormalizer
from ace_tpu.core.optimization import EMAConfig, OptimizationConfig, SchedulerConfig
from ace_tpu.core.step.base import StepSelector
from ace_tpu.stepper.stepper import StepperConfig
from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper

from tests.test_step_stepper import _dataset_info, _step_config, NLAT, NLON


def _train_stepper(n_forward_steps=2, n_ensemble=1, loss_type="MSE",
                   remat=False, opt_config=None, **step_kwargs):
    from ace_tpu.core.config import to_dict

    sel = StepSelector(
        type="single_module", config=to_dict(_step_config(**step_kwargs))
    )
    stepper = StepperConfig(step=sel).get_stepper(_dataset_info())
    kwargs = {}
    if loss_type == "EnsembleLoss":
        kwargs = {"crps_weight": 0.9, "energy_score_weight": 0.1}
    train_cfg = StepperTrainConfig(
        loss=from_dict(StepLossConfig, {"type": loss_type, "kwargs": kwargs}),
        n_forward_steps=n_forward_steps,
        n_ensemble=n_ensemble,
        remat=remat,
    )
    return TrainStepper(
        stepper, train_cfg,
        opt_config or OptimizationConfig(lr=1e-2), EMAConfig(),
    )


def _batch(rng, n_steps, batch=2):
    return {
        "prog": jnp.asarray(
            rng.randn(batch, n_steps + 1, NLAT, NLON), jnp.float32
        ),
        "forcing_var": jnp.asarray(
            rng.randn(batch, n_steps + 1, NLAT, NLON), jnp.float32
        ),
        "diag": jnp.asarray(
            rng.randn(batch, n_steps + 1, NLAT, NLON), jnp.float32
        ),
    }


def test_train_step_decreases_loss():
    ts = _train_stepper(n_forward_steps=2)
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    train_step = ts.build_train_step(donate=False)
    rng = np.random.RandomState(0)
    # learnable target: diag = forcing, prog persists
    n_steps = 2
    base = rng.randn(4, n_steps + 1, NLAT, NLON).astype(np.float32)
    batch = {
        "prog": jnp.asarray(base),
        "forcing_var": jnp.asarray(base * 0.5),
        "diag": jnp.asarray(base * 0.5),
    }
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(20):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_per_step_losses_reported():
    ts = _train_stepper(n_forward_steps=3)
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    _, metrics = ts.loss_fn(
        params, _batch(np.random.RandomState(1), 3), jax.random.PRNGKey(0)
    )
    assert {"loss", "loss_step_0", "loss_step_1", "loss_step_2"} <= set(metrics)
    total = sum(float(metrics[f"loss_step_{i}"]) for i in range(3))
    np.testing.assert_allclose(float(metrics["loss"]), total, rtol=1e-5)


@pytest.mark.medium_duration
def test_remat_matches_no_remat():
    ts1 = _train_stepper(n_forward_steps=2, remat=False)
    ts2 = _train_stepper(n_forward_steps=2, remat=True)
    params, _ = ts1.init(jax.random.PRNGKey(7))
    batch = _batch(np.random.RandomState(2), 2)
    rng = jax.random.PRNGKey(3)
    l1, _ = ts1.loss_fn(params, batch, rng)
    l2, _ = ts2.loss_fn(params, batch, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(lambda p: ts1.loss_fn(p, batch, rng)[0])(params)
    g2 = jax.grad(lambda p: ts2.loss_fn(p, batch, rng)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.medium_duration
def test_ensemble_loss_path_runs():
    ts = _train_stepper(n_forward_steps=1, n_ensemble=2,
                        loss_type="EnsembleLoss")
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    loss, metrics = ts.loss_fn(
        params, _batch(np.random.RandomState(3), 1), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(loss))


def test_crps_basics():
    # perfect deterministic forecast has zero CRPS
    target = jnp.zeros((2, 1, 4))
    gen = jnp.zeros((2, 3, 4))
    np.testing.assert_allclose(np.asarray(get_crps(gen, target)), 0.0)
    # CRPS penalizes biased ensembles more than spread ones
    rng = np.random.RandomState(0)
    spread = jnp.asarray(rng.randn(2, 8, 100), jnp.float32)
    biased = jnp.ones((2, 8, 100)) * 3.0
    target = jnp.zeros((2, 1, 100))
    assert float(get_crps(spread, target).mean()) < float(
        get_crps(biased, target).mean()
    )


def test_weighted_mapping_loss_weights():
    norm = StandardNormalizer({"a": 0.0, "b": 0.0}, {"a": 1.0, "b": 1.0})
    loss = WeightedMappingLoss(
        MSELoss(), {"a": 2.0}, ["a", "b"], norm
    )
    pred = {"a": jnp.ones((2, 4, 4)), "b": jnp.ones((2, 4, 4))}
    targ = {"a": jnp.zeros((2, 4, 4)), "b": jnp.zeros((2, 4, 4))}
    out = loss(pred, targ)
    # weight 2 on inputs -> 4x loss for "a"
    np.testing.assert_allclose(float(out.per_channel["a"]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(float(out.per_channel["b"]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(out.total), 2.5, rtol=1e-6)


def test_lploss_relative():
    loss = LpLoss(p=2)
    x = jnp.ones((2, 4, 4, 1)) * 2.0
    y = jnp.ones((2, 4, 4, 1))
    np.testing.assert_allclose(np.asarray(loss(x, y)), 1.0, rtol=1e-6)


def test_scheduler_cosine():
    cfg = SchedulerConfig(type="CosineAnnealingLR", kwargs={"T_max": 10})
    sched = cfg.build(1.0, max_epochs=10, steps_per_epoch=5)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    assert float(sched(50)) < 1e-6  # 10 epochs in
    mid = float(sched(25))  # 5 epochs
    assert abs(mid - 0.5) < 1e-6


def test_ema_tracks_params():
    ts = _train_stepper()
    params, _ = ts.init(jax.random.PRNGKey(0))
    moved = jax.tree_util.tree_map(lambda p: p + 1.0, params)
    for _ in range(5):
        ts.ema(moved)
    # EMA should be strictly between original and moved params
    leaf = jax.tree_util.tree_leaves(params)[0]
    ema_leaf = jax.tree_util.tree_leaves(ts.ema.ema_params)[0]
    moved_leaf = jax.tree_util.tree_leaves(moved)[0]
    diff0 = float(jnp.abs(ema_leaf - leaf).mean())
    diff1 = float(jnp.abs(ema_leaf - moved_leaf).mean())
    # ramp-up decay is small early, so EMA moves quickly toward
    # the new params but must not reach them exactly
    assert diff0 > diff1 > 1e-5


def test_stochastic_rollout_lengths():
    from ace_tpu.core.schedule import (
        TimeLengthMilestone,
        TimeLengthProbabilities,
        TimeLengthProbability,
        TimeLengthSchedule,
    )

    probs = TimeLengthProbabilities(
        outcomes=[
            TimeLengthProbability(steps=1, probability=0.5),
            TimeLengthProbability(steps=3, probability=0.5),
        ]
    )
    schedule = TimeLengthSchedule(
        start_value=probs,
        milestones=[TimeLengthMilestone(epoch=5, value=2)],
    )
    assert schedule.max_n_forward_steps == 3
    assert not schedule.is_constant
    assert schedule.get_value(5) == 2

    ts = _train_stepper(n_forward_steps=schedule)
    assert ts.train_config.max_n_forward_steps == 3
    # epoch 0: stochastic draws from {1, 3}
    draws = {ts.sample_n_forward_steps(0) for _ in range(30)}
    assert draws == {1, 3}
    # epoch >= 5: constant 2
    assert ts.sample_n_forward_steps(5) == 2

    # train step runs at each sampled length on max-window batches
    rng = np.random.RandomState(0)
    batch = _batch(rng, 3)
    params, opt_state = ts.init(jax.random.PRNGKey(0))
    train_step = ts.build_train_step(donate=False)
    for n in (1, 3):
        _, _, metrics = train_step(
            params, opt_state, batch, jax.random.PRNGKey(1), n
        )
        assert f"loss_step_{n - 1}" in metrics
        assert f"loss_step_{n}" not in metrics


def test_optimize_last_step_only_detaches_earlier_steps():
    """With optimize_last_step_only, gradients must flow only through
    the final step (the reference runs earlier steps under no_grad,
    single_module.py:1706-1711)."""
    rng = np.random.RandomState(11)
    ts_full = _train_stepper(n_forward_steps=3)
    ts_last = _train_stepper(n_forward_steps=3)
    ts_last.train_config.optimize_last_step_only = True
    params, _ = ts_full.init(jax.random.PRNGKey(0))
    batch = _batch(rng, 3)
    key = jax.random.PRNGKey(1)

    (_, m_full), g_full = jax.value_and_grad(
        ts_full.loss_fn, has_aux=True
    )(params, batch, key)
    (loss_last, m_last), g_last = jax.value_and_grad(
        ts_last.loss_fn, has_aux=True
    )(params, batch, key)
    # the optimized loss is the final step's loss
    np.testing.assert_allclose(
        float(loss_last), float(m_last["loss_step_2"]), rtol=1e-6
    )
    # detached-carry gradients differ from full-BPTT gradients
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_last))
    ]
    assert max(diffs) > 1e-8
    # and the per-step losses agree (the forward pass is identical)
    for i in range(3):
        np.testing.assert_allclose(
            float(m_full[f"loss_step_{i}"]),
            float(m_last[f"loss_step_{i}"]), rtol=1e-5,
        )


def test_validation_is_deterministic_with_input_dropout():
    """build_valid_step must run the deterministic path: different rngs
    give identical metrics even when training-time input dropout is
    configured (the reference sets stepper.set_eval() before
    validation)."""
    rng = np.random.RandomState(12)
    ts = _train_stepper(
        n_forward_steps=2,
        input_dropout={"default": {"rate": 0.5}},
    )
    params, _ = ts.init(jax.random.PRNGKey(0))
    batch = _batch(rng, 2)
    valid_step = ts.build_valid_step()
    m1 = valid_step(params, batch, jax.random.PRNGKey(1))
    m2 = valid_step(params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=0, atol=0
    )
    # the training path keeps stochastic input dropout
    l1, _ = ts.loss_fn(params, batch, jax.random.PRNGKey(1))
    l2, _ = ts.loss_fn(params, batch, jax.random.PRNGKey(2))
    assert abs(float(l1) - float(l2)) > 0


def test_training_rollout_applies_output_masking():
    """The training rollout must mask outputs exactly like the inference
    rollout (reference masks inside Stepper.step)."""
    rng = np.random.RandomState(13)
    ts = _train_stepper(n_forward_steps=2)
    params, _ = ts.init(jax.random.PRNGKey(0))
    batch = _batch(rng, 2)
    # zero targets + an output masker that zeroes everything => loss 0
    batch = {
        k: (jnp.zeros_like(v) if k in ("prog", "diag") else v)
        for k, v in batch.items()
    }
    loss_unmasked, _ = ts.loss_fn(params, batch, jax.random.PRNGKey(1))
    assert float(loss_unmasked) > 0
    ts.stepper.output_masker = lambda d: {
        k: jnp.zeros_like(v) for k, v in d.items()
    }
    loss_masked, _ = ts.loss_fn(params, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_masked), 0.0, atol=1e-12)


def test_ensemble_loss_requires_two_members():
    with pytest.raises(ValueError, match="n_ensemble"):
        _train_stepper(loss_type="EnsembleLoss", n_ensemble=1)
    # auto-default: -1 -> 2 for ensemble losses
    ts = _train_stepper(loss_type="EnsembleLoss", n_ensemble=-1)
    assert ts.train_config.n_ensemble == 2


def test_optimization_state_roundtrips_lr_scale():
    from ace_tpu.core.optimization import OptimizationConfig

    opt = OptimizationConfig(lr=1e-3).build(max_epochs=4)
    opt._count = 17
    opt.scale_lr(0.25)
    state = opt.get_state()
    fresh = OptimizationConfig(lr=1e-3).build(max_epochs=4)
    fresh.load_state(state)
    assert fresh._count == 17
    np.testing.assert_allclose(fresh._lr_scale_box[0], 0.25)
    np.testing.assert_allclose(
        fresh.learning_rate, opt.learning_rate
    )


def test_weighted_mapping_loss_data_mask():
    """Masked samples are excluded from per-channel averages and fully
    masked channels from the total (reference loss.py data_mask path)."""
    import jax.numpy as jnp

    norm = StandardNormalizer({"a": 0.0, "b": 0.0}, {"a": 1.0, "b": 1.0})
    loss = WeightedMappingLoss(MSELoss(), {}, ["a", "b"], norm)
    pred = {
        "a": jnp.asarray([[1.0], [3.0]])[..., None],
        "b": jnp.asarray([[1.0], [1.0]])[..., None],
    }
    targ = {
        "a": jnp.zeros((2, 1, 1)),
        "b": jnp.zeros((2, 1, 1)),
    }
    # sample 1 of 'a' masked out; 'b' fully masked
    mask = {"a": jnp.asarray([1.0, 0.0]), "b": jnp.asarray([0.0, 0.0])}
    out = loss(pred, targ, data_mask=mask)
    np.testing.assert_allclose(float(out.per_channel["a"]), 1.0)
    np.testing.assert_allclose(float(out.per_channel["b"]), 0.0)
    # total averages only the active channel 'a'
    np.testing.assert_allclose(float(out.total), 1.0)
    # unmasked call unchanged: mean over both samples and channels
    out2 = loss(pred, targ)
    np.testing.assert_allclose(float(out2.per_channel["a"]), 5.0)
    np.testing.assert_allclose(float(out2.total), 3.0)


@pytest.mark.medium_duration
def test_checkpoint_after_n_forward_steps_matches_unsplit():
    """The remat threshold split (reference CheckpointConfig
    after_n_forward_steps) must not change loss or gradients."""
    from ace_tpu.core.optimization import CheckpointConfig

    ts1 = _train_stepper(n_forward_steps=3)
    ts2 = _train_stepper(
        n_forward_steps=3,
        opt_config=OptimizationConfig(
            lr=1e-2, checkpoint=CheckpointConfig(after_n_forward_steps=1)
        ),
    )
    params, _ = ts1.init(jax.random.PRNGKey(7))
    batch = _batch(np.random.RandomState(2), 3)
    rng = jax.random.PRNGKey(3)
    l1, m1 = ts1.loss_fn(params, batch, rng)
    l2, m2 = ts2.loss_fn(params, batch, rng)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for i in range(3):
        np.testing.assert_allclose(
            float(m1[f"loss_step_{i}"]), float(m2[f"loss_step_{i}"]),
            rtol=1e-6,
        )
    g1 = jax.grad(lambda p: ts1.loss_fn(p, batch, rng)[0])(params)
    g2 = jax.grad(lambda p: ts2.loss_fn(p, batch, rng)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sequential_scheduler():
    """Linear warmup then cosine decay via SequentialSchedulerConfig
    (reference: fme/core/scheduler.py:48)."""
    from ace_tpu.core.optimization import SequentialSchedulerConfig

    cfg = SequentialSchedulerConfig(
        schedulers=[
            SchedulerConfig(
                type="LinearLR",
                kwargs={"start_factor": 0.1, "total_iters": 5},
            ),
            SchedulerConfig(type="CosineAnnealingLR", kwargs={"T_max": 10}),
        ],
        milestones=[5],
    )
    sched = cfg.build(1.0, max_epochs=15, steps_per_epoch=2)
    # warmup: starts at 0.1 * lr
    np.testing.assert_allclose(float(sched(0)), 0.1, rtol=1e-6)
    # after the milestone (5 epochs * 2 steps) the cosine starts fresh
    np.testing.assert_allclose(float(sched(10)), 1.0, rtol=1e-6)
    # cosine midpoint: 5 epochs into the cosine segment
    np.testing.assert_allclose(float(sched(20)), 0.5, atol=1e-6)
    # mismatched step_each_iteration is rejected
    with pytest.raises(ValueError, match="step_each_iteration"):
        SequentialSchedulerConfig(
            schedulers=[
                SchedulerConfig(type="LinearLR"),
                SchedulerConfig(
                    type="CosineAnnealingLR", step_each_iteration=True
                ),
            ],
            milestones=[5],
        )
    # parses from config dicts through the union field
    opt = from_dict(OptimizationConfig, {
        "lr": 0.5,
        "scheduler": {
            "schedulers": [
                {"type": "LinearLR"},
                {"type": "CosineAnnealingLR"},
            ],
            "milestones": [3],
        },
    })
    assert opt.has_lr_schedule
    sched2 = opt.scheduler.build(opt.lr, max_epochs=6, steps_per_epoch=1)
    assert float(sched2(3)) == 0.5  # cosine segment start


def test_one_cycle_scheduler():
    cfg = SchedulerConfig(
        type="OneCycleLR",
        kwargs={"max_lr": 1.0, "total_steps": 10, "pct_start": 0.3},
        step_each_iteration=True,
    )
    sched = cfg.build(1.0, max_epochs=1, steps_per_epoch=1)
    lrs = [float(sched(i)) for i in range(11)]
    np.testing.assert_allclose(lrs[0], 1.0 / 25.0, rtol=1e-6)  # initial
    np.testing.assert_allclose(lrs[3], 1.0, rtol=1e-6)  # peak at pct_start
    assert lrs[10] < 1e-4  # annealed to ~final
    assert all(b >= a for a, b in zip(lrs[:3], lrs[1:4]))  # rising
    assert all(b <= a for a, b in zip(lrs[3:10], lrs[4:11]))  # falling


def test_bf16_first_moment_dtype():
    """first_moment_dtype="bfloat16" stores the Adam mu buffer in bf16
    (halving that buffer's HBM) while keeping updates functional."""
    import jax
    import jax.numpy as jnp
    import optax

    from ace_tpu.core.optimization import OptimizationConfig

    opt = OptimizationConfig(
        lr=1e-3, optimizer_type="AdamW",
        first_moment_dtype="bfloat16",
    ).build(max_epochs=1, steps_per_epoch=1)
    params = {"w": jnp.ones((4, 4), jnp.float32)}
    state = opt.init(params)
    mu_dtypes = {
        str(leaf.dtype)
        for leaf in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda x: x, state)
        )
        if hasattr(leaf, "dtype") and leaf.ndim == 2
    }
    assert "bfloat16" in mu_dtypes  # mu stored bf16
    assert "float32" in mu_dtypes  # nu stays f32
    grads = {"w": jnp.full((4, 4), 0.5, jnp.float32)}
    updates, state = opt.tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert new_params["w"].dtype == jnp.float32
    assert float(jnp.max(jnp.abs(new_params["w"] - params["w"]))) > 0
