"""NoiseConditionedSFNO tests: builds from the ACE2-ERA5 baseline YAML
surface, noise makes ensemble members differ, zero-noise init is
deterministic (reference model: fme/ace/registry test_stochastic_sfno).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ace_tpu.core.dataset_info import DatasetInfo
from ace_tpu.core.coordinates import LatLonCoordinates, gaussian_latitudes
from ace_tpu.models.registry import ModuleSelector

NLAT, NLON = 8, 16


def _info():
    return DatasetInfo(
        horizontal_coordinates=LatLonCoordinates(
            lat=gaussian_latitudes(NLAT),
            lon=np.linspace(0, 360, NLON, endpoint=False),
        )
    )


@pytest.mark.medium_duration
@pytest.mark.parametrize("noise_type", ["gaussian", "isotropic"])
def test_noise_conditioned_sfno_era5_surface(noise_type):
    # the ACE2-ERA5 baseline config block
    # (reference: configs/baselines/era5/ace-train-config-1-step-pretrain.yaml)
    selector = ModuleSelector(
        type="NoiseConditionedSFNO",
        config={
            "embed_dim": 16,
            "noise_embed_dim": 8,
            "noise_type": noise_type,
            "filter_type": "linear",
            "use_mlp": True,
            "num_layers": 2,
            "operator_type": "dhconv",
            "separable": False,
            "spectral_layers": 3,
            "spectral_transform": "sht",
            "affine_norms": True,
            "normalize_big_skip": True,
        },
    )
    model = selector.build(4, 3, _info())
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, NLAT, NLON, 4), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    # without a noise rng: deterministic zero-noise forward
    y0 = model.apply(params, x)
    y1 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    assert y0.shape == (2, NLAT, NLON, 3)

    # conditioning weights are zero-initialized (identity conditioning);
    # perturb them so noise actually affects the output, then check that
    # different keys give different outputs and same key reproduces
    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path)
        if "w_scale_2d" in name or "w_bias_2d" in name:
            return leaf + 0.1 * jax.random.normal(
                jax.random.PRNGKey(hash(name) % 2**31), leaf.shape
            )
        return leaf

    params = jax.tree_util.tree_map_with_path(perturb, params)
    ya = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    yb = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    ya2 = model.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(ya), np.asarray(yb))
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(ya2))


@pytest.mark.medium_duration
def test_isotropic_noise_statistics():
    """SHT-synthesized noise should have ~unit pointwise variance and be
    smoother than white noise (band-limited).
    """
    from ace_tpu.models.conditional_sfno import NoiseConditionedSFNO

    model = NoiseConditionedSFNO(
        img_shape=(24, 48), in_chans=1, out_chans=1, embed_dim=8,
        noise_embed_dim=64, noise_type="isotropic", num_layers=1,
    )
    x = jnp.zeros((4, 24, 48, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    noise = model.apply(
        params, 4, rngs={"noise": jax.random.PRNGKey(5)},
        method=NoiseConditionedSFNO._make_noise,
    )
    assert noise.shape == (4, 24, 48, 64)
    std = float(jnp.std(noise))
    assert 0.7 < std < 1.3, std


@pytest.mark.medium_duration
def test_ensemble_members_differ_in_rollout():
    """In a training rollout with n_ensemble=2, the stochastic model must
    produce distinct members (the basis of CRPS training).
    """
    from datetime import timedelta

    from ace_tpu.core.config import from_dict, to_dict
    from ace_tpu.core.coordinates import HybridSigmaPressureCoordinate
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.core.step.single_module import SingleModuleStepConfig
    from ace_tpu.stepper.stepper import StepperConfig
    import dataclasses

    info = dataclasses.replace(
        _info(),
        vertical_coordinate=HybridSigmaPressureCoordinate(
            ak=np.asarray([0.0, 0.0]), bk=np.asarray([0.0, 1.0])
        ),
        timestep=timedelta(hours=6),
    )
    cfg = from_dict(SingleModuleStepConfig, dict(
        builder={"type": "NoiseConditionedSFNO", "config": {
            "embed_dim": 8, "noise_embed_dim": 4, "num_layers": 1,
        }},
        in_names=["prog"],
        out_names=["prog"],
        normalization={"network": {
            "means": {"prog": 0.0}, "stds": {"prog": 1.0},
        }},
    ))
    stepper = StepperConfig(
        step=StepSelector(type="single_module", config=to_dict(cfg))
    ).get_stepper(info)
    params = stepper.init_params(jax.random.PRNGKey(0))

    # noise conditioning is zero-initialized (identical members at init,
    # as in the reference); perturb it to verify the stochastic path
    def perturb(path, leaf):
        name = "/".join(str(p.key) for p in path)
        if "w_scale_2d" in name or "w_bias_2d" in name:
            return leaf + 0.1 * jax.random.normal(
                jax.random.PRNGKey(hash(name) % 2**31), leaf.shape
            )
        return leaf

    params = jax.tree_util.tree_map_with_path(perturb, params)
    from ace_tpu.core.step.base import StepArgs

    x = {"prog": jnp.asarray(
        np.random.RandomState(0).randn(1, NLAT, NLON), jnp.float32
    )}
    out1 = stepper.step.step(params, StepArgs(
        input=x, next_step_input_data={}, stepper_state={},
        rng=jax.random.PRNGKey(1), deterministic=False,
    ))
    out2 = stepper.step.step(params, StepArgs(
        input=x, next_step_input_data={}, stepper_state={},
        rng=jax.random.PRNGKey(2), deterministic=False,
    ))
    assert not np.allclose(
        np.asarray(out1.output["prog"]), np.asarray(out2.output["prog"])
    )


@pytest.mark.medium_duration
def test_sfno_frequency_pos_embed_and_repeat_layers():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet

    kw = dict(
        img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=16,
        num_layers=2, operator_type="dhconv", data_grid="equiangular",
        scale_factor=1,
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 16, 32, 3), jnp.float32
    )
    net_f = SphericalFourierNeuralOperatorNet(pos_embed="frequency", **kw)
    params_f = net_f.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(params_f)
    names = {"/".join(str(k.key) for k in p) for p, _ in flat}
    assert any("pos_embed_r" in n for n in names)
    assert any("pos_embed_c" in n for n in names)
    out = net_f.apply(params_f, x)
    assert bool(jnp.all(jnp.isfinite(out)))

    # repeat_layers shares weights: identical param count, different output
    net_1 = SphericalFourierNeuralOperatorNet(repeat_layers=1, **kw)
    net_2 = SphericalFourierNeuralOperatorNet(repeat_layers=2, **kw)
    p1 = net_1.init(jax.random.PRNGKey(0), x)
    p2 = net_2.init(jax.random.PRNGKey(0), x)
    n1 = sum(v.size for v in jax.tree_util.tree_leaves(p1))
    n2 = sum(v.size for v in jax.tree_util.tree_leaves(p2))
    assert n1 == n2
    o1 = net_1.apply(p1, x)
    o2 = net_2.apply(p1, x)  # same params, twice the depth
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.medium_duration
def test_conditional_sfno_local_blocks_spectral_ratio_lora():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ace_tpu.models.conditional_sfno import NoiseConditionedSFNO

    net = NoiseConditionedSFNO(
        img_shape=(8, 16), in_chans=3, out_chans=2, embed_dim=8,
        noise_embed_dim=4, num_layers=2, local_blocks=(1,),
        kernel_shape=(2, 1), basis_type="piecewise linear",
        spectral_ratio=0.5, lora_rank=2, data_grid="equiangular",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 16, 3), jnp.float32
    )
    params = net.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(k.key) for k in p) for p, _ in flat}
    # block 0 spectral with bottleneck projections + LoRA adapters
    assert any("block_0/filter/pre_proj" in n for n in names)
    assert any("block_0/filter/lora_a" in n for n in names)
    # block 1 is a local DISCO filter (no spectral weight)
    assert any("block_1/filter/weight" in n for n in names)
    assert not any("block_1/filter/pre_proj" in n for n in names)
    out = net.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert out.shape == (1, 8, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))

    # LoRA is inert at init (B zero): matches lora_rank=0 with same seed
    net0 = NoiseConditionedSFNO(
        img_shape=(8, 16), in_chans=3, out_chans=2, embed_dim=8,
        noise_embed_dim=4, num_layers=2, local_blocks=(1,),
        kernel_shape=(2, 1), basis_type="piecewise linear",
        spectral_ratio=0.5, lora_rank=0, data_grid="equiangular",
    )
    params0 = net0.init(jax.random.PRNGKey(0), x)
    out0 = net0.apply(params0, x, rngs={"noise": jax.random.PRNGKey(1)})
    # same non-LoRA params (init order may differ, so just check finite
    # and same shape); exact-inertness is checked by zeroing lora_b
    import flax

    fd = flax.traverse_util.flatten_dict(params)
    fd_no_b = {
        k: (v * 0 if "lora_b" in "/".join(map(str, k)) else v)
        for k, v in fd.items()
    }
    out_zero_b = net.apply(
        flax.traverse_util.unflatten_dict(fd_no_b), x,
        rngs={"noise": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_zero_b), atol=1e-6
    )


def test_cp_factorized_spectral_weights():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet

    kw = dict(
        img_shape=(8, 16), in_chans=2, out_chans=2, embed_dim=8,
        num_layers=2, operator_type="dhconv", data_grid="equiangular",
        scale_factor=1,
    )
    dense = SphericalFourierNeuralOperatorNet(**kw)
    cp = SphericalFourierNeuralOperatorNet(
        factorization="cp", rank=0.25, **kw
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 16, 2), jnp.float32
    )
    p_dense = dense.init(jax.random.PRNGKey(0), x)
    p_cp = cp.init(jax.random.PRNGKey(0), x)

    def filter_params(p, match):
        return sum(
            v.size
            for path, v in jax.tree_util.tree_leaves_with_path(p)
            if match in "/".join(str(k.key) for k in path)
        )

    # CP filter uses fewer parameters than the dense weight
    assert filter_params(p_cp, "cp_factor") < filter_params(
        p_dense, "filter/weight"
    )
    out = cp.apply(p_cp, x)
    assert out.shape == (1, 8, 16, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_label_conditioned_sfno_end_to_end(tmp_path):
    """Dataset labels flow through loader -> batch -> step -> model
    (reference: fme/core/labels.py + ContextConfig label conditioning)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax

    from ace_tpu.models.conditional_sfno import NoiseConditionedSFNO

    # model level: labels change outputs once conditioning weights are
    # nonzero
    net = NoiseConditionedSFNO(
        img_shape=(8, 16), in_chans=2, out_chans=2, embed_dim=8,
        noise_embed_dim=4, num_layers=1, n_labels=3, label_embed_dim=2,
        data_grid="equiangular",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 16, 2), jnp.float32
    )
    lab_a = jnp.asarray([[1.0, 0.0, 0.0]])
    lab_b = jnp.asarray([[0.0, 1.0, 0.0]])
    params = net.init(jax.random.PRNGKey(0), x, labels=lab_a)
    flat = flax.traverse_util.flatten_dict(params)
    perturbed = {
        k: (v + 0.1 if "w_scale_2d" in "/".join(map(str, k)) else v)
        for k, v in flat.items()
    }
    params = flax.traverse_util.unflatten_dict(perturbed)
    o_a = net.apply(params, x, labels=lab_a)
    o_b = net.apply(params, x, labels=lab_b)
    assert not np.allclose(np.asarray(o_a), np.asarray(o_b))

    # loader level: dataset labels arrive one-hot on the batch
    from ace_tpu.core.config import from_dict
    from ace_tpu.data.loading import DataLoaderConfig
    from ace_tpu.data.requirements import DataRequirements
    from ace_tpu.testing import SyntheticData

    data = SyntheticData(tmp_path / "d", ["a"], n_time=8)
    cfg = from_dict(DataLoaderConfig, {
        "dataset": {
            "data_path": str(data.data_dir), "labels": ["era5"]
        },
        "batch_size": 2,
        "num_data_workers": 1,
    })
    gridded = cfg.build(
        DataRequirements(names=["a"], n_timesteps=2), train=False
    )
    assert gridded.dataset_info.all_labels == ("era5",)
    batch = next(iter(gridded.loader))
    assert batch.labels.shape == (2, 1)
    np.testing.assert_array_equal(np.asarray(batch.labels), 1.0)


@pytest.mark.medium_duration
def test_checkpointing_blocks_is_pure_memory_option():
    """checkpointing=1 (per-block remat, reference makani sfnonet.py
    `checkpointing`) must not change the param tree, the forward values,
    or gradient flow."""
    import jax

    from ace_tpu.models.conditional_sfno import NoiseConditionedSFNO

    kw = dict(
        img_shape=(8, 16), in_chans=3, out_chans=3, embed_dim=8,
        noise_embed_dim=4, num_layers=2, operator_type="dhconv",
        use_mlp=True, affine_norms=True, normalize_big_skip=True,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16, 3),
                    jnp.float32)
    m0 = NoiseConditionedSFNO(**kw)
    m1 = NoiseConditionedSFNO(**kw, checkpointing=1)
    p0 = m0.init({"params": jax.random.PRNGKey(0)}, x)
    p1 = m1.init({"params": jax.random.PRNGKey(0)}, x)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    rngs = {"noise": jax.random.PRNGKey(7)}
    y0 = m0.apply(p0, x, rngs=rngs)
    y1 = m1.apply(p1, x, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def loss(p):
        return jnp.sum(m1.apply(p, x, rngs=rngs) ** 2)

    grads = jax.grad(loss)(p1)
    total = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0
    )
    assert total > 0.0
