"""Mesh-decomposition regression tests on the virtual 8-device CPU mesh
(reference model: fme/core/distributed/parallel_tests/test_regression.py —
any (data, h, w) decomposition must reproduce single-device results for
forward, loss, and gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ace_tpu.core.config import to_dict
from ace_tpu.core.step.base import StepSelector
from ace_tpu.parallel.mesh import MeshConfig, batch_spec
from ace_tpu.stepper.stepper import StepperConfig
from ace_tpu.models.sfno import SphericalFourierNeuralOperatorNet

from tests.test_step_stepper import NLAT, NLON, _dataset_info, _step_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

MESH_SHAPES = [(8, 1, 1), (2, 2, 2), (1, 2, 4), (4, 2, 1), (1, 1, 8)]


def _sfno_forward(mesh_cfg):
    model = SphericalFourierNeuralOperatorNet(
        img_shape=(16, 32), in_chans=3, out_chans=3, embed_dim=16,
        num_layers=2, operator_type="dhconv",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(8, 16, 32, 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    if mesh_cfg is None:
        return np.asarray(fwd(params, x))
    mesh = MeshConfig(*mesh_cfg).build()
    with jax.set_mesh(mesh):
        xs = jax.device_put(
            x, NamedSharding(mesh, batch_spec(x.ndim, has_channel=True))
        )
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        return np.asarray(fwd(ps, xs))


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sfno_forward_mesh_invariance(mesh_shape):
    """SFNO forward must be identical (to fp tolerance) on any mesh."""
    reference = _sfno_forward(None)
    result = _sfno_forward(mesh_shape)
    np.testing.assert_allclose(result, reference, atol=2e-4)


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape,nlat,nlon", [
    # non-dividing spatial splits: 18 lat over h=4, 34 lon over w=4 —
    # the zero-pad uneven-split path (ops/distributed_sht.py) at model
    # level (reference: thd.compute_split_shapes,
    # model_torch_distributed.py:200-267)
    ((1, 4, 2), 18, 34),
    ((1, 2, 4), 18, 34),
])
def test_sfno_forward_mesh_invariance_uneven(mesh_shape, nlat, nlon):
    """Full-model forward on an uneven (h, w) split must match the
    single-device result: flagship h-sharding (180 lat over h=8 etc.)
    relies on the zero-pad path for every non-dividing decomposition."""
    model = SphericalFourierNeuralOperatorNet(
        img_shape=(nlat, nlon), in_chans=3, out_chans=3, embed_dim=16,
        num_layers=2, operator_type="dhconv",
    )
    x = jnp.asarray(
        np.random.RandomState(0).randn(4, nlat, nlon, 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    reference = np.asarray(fwd(params, x))
    mesh = MeshConfig(*mesh_shape).build()
    ph, pw = mesh_shape[1], mesh_shape[2]
    # uneven axes cannot be device_put spatially-sharded; enter
    # batch-sharded and let the jitted program re-shard (model inputs
    # are padded to mesh multiples inside the distributed transforms)
    spec = P("data", "h" if nlat % ph == 0 else None,
             "w" if nlon % pw == 0 else None, None)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, spec))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        result = np.asarray(fwd(ps, xs))
    np.testing.assert_allclose(result, reference, atol=2e-4)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 2, 4)])
def test_rollout_mesh_invariance(mesh_shape):
    """Multi-step rollout with corrector must match across decompositions."""
    from tests.test_step_stepper import _selector
    from ace_tpu.stepper.stepper import PrognosticState

    stepper = StepperConfig(step=_selector()).get_stepper(_dataset_info())
    params = stepper.init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    n_steps = 3
    ic_np = rng.randn(8, 1, NLAT, NLON).astype(np.float32)
    forcing_np = rng.randn(8, n_steps + 1, NLAT, NLON).astype(np.float32)

    # single-device reference
    out_ref, _ = stepper.predict(
        PrognosticState(data={"prog": jnp.asarray(ic_np)}),
        {"forcing_var": jnp.asarray(forcing_np)},
    )
    ref = np.asarray(out_ref["prog"])

    mesh = MeshConfig(*mesh_shape).build()
    with jax.set_mesh(mesh):
        ic = PrognosticState(data={"prog": jax.device_put(
            jnp.asarray(ic_np), NamedSharding(mesh, batch_spec(4))
        )})
        forcing = {"forcing_var": jax.device_put(
            jnp.asarray(forcing_np), NamedSharding(mesh, batch_spec(4))
        )}
        stepper.params = jax.device_put(params, NamedSharding(mesh, P()))
        out, _ = stepper.predict(ic, forcing)
        np.testing.assert_allclose(
            np.asarray(out["prog"]), ref, atol=1e-4
        )


@pytest.mark.medium_duration
def test_train_step_gradient_mesh_invariance():
    """Gradients under a (2,2,2) mesh match single-device gradients
    (the reference's backward+SGD regression, test_regression.py).
    """
    from ace_tpu.core.loss import StepLossConfig
    from ace_tpu.core.optimization import OptimizationConfig
    from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper
    from tests.test_step_stepper import _selector

    def make_ts():
        stepper = StepperConfig(step=_selector()).get_stepper(_dataset_info())
        return TrainStepper(
            stepper,
            StepperTrainConfig(
                loss=StepLossConfig(type="AreaWeightedMSE"),
                n_forward_steps=2,
            ),
            OptimizationConfig(lr=1e-3),
        )

    rng = np.random.RandomState(2)
    batch_np = {
        k: rng.randn(8, 3, NLAT, NLON).astype(np.float32)
        for k in ["prog", "forcing_var", "diag"]
    }
    ts = make_ts()
    params, _ = ts.init(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    g_ref = jax.grad(lambda p: ts.loss_fn(p, batch, key)[0])(params)

    mesh = MeshConfig(2, 2, 2).build()
    with jax.set_mesh(mesh):
        batch_sharded = {
            k: jax.device_put(
                jnp.asarray(v), NamedSharding(mesh, batch_spec(4))
            )
            for k, v in batch_np.items()
        }
        params_r = jax.device_put(params, NamedSharding(mesh, P()))
        g_mesh = jax.jit(
            jax.grad(lambda p: ts.loss_fn(p, batch_sharded, key)[0])
        )(params_r)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_mesh)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 2, 4)])
def test_fcn3_forward_mesh_invariance(mesh_shape):
    """FCN3 (DISCO gathers + SHT einsums) reproduces single-device
    results under spatial decomposition."""
    from ace_tpu.models.fcn3 import FourCastNet3

    net = FourCastNet3(
        img_shape=(16, 32), n_atmo_channels=2, n_atmo_groups=2,
        n_surf_channels=2, n_aux_channels=1, scale_factor=2,
        num_layers=2, atmo_embed_dim=4, surf_embed_dim=4,
        aux_embed_dim=4, kernel_shape=(2, 1),
        model_grid_type="legendre-gauss",
    )
    rng = np.random.RandomState(0)
    x_atmo = jnp.asarray(rng.randn(8, 16, 32, 4), jnp.float32)
    x_surf = jnp.asarray(rng.randn(8, 16, 32, 2), jnp.float32)
    x_aux = jnp.asarray(rng.randn(8, 16, 32, 1), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x_atmo, x_surf, x_aux)
    fwd = jax.jit(lambda p, a, s, f: net.apply(p, a, s, f)[0])
    ref = np.asarray(fwd(params, x_atmo, x_surf, x_aux))

    mesh = MeshConfig(*mesh_shape).build()
    with jax.set_mesh(mesh):
        spec = NamedSharding(mesh, batch_spec(4, has_channel=True))
        args = [jax.device_put(v, spec) for v in (x_atmo, x_surf, x_aux)]
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = np.asarray(fwd(ps, *args))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape", [(2, 2, 2)])
def test_localnet_forward_mesh_invariance(mesh_shape):
    from ace_tpu.models.localnet import LocalNet

    net = LocalNet(
        img_shape=(16, 32), in_chans=3, out_chans=2, embed_dim=8,
        noise_embed_dim=0, block_types=("disco", "conv1x1"),
        kernel_shape=(2, 1),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16, 32, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda p, v: net.apply(p, v))
    ref = np.asarray(fwd(params, x))
    mesh = MeshConfig(*mesh_shape).build()
    with jax.set_mesh(mesh):
        xs = jax.device_put(
            x, NamedSharding(mesh, batch_spec(4, has_channel=True))
        )
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = np.asarray(fwd(ps, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _samudra_forward(mesh_cfg):
    from ace_tpu.models.samudra import Samudra

    model = Samudra(out_channels=3, ch_width=(8, 16), dilation=(1, 2),
                    n_layers=(1, 1))
    x = jnp.asarray(
        np.random.RandomState(3).randn(8, 16, 32, 4), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(3), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    if mesh_cfg is None:
        return np.asarray(fwd(params, x))
    mesh = MeshConfig(*mesh_cfg).build()
    with jax.set_mesh(mesh):
        xs = jax.device_put(
            x, NamedSharding(mesh, batch_spec(x.ndim, has_channel=True))
        )
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        return np.asarray(fwd(ps, xs))


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 2, 4), (1, 1, 8)])
def test_samudra_forward_mesh_invariance(mesh_shape):
    """ConvNeXt U-Net with circular-lon convolutions: XLA's spatial
    partitioner must insert the halo exchanges; results must match the
    single-device forward on any mesh."""
    reference = _samudra_forward(None)
    result = _samudra_forward(mesh_shape)
    np.testing.assert_allclose(result, reference, atol=2e-5)


def _swin_forward(mesh_cfg):
    from ace_tpu.models.swin import SwinTransformerNet

    model = SwinTransformerNet(
        out_channels=2, img_shape=(16, 32), embed_dim=16,
        num_heads=(2, 2, 2, 2), window_size=(2, 4), drop_path_rate=0.0,
        lat_coords=tuple(np.linspace(-82.5, 82.5, 16).tolist()),
    )
    x = jnp.asarray(
        np.random.RandomState(4).randn(8, 16, 32, 3), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(4), x)
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    if mesh_cfg is None:
        return np.asarray(fwd(params, x))
    mesh = MeshConfig(*mesh_cfg).build()
    with jax.set_mesh(mesh):
        xs = jax.device_put(
            x, NamedSharding(mesh, batch_spec(x.ndim, has_channel=True))
        )
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        return np.asarray(fwd(ps, xs))


@pytest.mark.medium_duration
@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_swin_forward_mesh_invariance(mesh_shape):
    """Shifted-window attention under data and spatial sharding."""
    reference = _swin_forward(None)
    result = _swin_forward(mesh_shape)
    np.testing.assert_allclose(result, reference, atol=2e-4)


def test_fsdp_sharded_train_step_matches_replicated():
    """FSDP-style parameter + optimizer-state sharding (ZeRO-3 analog,
    parallel/mesh.py shard_parameters) changes only placement: one full
    train step from identical initial state produces the same updated
    parameters as the replicated layout."""
    from ace_tpu.core.loss import StepLossConfig
    from ace_tpu.core.optimization import OptimizationConfig
    from ace_tpu.parallel.mesh import parameter_spec, shard_parameters
    from ace_tpu.stepper.train import StepperTrainConfig, TrainStepper
    from tests.test_step_stepper import _selector

    def make_ts():
        stepper = StepperConfig(step=_selector()).get_stepper(
            _dataset_info()
        )
        return TrainStepper(
            stepper,
            StepperTrainConfig(
                loss=StepLossConfig(type="AreaWeightedMSE"),
                n_forward_steps=1,
            ),
            OptimizationConfig(lr=1e-3, max_grad_norm=1.0),
        )

    rng = np.random.RandomState(5)
    batch_np = {
        k: rng.randn(8, 2, NLAT, NLON).astype(np.float32)
        for k in ["prog", "forcing_var", "diag"]
    }
    key = jax.random.PRNGKey(6)

    mesh = MeshConfig(2, 2, 2).build()
    results = {}
    with jax.set_mesh(mesh):
        for mode in ("replicated", "fsdp"):
            ts = make_ts()
            params, opt_state = ts.init(jax.random.PRNGKey(7))
            if mode == "fsdp":
                params = shard_parameters(
                    params, mesh, min_elements=1
                )
                opt_state = shard_parameters(
                    opt_state, mesh, min_elements=1
                )
                # at least one leaf actually sharded over the data axis
                specs = [
                    parameter_spec(x.shape, mesh, min_elements=1)
                    for x in jax.tree_util.tree_leaves(params)
                    if hasattr(x, "shape") and x.ndim > 0
                ]
                assert any("data" in str(s) for s in specs)
            else:
                params = jax.device_put(params, NamedSharding(mesh, P()))
                opt_state = jax.device_put(
                    opt_state, NamedSharding(mesh, P())
                )
            batch = {
                k: jax.device_put(
                    jnp.asarray(v), NamedSharding(mesh, batch_spec(4))
                )
                for k, v in batch_np.items()
            }
            step = ts.build_train_step(donate=False)
            new_params, _, metrics = step(params, opt_state, batch, key)
            results[mode] = (
                jax.tree_util.tree_map(np.asarray, new_params),
                float(metrics["loss"]),
            )
    assert np.isclose(results["replicated"][1], results["fsdp"][1],
                      rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results["replicated"][0]),
        jax.tree_util.tree_leaves(results["fsdp"][0]),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5)
