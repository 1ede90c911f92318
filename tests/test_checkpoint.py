"""Checkpoint round-trip tests (reference model:
fme/ace/stepper test_stepper round-trips + backwards-compat checks).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ace_tpu.core.config import to_dict
from ace_tpu.core.step.base import StepSelector
from ace_tpu.stepper.checkpoint import (
    load_stepper,
    load_train_checkpoint,
    save_stepper,
    save_train_checkpoint,
)
from ace_tpu.stepper.stepper import PrognosticState, StepperConfig

from tests.test_step_stepper import NLAT, NLON, _dataset_info, _step_config


def _stepper():
    sel = StepSelector(type="single_module", config=to_dict(_step_config()))
    stepper = StepperConfig(step=sel).get_stepper(_dataset_info())
    stepper.init_params(jax.random.PRNGKey(0))
    return stepper, StepperConfig(step=sel)


def test_stepper_checkpoint_roundtrip(tmp_path):
    stepper, config = _stepper()
    path = str(tmp_path / "ckpt.msgpack")
    save_stepper(path, stepper, config)
    restored = load_stepper(path)

    rng = np.random.RandomState(0)
    ic = PrognosticState(
        data={"prog": jnp.asarray(rng.randn(1, 1, NLAT, NLON), jnp.float32)}
    )
    forcing = {
        "forcing_var": jnp.asarray(rng.randn(1, 3, NLAT, NLON), jnp.float32)
    }
    out1, _ = stepper.predict(ic, forcing)
    out2, _ = restored.predict(ic, forcing)
    np.testing.assert_allclose(
        np.asarray(out1["prog"]), np.asarray(out2["prog"]), atol=1e-6
    )
    # dataset info survives
    assert restored.step.dataset_info.img_shape == (NLAT, NLON)
    assert restored.step.dataset_info.timestep is not None


def test_train_checkpoint_roundtrip(tmp_path):
    stepper, config = _stepper()
    ema = jax.tree_util.tree_map(lambda p: p * 0.5, stepper.params)
    path = str(tmp_path / "train_ckpt.msgpack")
    save_train_checkpoint(
        path, stepper, config, opt_state=None, ema_params=ema,
        extra={"epoch": 3, "num_batches_seen": 17},
    )
    out = load_train_checkpoint(path)
    assert out["extra"]["epoch"] == 3
    p1 = jax.tree_util.tree_leaves(out["ema_params"])
    p2 = jax.tree_util.tree_leaves(ema)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_atomic_write_no_partial(tmp_path):
    stepper, config = _stepper()
    path = str(tmp_path / "ckpt.msgpack")
    save_stepper(path, stepper, config)
    # no stray tmp files remain
    leftovers = [p for p in tmp_path.iterdir() if ".tmp." in p.name]
    assert leftovers == []


def test_stepper_override_on_load(tmp_path):
    """Inference-time ocean/prescribed overrides mutate the stored step
    config before rebuild (reference: single_module.py:1848)."""
    import jax

    from tests.test_step_stepper import _dataset_info, _step_config
    from ace_tpu.core.config import to_dict
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.stepper.checkpoint import load_stepper, save_stepper
    from ace_tpu.stepper.stepper import (
        StepperConfig,
        StepperOverrideConfig,
    )

    sel = StepSelector(type="single_module", config=to_dict(_step_config()))
    cfg = StepperConfig(step=sel)
    stepper = cfg.get_stepper(_dataset_info())
    stepper.params = stepper.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "s.msgpack")
    save_stepper(path, stepper, cfg)

    plain = load_stepper(path)
    assert plain.step.config.prescribed_prognostic_names == []

    override = StepperOverrideConfig(
        prescribed_prognostic_names=["prog"]
    )
    overridden = load_stepper(path, override=override)
    assert overridden.step.config.prescribed_prognostic_names == ["prog"]
    # params still load
    import numpy as np

    for a, b in zip(
        jax.tree_util.tree_leaves(plain.params),
        jax.tree_util.tree_leaves(overridden.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_backwards_compatibility():
    """A checkpoint committed at format-v1 must keep loading and
    predicting in every future version (reference analog:
    scripts/manual_backwards_compatibility). If this fails, the
    checkpoint format changed incompatibly — add a migration, don't
    regenerate the fixture.
    """
    import os

    import numpy as np

    from ace_tpu.stepper.checkpoint import load_stepper

    path = os.path.join(
        os.path.dirname(__file__), "data", "backcompat_stepper_v1.msgpack"
    )
    stepper = load_stepper(path)
    assert stepper.prognostic_names == ["prog"]
    assert stepper.training_history.get_history_by_key()["git_sha"] == [
        "fixture"
    ]
    # forward prediction still works on the restored params
    import jax.numpy as jnp

    from tests.test_step_stepper import NLAT, NLON

    from ace_tpu.stepper.stepper import PrognosticState

    rng = np.random.RandomState(0)
    ic = PrognosticState(
        data={"prog": jnp.asarray(rng.randn(2, 1, NLAT, NLON), jnp.float32)}
    )
    forcing = {
        "forcing_var": jnp.asarray(
            rng.randn(2, 2, NLAT, NLON), jnp.float32
        ),
    }
    out, _ = stepper.predict(ic, forcing)
    assert np.isfinite(np.asarray(out["prog"])).all()
