"""Tests for create_decoupled_checkpoint
(reference: scripts/coupled/create_decoupled_checkpoint.py)."""

import jax
import pytest

from ace_tpu.core.config import to_dict
from ace_tpu.core.step.base import StepSelector
from ace_tpu.data_process.create_decoupled_checkpoint import (
    create_decoupled_checkpoint,
    main,
)
from ace_tpu.stepper.checkpoint import load_stepper, save_stepper
from ace_tpu.stepper.stepper import StepperConfig

from tests.test_step_stepper import NLAT, NLON, _dataset_info, _step_config


def _save_component(path):
    sel = StepSelector(type="single_module", config=to_dict(_step_config()))
    config = StepperConfig(step=sel)
    stepper = config.get_stepper(_dataset_info())
    stepper.init_params(jax.random.PRNGKey(0))
    save_stepper(str(path), stepper, config)


def test_extract_from_experiment_dir(tmp_path):
    ckpt_dir = tmp_path / "exp" / "training_checkpoints"
    ckpt_dir.mkdir(parents=True)
    _save_component(ckpt_dir / "atmosphere_ckpt.msgpack")
    out = str(tmp_path / "atmosphere.msgpack")
    create_decoupled_checkpoint(str(tmp_path / "exp"), out, "atmosphere")
    stepper = load_stepper(out)
    assert stepper.step.dataset_info.img_shape == (NLAT, NLON)


def test_extract_from_file_via_cli(tmp_path):
    src = tmp_path / "ocean_ckpt.msgpack"
    _save_component(src)
    out = str(tmp_path / "ocean.msgpack")
    main([
        "--component", "ocean",
        "--input_path", str(src),
        "--output_path", out,
    ])
    assert load_stepper(out) is not None


def test_missing_component_raises(tmp_path):
    (tmp_path / "exp" / "training_checkpoints").mkdir(parents=True)
    with pytest.raises(FileNotFoundError):
        create_decoupled_checkpoint(
            str(tmp_path / "exp"), str(tmp_path / "o.msgpack"), "ocean"
        )


def test_bad_component_raises(tmp_path):
    with pytest.raises(ValueError, match="unrecognized component"):
        create_decoupled_checkpoint("x", "y", "land")
