"""Loader for the FULL reference stepper stack (fme.ace.stepper).

Builds on the network-level stubs in test_reference_forward_parity
(torch SHT backed by this repo's validated precomputes) and adds the
import-time stubs the stepper-layer closure needs: dacite (backed by
this repo's own strict dict->dataclass converter), xarray/zarr/cftime/
wandb placeholders (annotation-only at import time), and package-path
placeholders so ``fme/__init__`` (which imports the whole world) never
executes.

This makes the reference's REAL Stepper / SingleModuleStep /
ModuleSelector / normalizer / corrector / ocean code runnable in-image,
so checkpoint-conversion round-trip tests can exercise the reference's
own ``Stepper.get_state`` serialization (reference:
fme/ace/stepper/single_module.py:1337) rather than a hand-built
imitation of it.
"""

import importlib
import sys
import types

_LOADED: dict = {}


def _no(*a, **k):
    raise NotImplementedError("stub: not needed by the stepper layer")


class _Placeholder:
    def __init__(self, *a, **k):
        raise NotImplementedError("stub: not needed by the stepper layer")


def _install_dacite():
    """dacite facade over ace_tpu.core.config.from_dict (which implements
    the same strict dict->dataclass semantics natively)."""
    if "dacite" in sys.modules:
        return
    from ace_tpu.core import config as acfg

    dacite = _stub_module("dacite")

    class Config:
        def __init__(self, strict=False, cast=None, check_types=True,
                     type_hooks=None, strict_unions_match=False):
            self.strict = strict
            self.cast = cast or []
            self.type_hooks = type_hooks or {}

    class DaciteError(Exception):
        pass

    class UnexpectedDataError(DaciteError):
        pass

    class MissingValueError(DaciteError):
        pass

    class WrongTypeError(DaciteError):
        pass

    def from_dict(data_class, data, config=None):
        try:
            return acfg.from_dict(data_class, data)
        except acfg.ConfigError as e:
            raise DaciteError(str(e)) from e

    dacite.Config = Config
    dacite.from_dict = from_dict
    dacite.DaciteError = DaciteError
    dacite.UnexpectedDataError = UnexpectedDataError
    dacite.MissingValueError = MissingValueError
    dacite.WrongTypeError = WrongTypeError
    exc = _stub_module("dacite.exceptions")
    exc.DaciteError = DaciteError
    exc.UnexpectedDataError = UnexpectedDataError
    exc.MissingValueError = MissingValueError
    exc.WrongTypeError = WrongTypeError
    dacite.exceptions = exc
    sys.modules["dacite"] = dacite
    sys.modules["dacite.exceptions"] = exc


def _stub_module(name: str) -> types.ModuleType:
    """A stub module with a real ModuleSpec: torch._dynamo walks
    importlib.util.find_spec over sys.modules entries and raises
    ValueError on modules whose __spec__ is None."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_data_stubs():
    """xarray / zarr / cftime / wandb: imported by the stepper closure but
    only exercised by data-loading paths the tests never touch."""
    if "xarray" not in sys.modules:
        xr = _stub_module("xarray")
        for n in ("Dataset", "DataArray", "Variable", "CFTimeIndex",
                  "Coordinates", "Index"):
            setattr(xr, n, type(n, (_Placeholder,), {}))
        for n in ("load_dataset", "open_dataset", "concat", "merge"):
            setattr(xr, n, _no)
        sys.modules["xarray"] = xr
    if "zarr" not in sys.modules:
        zarr = _stub_module("zarr")
        zarr.Array = _Placeholder
        zarr.Group = _Placeholder
        zarr.open = _no
        zarr.open_group = _no
        sys.modules["zarr"] = zarr
    if "cftime" not in sys.modules:
        cftime = _stub_module("cftime")

        class _Datetime:
            def __init__(self, year=1, month=1, day=1, hour=0, minute=0,
                         second=0, microsecond=0, calendar="standard",
                         **kw):
                self.year, self.month, self.day = year, month, day
                self.hour, self.minute = hour, minute
                self.second, self.microsecond = second, microsecond
                self.calendar = calendar

        for n in ("datetime", "DatetimeJulian", "DatetimeNoLeap",
                  "DatetimeProlepticGregorian", "DatetimeGregorian",
                  "Datetime360Day", "DatetimeAllLeap", "Datetime366Day"):
            setattr(cftime, n, _Datetime)
        cftime.num2date = _no
        cftime.date2num = _no
        sys.modules["cftime"] = cftime
    if "wandb" not in sys.modules:
        wandb = _stub_module("wandb")

        class _WandbBase:
            def __init__(self, *a, **k):
                pass

        for n in ("Histogram", "Table", "Video", "Image", "Plotly"):
            setattr(wandb, n, type(n, (_WandbBase,), {}))
        wandb.init = _no
        wandb.log = _no
        wandb.run = None
        errors = _stub_module("wandb.errors")

        class CommError(Exception):
            pass

        errors.CommError = CommError
        wandb.errors = errors
        sys.modules["wandb"] = wandb
        sys.modules["wandb.errors"] = errors


def load_reference_stepper():
    """Import and return the reference fme.ace.stepper.single_module with
    the full real code path (step, normalizer, ocean, corrector,
    registry) live. Cached after the first call."""
    if _LOADED:
        return _LOADED["stepper_module"]

    import test_reference_forward_parity as parity

    parity._install_csfno_stubs()
    _install_dacite()
    _install_data_stubs()

    import torch

    # the parity stubs' device/distributed facades cover only what the
    # network layer touches; the stepper layer needs the full surface
    dev = sys.modules["fme.core.device"]
    dev.move_tensordict_to_device = lambda d: {
        k: v.to(torch.device("cpu")) for k, v in d.items()
    }
    dev.using_gpu = lambda: False
    dev.in_dataloader_worker = lambda: False
    dist_cls = sys.modules["fme.core.distributed"].Distributed
    dist_cls.wrap_module = staticmethod(lambda m: m)
    dist_cls.is_root = lambda self: True
    dist_cls.is_distributed = lambda self: False
    dist_cls.local_batch_size = lambda self, b: b

    # resolvable package placeholders so fme/__init__ never executes
    for name, path in [
        ("fme", "/root/reference/fme"),
        ("fme.core", "/root/reference/fme/core"),
        ("fme.ace", "/root/reference/fme/ace"),
        ("fme.core.models", "/root/reference/fme/core/models"),
        ("fme.ace.models", "/root/reference/fme/ace/models"),
    ]:
        m = sys.modules.get(name)
        if m is None:
            m = _stub_module(name)
            sys.modules[name] = m
        m.__path__ = [path]

    importlib.import_module("fme.ace.registry.sfno")
    stepper_module = importlib.import_module(
        "fme.ace.stepper.single_module"
    )
    _LOADED["stepper_module"] = stepper_module
    return stepper_module
