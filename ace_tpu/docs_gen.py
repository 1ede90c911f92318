"""Config-reference documentation generator:
``python -m ace_tpu.docs_gen [output.md]``.

Walks the entry-point config dataclasses recursively and emits a markdown
reference of every YAML field, its type, and its default. A sync test
(tests/test_docs.py) regenerates this and compares against
docs/config_reference.md so the docs can never drift from the dataclasses
(reference: the ai2cm/ace docs are generated from the same dataclasses and
kept in sync by docs tests, e.g. fme/docs/test_metric_configs_documented.py).
"""

import dataclasses
import sys
import typing


def _type_name(tp) -> str:
    origin = typing.get_origin(tp)
    if origin is typing.Union or str(origin) == "types.UnionType":
        args = typing.get_args(tp)
        return " | ".join(_type_name(a) for a in args)
    if origin is not None:
        args = typing.get_args(tp)
        name = getattr(origin, "__name__", str(origin))
        if args:
            return f"{name}[{', '.join(_type_name(a) for a in args)}]"
        return name
    if tp is type(None):
        return "None"
    return getattr(tp, "__name__", str(tp))


def _default_repr(field: dataclasses.Field) -> str:
    if field.default is not dataclasses.MISSING:
        return repr(field.default)
    if field.default_factory is not dataclasses.MISSING:  # type: ignore
        try:
            return repr(field.default_factory())  # type: ignore
        except Exception:
            return f"{field.default_factory.__name__}()"  # type: ignore
    return "(required)"


def _walk(cls, seen: set, sections: list):
    if cls in seen or not dataclasses.is_dataclass(cls):
        return
    seen.add(cls)
    lines = [f"### `{cls.__name__}`", ""]
    doc = (cls.__doc__ or "").strip().split("\n\n")[0].replace("\n", " ")
    if doc:
        lines += [doc, ""]
    lines += ["| field | type | default |", "|---|---|---|"]
    try:
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {f.name: f.type for f in dataclasses.fields(cls)}
    children = []
    for field in dataclasses.fields(cls):
        tp = hints.get(field.name, field.type)
        lines.append(
            f"| `{field.name}` | `{_type_name(tp)}` |"
            f" `{_default_repr(field)}` |"
        )
        for cand in _dataclass_args(tp):
            children.append(cand)
    lines.append("")
    sections.append("\n".join(lines))
    for child in children:
        _walk(child, seen, sections)


def _dataclass_args(tp):
    found = []
    if dataclasses.is_dataclass(tp):
        found.append(tp)
    for arg in typing.get_args(tp):
        found.extend(_dataclass_args(arg))
    return found


def entry_point_configs():
    """(entry module, config class) pairs for every CLI."""
    from ace_tpu.compute_stats import ComputeStatsConfig
    from ace_tpu.coupled.inference import CoupledInferenceConfig
    from ace_tpu.coupled.train import CoupledTrainConfig
    from ace_tpu.downscaling.predict import DownscalerConfig
    from ace_tpu.downscaling.train import DownscalingTrainConfig
    from ace_tpu.inference.evaluator import (
        DatasetComparisonConfig,
        EvaluatorConfig,
    )
    from ace_tpu.inference.inference import InferenceConfig
    from ace_tpu.train.trainer import TrainConfig
    from ace_tpu.data_process.append_dataset import DatasetAppendConfig
    from ace_tpu.data_process.compute_dataset import DatasetConfig
    from ace_tpu.data_process.compute_ocean_dataset import (
        OceanDatasetConfig,
    )
    from ace_tpu.data_process.coupled_datasets import (
        CreateCoupledDatasetsConfig,
    )
    from ace_tpu.data_process.combine_stats import MergeStatsConfig
    from ace_tpu.data_process.create_coupled_ic import (
        CreateCoupledICConfig,
    )
    from ace_tpu.data_process.noise_floor import DataConfig
    from ace_tpu.data_process.window_avg import (
        CreateWindowAvgDatasetConfig,
    )
    from ace_tpu.data_process.write_monthly_data import (
        Config as WriteMonthlyDataConfig,
    )

    return [
        ("python -m ace_tpu.train", TrainConfig),
        ("python -m ace_tpu.inference", InferenceConfig),
        ("python -m ace_tpu.evaluator", EvaluatorConfig),
        ("python -m ace_tpu.evaluator (dataset comparison)",
         DatasetComparisonConfig),
        ("python -m ace_tpu.coupled.train", CoupledTrainConfig),
        ("python -m ace_tpu.coupled.inference", CoupledInferenceConfig),
        ("python -m ace_tpu.downscaling", DownscalingTrainConfig),
        ("python -m ace_tpu.downscaling.predict", DownscalerConfig),
        ("python -m ace_tpu.compute_stats", ComputeStatsConfig),
        ("python -m ace_tpu.data_process.compute_dataset", DatasetConfig),
        ("python -m ace_tpu.data_process.compute_ocean_dataset",
         OceanDatasetConfig),
        ("python -m ace_tpu.data_process.coupled_datasets",
         CreateCoupledDatasetsConfig),
        ("python -m ace_tpu.data_process.window_avg",
         CreateWindowAvgDatasetConfig),
        ("python -m ace_tpu.data_process.write_monthly_data",
         WriteMonthlyDataConfig),
        ("python -m ace_tpu.data_process.noise_floor", DataConfig),
        ("python -m ace_tpu.data_process.append_dataset",
         DatasetAppendConfig),
        ("python -m ace_tpu.data_process.create_coupled_ic",
         CreateCoupledICConfig),
        ("python -m ace_tpu.data_process.combine_stats merge",
         MergeStatsConfig),
    ]


def generate() -> str:
    out = [
        "# Configuration reference",
        "",
        "Generated by `python -m ace_tpu.docs_gen` — do not edit by hand;",
        "tests/test_docs.py keeps this file in sync with the dataclasses.",
        "",
        "Every entry point takes a YAML file matching its config dataclass",
        "plus `--override a.b=value` dotlist overrides.",
        "",
    ]
    seen: set = set()
    for cli, cls in entry_point_configs():
        out.append(f"## `{cli}`")
        out.append("")
        sections: list = []
        _walk(cls, seen, sections)
        if not sections:
            out.append(f"See `{cls.__name__}` above (shared config).")
            out.append("")
        out.extend(sections)
    out.extend(_registry_sections(seen))
    return "\n".join(out) + "\n"


def _registry_sections(seen: set) -> list:
    """Registered {type, config} selector entries: model builders, step
    types — the polymorphic YAML surface."""
    import ace_tpu.models.registry  # noqa: F401  (populates registries)
    from ace_tpu.core.step.base import StepSelector
    from ace_tpu.models.registry import ModuleSelector

    module_reg = ModuleSelector.get_registry()
    step_reg = StepSelector.get_registry()
    out = ["## Registered model builders (`builder: {type, config}`)", ""]
    for name in sorted(module_reg.registered_types):
        out.append(f"- `{name}`")
    out += ["", "## Registered step types (`step: {type, config}`)", ""]
    for name in sorted(step_reg.registered_types):
        out.append(f"- `{name}`")
    out.append("")
    sections: list = []
    for name in sorted(module_reg.registered_types):
        _walk(module_reg.get_class(name), seen, sections)
    for name in sorted(step_reg.registered_types):
        _walk(step_reg.get_class(name), seen, sections)
    return out + sections


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    path = argv[0] if argv else "docs/config_reference.md"
    content = generate()
    with open(path, "w") as f:
        f.write(content)
    print(f"wrote {path} ({content.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
