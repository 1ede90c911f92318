"""Reference ETL config-corpus parity: every committed YAML under the
reference's scripts/data_process/configs must parse verbatim into this
repo's config dataclasses (reference keys handled by the reference's
cloud/dask stack are accepted and ignored where documented)."""

import glob
import os

import pytest
import yaml

REF_CONFIGS = "/root/reference/scripts/data_process/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CONFIGS),
    reason="reference config corpus not mounted",
)


def _configs():
    out = {"atmos": [], "coupled": [], "coupled_ic": [], "append": [],
           "ocean": [], "other": []}
    for p in sorted(glob.glob(os.path.join(REF_CONFIGS, "*.yaml"))):
        d = yaml.safe_load(open(p))
        if "coupled_datasets" in d:
            out["coupled"].append(p)
        elif "coupled_config_path" in d:
            out["coupled_ic"].append(p)
        elif "dataset_computation" in d:
            dc = d["dataset_computation"]
            if "ocean_zarr" in dc or "ice_zarr" in dc:
                out["ocean"].append(p)
            elif "variable_sources" in dc:
                out["atmos"].append(p)
            elif "variable_sources" in d:
                out["append"].append(p)
            else:
                out["other"].append(p)
        elif "variable_sources" in d:
            out["append"].append(p)
        else:
            out["other"].append(p)
    return out


CORPUS = _configs()


@pytest.mark.parametrize(
    "path", CORPUS["atmos"], ids=[os.path.basename(p) for p in
                                  CORPUS["atmos"]]
)
def test_atmosphere_dataset_configs_parse(path):
    from ace_tpu.data_process.compute_dataset import DatasetConfig

    config = DatasetConfig.from_file(path).dataset_computation
    assert config.variable_sources
    assert config.vertical_coarsening_indices
    # coarsening indices must be exact-cover tuples
    for pair in config.vertical_coarsening_indices:
        assert len(pair) == 2 and pair[0] < pair[1]


@pytest.mark.parametrize(
    "path", CORPUS["coupled"], ids=[os.path.basename(p) for p in
                                    CORPUS["coupled"]]
)
def test_coupled_dataset_configs_parse(path):
    from ace_tpu.data_process.coupled_datasets import (
        CreateCoupledDatasetsConfig, InputEnsembleConfig,
    )

    config = CreateCoupledDatasetsConfig.from_file(path)
    assert config.version and config.family_name
    if isinstance(config.input_datasets, InputEnsembleConfig):
        assert config.input_datasets.runs
    else:
        assert config.input_datasets.atmosphere.zarr_path


@pytest.mark.parametrize(
    "path", CORPUS["coupled_ic"], ids=[os.path.basename(p) for p in
                                       CORPUS["coupled_ic"]]
)
def test_coupled_ic_configs_parse(path):
    from ace_tpu.core.config import from_dict
    from ace_tpu.data_process.create_coupled_ic import (
        CreateCoupledICConfig,
    )

    config = from_dict(CreateCoupledICConfig, yaml.safe_load(open(path)))
    assert config.coupled_config_path
    config.time.__post_init__()  # the time selection must be valid


@pytest.mark.parametrize(
    "path", CORPUS["append"], ids=[os.path.basename(p) for p in
                                   CORPUS["append"]]
)
def test_append_configs_parse(path):
    from ace_tpu.data_process.append_dataset import DatasetAppendConfig

    config = DatasetAppendConfig.from_file(path)
    assert config.variable_sources


@pytest.mark.parametrize(
    "path", CORPUS["ocean"], ids=[os.path.basename(p) for p in
                                  CORPUS["ocean"]]
)
def test_ocean_dataset_configs_parse(path):
    from ace_tpu.data_process.compute_ocean_dataset import (
        OceanDatasetConfig,
    )

    d = yaml.safe_load(open(path))
    if "ocean_zarr" not in d.get("dataset_computation", {}):
        from ace_tpu.data_process.compute_sea_ice_dataset import (
            SeaIceDatasetConfig,
        )

        config = SeaIceDatasetConfig.from_file(path).dataset_computation
        assert config.ice_zarr
        assert config.ocean_static.zarr
        return
    config = OceanDatasetConfig.from_file(path).dataset_computation
    assert config.ocean_zarr


def test_corpus_coverage():
    """Everything except the era5/ufs ingestion and E3SM vertical-
    coarsening helper configs (separate cloud pipelines) is exercised."""
    covered = sum(
        len(CORPUS[k]) for k in
        ("atmos", "coupled", "coupled_ic", "append", "ocean")
    )
    assert covered >= 60
    leftovers = [os.path.basename(p) for p in CORPUS["other"]]
    for name in leftovers:
        assert (
            name.startswith(("era5", "ufs-replay"))
            or "vertical-coarsen" in name
        ), f"unclassified reference config {name}"
