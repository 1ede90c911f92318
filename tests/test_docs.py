"""Docs-as-tests: the committed config reference must match what the
dataclasses generate (reference: ai2cm/ace keeps YAML docs in sync with
dataclasses via docs tests, e.g. fme/docs/test_metric_configs_documented.py)."""

import os

import ace_tpu.docs_gen as docs_gen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_reference_in_sync():
    path = os.path.join(REPO, "docs", "config_reference.md")
    with open(path) as f:
        committed = f.read()
    assert committed == docs_gen.generate(), (
        "docs/config_reference.md is stale; regenerate with "
        "`python -m ace_tpu.docs_gen`"
    )


def test_every_entry_config_documented():
    content = docs_gen.generate()
    for cli, cls in docs_gen.entry_point_configs():
        assert f"`{cli}`" in content
        assert f"`{cls.__name__}`" in content


def test_all_registered_builders_documented():
    import ace_tpu.models.registry as registry

    content = docs_gen.generate()
    for name in registry.ModuleSelector.get_registry().registered_types:
        assert f"- `{name}`" in content, name


def test_docs_site_builds(tmp_path):
    """`make docs` analogue: the static site renders every page with
    nav + highlighted code (reference: docs.yaml builds the sphinx
    site per-commit)."""
    import sys

    sys.path.insert(0, "scripts")
    from build_docs import build

    out = tmp_path / "site"
    slugs = build(str(out))
    assert "index" in slugs and "config_reference" in slugs
    for slug in slugs:
        page = (out / f"{slug}.html").read_text()
        assert "<nav>" in page and "</main>" in page
    # config reference is regenerated, not read from the committed file
    assert "StepperConfig" in (out / "config_reference.html").read_text()
