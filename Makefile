# Dev loop targets (reference: /root/reference/Makefile:60-91).

VERSION ?= $(shell python -c "import ace_tpu; print(ace_tpu.__version__)")

.PHONY: install
install:
	pip install -e . --no-build-isolation

# Full suite, parallel over 4 workers (reference `make test` = pytest -n 4).
.PHONY: test
test:
	python -m pytest tests/ -n 4 -q

# Fast tier: skips tests marked slow.
.PHONY: test_fast
test_fast:
	python -m pytest tests/ -n 4 -q --fast

# Very-fast tier: unit tests only (skips slow + medium_duration); the
# first gate in CI (reference: conftest.py --very-fast).
.PHONY: test_very_fast
test_very_fast:
	python -m pytest tests/ -n 4 -q --very-fast

# Serial full run (for debugging worker-dependent failures).
.PHONY: test_serial
test_serial:
	python -m pytest tests/ -x -q

# Multi-process distributed regression (2 real processes, CPU backend).
.PHONY: test_multiprocess
test_multiprocess:
	python -m pytest tests/test_multiprocess.py -q

.PHONY: bench
bench:
	python bench.py

# Render the HTML docs site (README + docs/*.md + generated config
# reference) into docs/_site (reference: /root/reference/docs sphinx
# tree; this image has no sphinx, scripts/build_docs.py renders with
# the markdown+pygments stack).
.PHONY: docs
docs:
	python scripts/build_docs.py docs/_site
