# Dev workflow (analogue of the reference Makefile: check/test/build)

PYTHON ?= python

.PHONY: test test-fast check build bench clean

test:
	$(PYTHON) -m pytest tests/ -x -q

test-fast:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

check:
	$(PYTHON) -m compileall -q ptdeco_tpu tests apps

build:
	$(PYTHON) -m build

bench:
	$(PYTHON) bench.py

clean:
	rm -rf build dist *.egg-info
	find . -name __pycache__ -type d -exec rm -rf {} +
