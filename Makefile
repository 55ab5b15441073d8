# Dev workflow (analogue of the reference Makefile: check/test/build)

PYTHON ?= python

.PHONY: test test-quick test-fast check build bench clean

# PALLAS_AXON_POOL_IPS is cleared so the TPU-tunnel plugin never
# registers in test processes: tests force the CPU platform anyway
# (tests/conftest.py), and a python-start plugin registration would
# otherwise block every run whenever the tunnel holds a stale device
# claim (the env var must be cleared in the SHELL — sitecustomize runs
# before conftest can touch os.environ).
test:
	PALLAS_AXON_POOL_IPS= $(PYTHON) -m pytest tests/ -x -q

# ~5-9 min core-contract subset (tests/conftest.py _QUICK_MODULES): run
# per change; the full suite (~55 min) per round / nightly.
test-quick:
	PALLAS_AXON_POOL_IPS= $(PYTHON) -m pytest tests/ -x -q -m quick

test-fast: test-quick

# check = byte-compile + dependency-free lint (always available) + ruff /
# mypy when installed (this dev image ships neither; CI installs both —
# reference Makefile:19-44 parity)
check:
	$(PYTHON) -m compileall -q ptdeco_tpu tests apps
	$(PYTHON) aux/lint_basic.py
	@if $(PYTHON) -c "import ruff" 2>/dev/null || command -v ruff >/dev/null; then \
		ruff check ptdeco_tpu apps aux tests bench.py __graft_entry__.py; \
	else echo "ruff not installed; skipped (CI runs it)"; fi
	@if command -v mypy >/dev/null; then \
		mypy --ignore-missing-imports ptdeco_tpu; \
	else echo "mypy not installed; skipped (CI runs it)"; fi

build:
	$(PYTHON) -m build

bench:
	$(PYTHON) bench.py

clean:
	rm -rf build dist *.egg-info
	find . -name __pycache__ -type d -exec rm -rf {} +

# Self-contained app bundles embedding the library (analogue of the
# reference trainer Makefiles' zip bundles, trainer_llm/Makefile:44-56).
.PHONY: bundle-llm bundle-vision vercommit version

bundle-llm:
	rm -rf build/bundle_llm && mkdir -p build/bundle_llm
	cp -r ptdeco_tpu apps build/bundle_llm/
	printf 'from apps.trainer_llm.run import main\nimport sys\nsys.exit(main())\n' \
		> build/bundle_llm/__main__.py
	cd build/bundle_llm && zip -qr ../trainer_llm.zip .
	@echo "run with: python build/trainer_llm.zip --config ... --output-path ..."

bundle-vision:
	rm -rf build/bundle_vision && mkdir -p build/bundle_vision
	cp -r ptdeco_tpu apps build/bundle_vision/
	printf 'from apps.trainer_vision.run import main\nimport sys\nsys.exit(main())\n' \
		> build/bundle_vision/__main__.py
	cd build/bundle_vision && zip -qr ../trainer_vision.zip .
	@echo "run with: python build/trainer_vision.zip --config ... --output-path ..."

version:
	$(PYTHON) aux/get_version.py

vercommit:
	bash aux/block_empty_commit.sh
	$(PYTHON) aux/update_version.py patch
	git add ptdeco_tpu/_version.py && git commit -m "Bump version to $$($(PYTHON) aux/get_version.py)"
