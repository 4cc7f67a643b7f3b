# Single-command CI gate: everything the driver and the judge check,
# runnable locally. `make check` = unit/property/plan tests + the full
# full-registry DuckDB oracle mirror at the driver's sf0.01.
#
#   make test      - pytest suite (sf0.001 fixtures, tuned session)
#   make oracle    - scripts/check_correctness.py, full registry, sf0.01
#   make plans     - regenerate tests/plan_snapshots.json (review the diff!)
#   make bench     - bench.py at $SPARK_GRAFT_SF_DIR (default sf0.1)
#   make check     - test + oracle (the full triple: plan gate runs inside pytest)

PY ?= python

.PHONY: check test oracle plans bench

check: test oracle
	@echo "CHECK GREEN: pytest + plan gate + full oracle mirror"

test:
	$(PY) -m pytest tests/ -q

oracle:
	$(PY) scripts/check_correctness.py /root/testdata/sf0.01

plans:
	$(PY) scripts/snapshot_plans.py

bench:
	$(PY) bench.py
