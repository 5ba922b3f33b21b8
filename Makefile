.PHONY: test test-fast contract bench scaling package

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_property.py

# driver-contract gate at the driver's scale (DuckDB oracles)
contract:
	KAMAE_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_driver_contract.py -q

bench:
	python bench.py

# N vs 4N scaling protocol -> BENCH/BASELINE.md (run with nothing else on the box)
scaling:
	KAMAE_SCALING_CONVS=3000000 KAMAE_BENCH_ONLY=synth python scripts/scaling_bench.py

package:
	python scripts/package.py
