.PHONY: test test-all bench native lint clean

# fast default (slow-marked golden/driver tests deselected via addopts)
test:
	python -m pytest tests/ -q

# the CI target: full suite including slow goldens
test-all:
	python -m pytest tests/ -q -m ""

native:
	$(MAKE) -C native

bench:
	python bench.py

bench3d:
	BENCH_MODE=cavity3d python bench.py

shedding:
	python scripts/karman_shedding.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache .jax_cache
