.PHONY: test bench native lint clean

test:
	python -m pytest tests/ -q

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
