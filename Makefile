.PHONY: test test-quick test-all bench native lint clean

# fast default (slow-marked golden/driver tests deselected via addopts)
# measured 2026-08-20: 204 tests, ~43 min on this 1-core host
test:
	python -m pytest tests/ -q

# <10-min gate for every-change runs (VERDICT r03 weak #4): unit kernels +
# solver layer + one spatial-order test (Stokes) + one NS time-order test
# (Chorin x flat) + the sealed-box golden invariant + one integration step
# + the patch-layout exactness core. Measured ~7 min on this host.
test-quick:
	python -m pytest -q \
	  tests/test_assembly.py tests/test_krylov.py tests/test_ell.py \
	  tests/test_native.py tests/test_message.py tests/test_timestep.py \
	  tests/test_io.py tests/test_msh.py tests/test_structured.py \
	  tests/test_stokes.py tests/test_sealed_box.py \
	  tests/test_navier_stokes.py::test_chorin_flat_quick \
	  "tests/test_fast.py::test_fast_step_matches_reference_path" \
	  tests/test_patch.py::test_patch_operator_parity \
	  tests/test_patchfast.py::test_packed_kernels_exact

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
