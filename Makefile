.PHONY: native test test-tpu bench bench-full fixtures docs clean

docs:
	JAX_PLATFORMS=cpu python docs/gen_api.py

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

# Real-chip kernel tests: single worker (one chip), 'axon' registry name.
test-tpu:
	PROBREG_TPU_TEST_BACKEND=axon python -m pytest \
	  tests/test_em_pallas.py tests/test_culled_estep.py -n0 -q

bench:
	python bench.py

bench-full:
	python benchmarks/bench_full.py

fixtures:
	python data/make_fixtures.py

clean:
	rm -rf build probreg_tpu/*.so
