.PHONY: native test bench clean

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf build probreg_tpu/*.so
