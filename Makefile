# pcr-tpu developer entry points
PY ?= python

.PHONY: test bench native patterns lint clean

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:   ## force-build the C++ host kernels into the cache
	$(PY) -c "from pcr_tpu import native; assert native.available(); \
	print('native kernels OK,', native.lib().pcr_native_threads(), 'threads')"

patterns: ## render visual glyph patterns (CPU + TPU) and compare
	$(PY) scripts/patterns/generate_glyph_patterns.py --mode cpu
	$(PY) scripts/patterns/generate_glyph_patterns.py --mode tpu
	$(PY) scripts/patterns/compare_cpu_tpu_patterns.py

clean:
	rm -rf .pytest_cache $$(find . -name __pycache__)
