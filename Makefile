# Pre-commit gates.  Round-1's worst failure was a snapshot committed
# without re-running anything — never commit without at least `make smoke`,
# and run `make check` before milestone/end-of-round commits.

PY ?= python

.PHONY: check smoke test bench-smoke entry multichip

# Full gate: whole suite + smoke bench + driver entry points.
check: test bench-smoke entry multichip

test:
	$(PY) -m pytest tests/ -q

# Fast gate for frequent commits: quick test subset + imports + entry trace.
smoke:
	$(PY) -m pytest tests/test_models.py tests/test_train.py \
	    tests/test_infer.py -q
	$(PY) -c "import __graft_entry__ as g; fn, a = g.entry(); \
	    import jax; jax.jit(fn).lower(*a); print('entry lowers OK')"

bench-smoke:
	$(PY) bench.py --smoke

entry:
	$(PY) __graft_entry__.py

multichip:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
