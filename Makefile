# Canonical invocations for this container (see .claude/skills/verify/SKILL.md):
# - CPU runs must clear PYTHONPATH so the axon sitecustomize does not claim
#   the single tunneled TPU at interpreter startup.
# - TPU runs (bench) use the ambient env, one python process at a time.

.PHONY: test test-fast bench native clean

test:
	env PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	env PYTHONPATH= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q -p no:cacheprovider

bench:
	python bench.py

native:
	$(MAKE) -C tpu_sdr/transport/native

clean:
	$(MAKE) -C tpu_sdr/transport/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
