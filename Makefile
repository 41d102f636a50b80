# Test / verification targets (mirrors the reference's ros/gisnav/Makefile
# test-static / test-unit / test-launch / test-sitl split, adapted to this
# framework's surfaces).

.PHONY: test-static test-fast test-all test-parity dryrun bench docs deb

test-static:
	python tools/static_check.py

# fast subset: unit + subsystem tests, no heavy e2e compiles (~5 min CPU)
test-fast:
	python -m pytest tests/ -q -m "not slow"

# everything, 8-device virtual CPU mesh (~20 min cold)
test-all:
	python -m pytest tests/ -q

# Pallas-kernel parity vs XLA references — needs the real TPU
test-parity:
	GISNAV_TPU_PARITY=1 python -m pytest tests/test_tpu_parity.py -q

# the driver's multi-chip gate (fresh process required)
dryrun:
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

bench:
	python bench.py

docs:
	python tools/gen_api_docs.py

deb:
	bash tools/build_deb.sh
