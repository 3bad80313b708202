# Developer entry points.  The test suite is split with pytest markers:
#   (default)   fast signal — no fused-trainer compiles, < 5 min on 1 CPU
#               (warm init/XLA caches; ~7 min on the first run after an edit)
#   slow        trainer/mesh/CLI compiles and big-model TF parity
#   tf_parity   cross-framework parity vs the TensorFlow reference
#   tpu         needs real TPU hardware (CONFIGNET_TPU_TEST_PLATFORM=tpu)

.PHONY: test-fast test-slow test-all test-parity test-tpu test-pretrained import-release bench bench-train lint

test-tpu:
	CONFIGNET_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_tpu.py -q

test-fast:
	python -m pytest tests/ -q -m "not slow and not tpu and not pretrained"

test-slow:
	python -m pytest tests/ -q -m "slow and not pretrained"

test-all:
	python -m pytest tests/ -q -m "not tpu and not pretrained"

test-pretrained:
	python -m pytest tests/test_pretrained.py -m pretrained -v

# Release-acceptance gate: given the official model.zip (and optionally the
# Keras backbone .h5s), unpack -> strict import -> golden-output contract ->
# demo smoke, in one command.  Stays staged (exit 2) until artifacts exist.
import-release:
	python setup/import_release.py

test-parity:
	python -m pytest tests/test_tf_parity.py -q

bench:
	python bench.py

bench-train:
	python bench_train.py

lint:
	python -m pyflakes confignet_tpu tests bench.py bench_train.py __graft_entry__.py 2>/dev/null || true
