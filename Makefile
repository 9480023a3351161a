# Developer entry points. The TPU measurement queue (make measure)
# assumes the axon tunnel is up; everything else runs on CPU.

PY ?= python

.PHONY: test test-quick cpp bench-smoke measure

test:
	$(PY) -m pytest tests/ -x -q

test-quick:
	$(PY) -m pytest tests/ -x -q -m "not slow"

cpp:
	$(MAKE) -C ubresnet_tpu/cpp

# Harness self-test at tiny shapes on CPU (~10 min; exercises the
# probe, infer, train, fused-train A/B and deploy-runner paths).
bench-smoke:
	UBTPU_PLATFORM=cpu UBTPU_BENCH_HW=64 UBTPU_BENCH_BATCH=4 \
	UBTPU_BENCH_ITERS=3 UBTPU_BENCH_INPLANES=4 \
	UBTPU_BENCH_TRAIN_BATCH=2 UBTPU_BENCH_TRAIN_ITERS=2 \
	$(PY) bench.py

# The standing TPU measurement queue (tools/README.md; run when the
# tunnel is up). Each step appends evidence for docs/roofline.md.
# bench.py itself also measures the fused-train A/B + deploy overlap,
# so an end-of-round driver bench records them either way.
measure:
	$(PY) tools/verify_train.py
	$(PY) tools/train_ab.py
	$(PY) tools/profile_train.py
	$(PY) tools/deconv_legs.py
	$(PY) tools/mxu_sweep.py
	$(PY) bench.py
