# Convenience targets
test:            ## fast suite (virtual 8-device CPU mesh)
	python -m pytest tests/ -q

test-all:        ## including slow integration tests
	python -m pytest tests/ -m "" -q

bench:           ## GM3D pretrain throughput on the attached TPU
	python bench.py

levers:          ## per-lever perf measurements (docs/BENCHMARKS.md round-3)
	python scripts/perf_levers.py

phases:          ## per-phase timing of the GM3D step on the TPU
	python scripts/profile_phases.py

native:          ## build the C++ threaded cloud loader
	$(MAKE) -C gm3d_tpu/native

dryrun:          ## 8-device multichip dry run (virtual CPU mesh)
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	  "import __graft_entry__ as g; g.dryrun_multichip(8)"

.PHONY: test test-all bench levers phases native dryrun
