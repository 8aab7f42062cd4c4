# Top-level orchestration — replaces the reference's compile.c (fork/execv
# of g++/mpiCC per variant, compile.c:22-61).
.PHONY: all native test parity bench bench-solve bench-latency \
        bench-stages sweep plots quality clean

all: native test

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

parity: native
	python -m tpu80211.cli parity --mode math
	python -m tpu80211.cli parity --mode matlab
	python -m tpu80211.cli parity --mode c_parity

bench:
	python bench.py

bench-solve:
	python scripts/bench_mmse_solve.py

bench-latency:
	python scripts/bench_latency.py

bench-stages:
	python scripts/bench_stages.py

sweep:
	python -m tpu80211.cli sweep

plots:
	python -m tpu80211.cli plot --out-prefix artifacts/cfr

quality:
	python -m tpu80211.cli quality --png artifacts/quality_vs_snr.png

clean:
	$(MAKE) -C native clean
	rm -rf artifacts .pytest_cache
