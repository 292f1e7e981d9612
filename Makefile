.PHONY: native test quick smoke check bench clean

native:
	$(MAKE) -C csrc

# full pytest suite: 295+ tests, ~40 min on 1 vCPU (all green 2026-08-19)
test:
	python -m pytest tests/ -q

# fast smoke tier: ~78 tests, ~60-65 s on 1 vCPU
quick:
	python -m pytest -m "quick and not slow" -q

# hermetic end-to-end smoke matrix (reference unitest/*.sh surface)
smoke:
	bash unitest/fashionmnist.sh
	bash unitest/flava.sh
	bash unitest/mmbt.sh
	bash unitest/vilt.sh

# the pre-commit gate: quick pytest tier + the four end-to-end smokes
check: quick smoke

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
