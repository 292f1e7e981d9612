.PHONY: native test smoke bench clean

native:
	$(MAKE) -C csrc

test:
	python -m pytest tests/ -q

smoke:
	bash unitest/fashionmnist.sh
	bash unitest/flava.sh
	bash unitest/mmbt.sh
	bash unitest/vilt.sh

bench:
	python bench.py

clean:
	$(MAKE) -C csrc clean
