.PHONY: native test bench clean

native: mini_nbody_tpu/native/libnbody_oracle.so

mini_nbody_tpu/native/libnbody_oracle.so: mini_nbody_tpu/native/nbody_oracle.cpp
	g++ -O3 -march=native -fopenmp -shared -fPIC $< -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f mini_nbody_tpu/native/libnbody_oracle.so
	find . -name __pycache__ -type d -exec rm -rf {} +
