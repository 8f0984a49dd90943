# Native components build (C++ host libraries; the TPU compute path is JAX)
CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC

all: cpp/libretrieval.so

cpp/libretrieval.so: cpp/retrieval.cpp
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q --junitxml=TESTS_r05.xml

bench:
	python bench.py

clean:
	rm -f cpp/*.so
