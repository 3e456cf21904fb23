"""Build the native tiffturbo codec (g++ -O3 -shared, linked with zlib).

Usage: python -m proteus_tpu.native.build
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, 'tiffturbo.cpp')
LIB = os.path.join(HERE, 'libtiffturbo.so')


def build(verbose=True):
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
           '-std=c++17', SRC, '-o', LIB, '-lz', '-lpthread']
    if verbose:
        print(' '.join(cmd))
    subprocess.run(cmd, check=True)
    return LIB


def lib_is_fresh():
    return (os.path.isfile(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC))


if __name__ == '__main__':
    build()
    print(f'built {LIB}')
    sys.exit(0)
