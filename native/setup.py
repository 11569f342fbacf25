"""Build the host-native kernel extension (analogue of the reference's
setup.py cythonize step, SURVEY.md §3 C9):

    cd native && python setup.py build_ext --inplace

or just `make native` at the repo root.  The package works without it
(ops/host.py falls back to numpy); tests covering the extension skip when
it is absent.
"""

from setuptools import Extension, setup

setup(
    name="gaussian_processes_tpu_native",
    ext_modules=[
        Extension(
            "_ckernels",
            sources=["ckernels.c"],
            extra_compile_args=["-O3", "-fno-math-errno"],
        )
    ],
)
