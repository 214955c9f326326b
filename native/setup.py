"""Build the native host extension: ``python native/setup.py build_ext
--build-lib pegainfer_tpu/native`` (or use pegainfer_tpu.native.build)."""

from setuptools import Extension, setup

setup(
    name="pegainfer_host",
    ext_modules=[
        Extension(
            "pegainfer_host",
            sources=["native/pegainfer_host.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
