"""Build script: compiles the native GSD loader into the wheel.

The package is pure Python + one small C++ shared library
(``hoomd_tf_tpu/native/gsd.cpp``). Building it here means wheels ship a
prebuilt ``libhtfgsd.so``; when it is absent (source installs, editable
checkouts), :mod:`hoomd_tf_tpu.native` falls back to an on-demand g++
build at first use.
"""

import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        # compile into the build tree so the .so lands inside the wheel
        out = self.get_module_outfile(
            self.build_lib, ["hoomd_tf_tpu", "native"], "__init__")
        libdir = out.rsplit("/", 1)[0]
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", f"{libdir}/libhtfgsd.so",
             "hoomd_tf_tpu/native/gsd.cpp"],
            check=True)


setup(cmdclass={"build_py": BuildWithNative})
