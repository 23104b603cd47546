"""Build hook: compile the native runtime into the wheel.

The package works from a plain source checkout too (nyxus_tpu.native JIT-
compiles on first use and degrades to pure-Python readers without a
toolchain); this hook just pre-bakes ``libnyxnative.so`` so wheel installs
never need g++ (reference analog: the CMake + setup.py + cibuildwheel stack,
/root/reference/CMakeLists.txt:425-442, setup.py)."""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "nyxus_tpu", "native", "src")
        sources = [os.path.join(src, s) for s in
                   ("tiff_reader.cpp", "csv_writer.cpp", "zarr_codec.cpp",
                    "contour.cpp", "geomfeats.cpp")]
        out_dir = os.path.join(self.build_lib, "nyxus_tpu", "native",
                               "_build")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, "libnyxnative.so")
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out,
               *sources, "-ltiff"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=600)
            print("built", out)
        except Exception as e:  # pure-Python wheel still works
            print("WARNING: native build skipped (%s); the package will "
                  "JIT-compile or fall back to pure-Python readers" % e)


setup(cmdclass={"build_py": BuildWithNative})
