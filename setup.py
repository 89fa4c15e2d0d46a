"""Build hook: compile the optional native IO library into the package.

The C++ helpers (native/oswald_io.cpp) are a plain ctypes shared library,
not a CPython extension, so the build is one compiler invocation via the
native Makefile.  Failure is non-fatal — oswald_tpu.io falls back to the
vectorised numpy implementations, and the runtime also retries a
first-use build from a source checkout (oswald_tpu/io/native.py)."""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

ROOT = os.path.dirname(os.path.abspath(__file__))


class BinaryDistribution(Distribution):
    """The wheel carries a platform-specific liboswald_io.so, so it must
    get a platform tag — a py3-none-any wheel would install a non-loadable
    .so on other platforms (masked by the numpy fallback, but silently
    losing the native fast path)."""

    def has_ext_modules(self):
        return True


class BuildWithNative(build_py):
    def run(self):
        super().run()
        native = os.path.join(ROOT, "native")
        try:
            subprocess.run(["make", "-C", native], check=True,
                           capture_output=True, timeout=300)
        except (OSError, subprocess.SubprocessError):
            print("warning: native IO library build failed; "
                  "installing with the numpy fallback only")
            return
        so = os.path.join(native, "liboswald_io.so")
        if os.path.isfile(so):
            dst = os.path.join(self.build_lib, "oswald_tpu", "io")
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(so, dst)


setup(cmdclass={"build_py": BuildWithNative},
      distclass=BinaryDistribution)
