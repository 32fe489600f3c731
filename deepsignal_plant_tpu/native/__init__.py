"""Native (C++) fast paths for host-side codecs; see featparse.cpp.
Python fallbacks live in utils/formats.py — the loader here returns None
when the shared library is unavailable."""
from __future__ import annotations

import ctypes
import os
import subprocess

_SO_PATH = os.path.join(os.path.dirname(__file__), "libdsp_native.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "featparse.cpp")
_lib = None
_tried = False


def build_native(force: bool = False) -> bool:
    """Compile featparse.cpp -> libdsp_native.so with g++ -O3. Returns
    success."""
    if not os.path.exists(_SRC_PATH):
        return False
    if os.path.exists(_SO_PATH) and not force and \
            os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
        return True
    tmp_path = _SO_PATH + ".tmp"
    # -ffp-contract=off: dsp_read_norm_stats promises bit-exactness with
    # numpy's separate mul/sub ops — FMA contraction breaks it by 1 ulp
    for flags in (["-O3", "-march=native", "-ffp-contract=off"],
                  ["-O3", "-ffp-contract=off"]):
        try:
            subprocess.run(
                ["g++", *flags, "-shared", "-fPIC", "-std=c++17",
                 _SRC_PATH, "-o", tmp_path],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp_path, _SO_PATH)   # atomic: never a partial .so
            return True
        except subprocess.CalledProcessError:
            continue   # real compile error: retry without -march=native
        except Exception:
            break      # g++ missing / timeout: a retry would fare the same
        finally:
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
    return False


def get_native_lib():
    """ctypes handle to the native library; None if unavailable (callers
    fall back to numpy paths). Installed builds ship the .so compiled at
    pip-install time (setup.py); the runtime g++ build here is the
    refresh/fallback path (source newer than the .so, working from a git
    checkout). A failed REBUILD on a host without a toolchain must not
    drop a .so that exists — the stale-but-working library is loaded
    with a warning rather than silently losing every native fast path."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    built = build_native()
    if not built and os.path.exists(_SO_PATH):
        import sys
        sys.stderr.write(
            "[warn] native library rebuild failed (no C++ toolchain?) "
            "but an existing libdsp_native.so predates featparse.cpp — "
            "loading the stale build; rebuild with g++ to pick up "
            "source changes\n")
    if built or os.path.exists(_SO_PATH):
        try:
            _lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib = None
    if _lib is not None and not built:
        # a stale .so may predate the current ABI: fastparse._configure
        # sets argtypes for EVERY exported symbol unconditionally, so a
        # library missing any of them would crash the first native call
        # with AttributeError instead of falling back to numpy. Run the
        # real _configure as the probe — it covers exactly the symbol
        # set the code will use, so this can't drift when new exports
        # are added (round-4 review).
        try:
            from ..utils.fastparse import _configure
            _configure(_lib)
        except AttributeError as exc:
            import sys
            sys.stderr.write(
                "[warn] existing libdsp_native.so is too old for this "
                "version ({}) and no toolchain can rebuild it — native "
                "fast paths disabled (numpy fallbacks)\n".format(exc))
            _lib = None
    if _lib is not None:
        # the native parse path allocates large per-block numpy buffers;
        # heap reuse is what lets parser threads scale (see jaxinit)
        from ..utils.jaxinit import tune_host_allocator
        tune_host_allocator()
    return _lib
