"""Build driver for the native host library (cmake + ninja).

Usage: ``python -m picha_tpu.native.build`` or implicitly on first
import of :mod:`picha_tpu.native.lib` when the .so is missing/stale.
"""
from __future__ import annotations

import pathlib
import subprocess

HERE = pathlib.Path(__file__).parent
BUILD_DIR = HERE / "build"
LIB_PATH = BUILD_DIR / "libpicha_native.so"


def _sources():
    return sorted((HERE / "src").glob("*")) + [HERE / "CMakeLists.txt"]


def is_stale() -> bool:
    if not LIB_PATH.exists():
        return True
    lib_mtime = LIB_PATH.stat().st_mtime
    return any(s.stat().st_mtime > lib_mtime for s in _sources())


def build(force: bool = False) -> pathlib.Path:
    if not force and not is_stale():
        return LIB_PATH
    BUILD_DIR.mkdir(exist_ok=True)
    for cmd in (["cmake", "-G", "Ninja", "-S", str(HERE), "-B",
                 str(BUILD_DIR)],
                ["ninja", "-C", str(BUILD_DIR)]):
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"native build needs {cmd[0]} on PATH "
                f"(cmake+ninja; see picha_tpu/native/CMakeLists.txt)") from e
        except subprocess.CalledProcessError as e:
            # the auto-build-on-first-import path must surface the
            # compiler diagnostics, not just "returned non-zero"
            raise RuntimeError(
                f"native build failed ({' '.join(cmd[:2])}):\n"
                f"{e.stdout}\n{e.stderr}") from e
    return LIB_PATH


if __name__ == "__main__":
    try:
        path = build(force=True)
    except RuntimeError as e:
        raise SystemExit(str(e))
    print(f"built {path}")
