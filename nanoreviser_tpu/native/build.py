"""Compile the native runtime (libnanorev.so) with the system C++ toolchain."""

from __future__ import annotations

import os
import subprocess
import sys

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_PKG_DIR, "src", "nanorev.cpp")
OUT = os.path.join(_PKG_DIR, "libnanorev.so")

CXXFLAGS = [
    "-O3", "-std=c++17", "-fPIC", "-shared",
    "-march=native", "-fno-math-errno",
    "-Wall",
]


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = ["g++", *CXXFLAGS, SRC, "-o", OUT]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return OUT


if __name__ == "__main__":
    try:
        path = build(force="--force" in sys.argv)
        print(f"built {path}")
    except subprocess.CalledProcessError as exc:
        print(exc.stderr, file=sys.stderr)
        sys.exit(1)
