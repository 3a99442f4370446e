"""Build the native runtime: g++ -> native/libelevenrt.so.

Usage: python native/build.py
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "elevenrt.cpp")
OUT = os.path.join(HERE, "libelevenrt.so")


def build(force: bool = False) -> str | None:
    """Compile if needed; returns the .so path or None on failure."""
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           SRC, "-o", OUT]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return OUT
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None


if __name__ == "__main__":
    path = build(force=True)
    if path is None:
        sys.exit(1)
    print(path)
