"""Build the native runtime components (g++ -> .so loaded via ctypes).

    python tools/build_native.py

Outputs land in native/build/. Idempotent; rebuilds only when sources are
newer than the library.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")
BUILD = os.path.join(NATIVE, "build")

TARGETS = {
    "ringlog": ["ringlog.cpp"],
}

CXX = os.environ.get("CXX", "g++")
FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", "-Wall"]


def build(name: str, sources) -> str:
    os.makedirs(BUILD, exist_ok=True)
    out = os.path.join(BUILD, f"lib{name}.so")
    srcs = [os.path.join(NATIVE, s) for s in sources]
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs):
        return out
    cmd = [CXX, *FLAGS, "-o", out, *srcs]
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def build_all():
    return {name: build(name, srcs) for name, srcs in TARGETS.items()}


if __name__ == "__main__":
    paths = build_all()
    for name, path in paths.items():
        print(f"built {name}: {path}")
    sys.exit(0)
