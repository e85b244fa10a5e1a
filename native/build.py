"""Build the native audio loader extension with g++ (no pybind11 needed).

Usage: python native/build.py   (writes _native_audio.so next to this file)
"""
from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).parent


def build(verbose: bool = True) -> Path:
    src = HERE / "audio_loader.cpp"
    out = HERE / "_native_audio.so"
    include = sysconfig.get_path("include")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{include}", str(src), "-o", str(out), "-lpthread"]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
