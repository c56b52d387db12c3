"""Builds the native host-pipeline library (g++, no external deps)."""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "fastio.cpp")
OUT = os.path.join(HERE, "libfastio.so")
IMG_SRC = os.path.join(HERE, "imgcodec.cpp")
IMG_OUT = os.path.join(HERE, "libimgcodec.so")


def _compile(src: str, out: str, extra, force: bool) -> str:
    if not force and os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
           "-std=c++17", src, "-o", out] + extra
    subprocess.run(cmd, check=True)
    return out


def build(force: bool = False) -> str:
    return _compile(SRC, OUT, [], force)


def build_imgcodec(force: bool = False) -> str:
    """Separate library: needs libpng/libjpeg at link time, so its absence
    must not take down the dependency-free fastio fast paths."""
    return _compile(IMG_SRC, IMG_OUT, ["-lpng", "-ljpeg"], force)


if __name__ == "__main__":
    force = "--force" in sys.argv
    print(build(force=force))
    try:
        print(build_imgcodec(force=force))
    except Exception as exc:  # toolchain or codec libs absent
        print(f"imgcodec skipped: {exc}")
