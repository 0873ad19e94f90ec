"""Build the native postprocess library: python -m micro_sam_tpu.native.build"""
import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "src", "postprocess.cpp")
    out = os.path.join(src_dir, "_postprocess.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
    # smoke check
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from micro_sam_tpu import native
    assert native.has_native(), "library failed to load"
    print("native backend active:", native.has_native())
