"""micro_sam_tpu.info CLI: version / device / cache / model overview
(reference micro_sam/util.py:1400-1558, without the rich dependency)."""
from __future__ import annotations

import os
import platform
import sys


def _section(title: str) -> None:
    print(f"\n=== {title} ===")


def main():
    import argparse
    parser = argparse.ArgumentParser(description="micro_sam_tpu environment info.")
    parser.add_argument("--download", nargs="*", default=None,
                        help="Model names to pre-download (requires network).")
    args = parser.parse_args()

    from . import __version__
    from . import util

    _section("micro_sam_tpu")
    print("version:", __version__)
    print("python:", sys.version.split()[0], "on", platform.platform())

    _section("compute")
    try:
        import jax
        print("jax:", jax.__version__)
        print("devices:", jax.devices())
        print("default backend:", jax.default_backend())
    except Exception as e:  # pragma: no cover
        print("jax unavailable:", e)

    _section("cache")
    cachedir = util.microsam_cachedir()
    print("MICROSAM_CACHEDIR:", cachedir)
    if os.path.exists(cachedir):
        n_files = sum(len(fs) for _, _, fs in os.walk(cachedir))
        print("cached files:", n_files)

    _section("models")
    for name in util.get_model_names():
        print(" -", name)

    if args.download is not None:
        print("\nModel download is not available in offline environments; "
              "pass checkpoint_path to get_sam_model instead.")


if __name__ == "__main__":
    main()
