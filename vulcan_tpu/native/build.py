"""Build the native library: python -m vulcan_tpu.native.build"""
import sys

from . import _LIB_PATH, build

if __name__ == "__main__":
    ok = build(verbose=True)
    print(f"{'built' if ok else 'FAILED'}: {_LIB_PATH}")
    sys.exit(0 if ok else 1)
