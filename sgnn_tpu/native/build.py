"""CLI: build the native library. `python -m sgnn_tpu.native.build`."""

import sys

from sgnn_tpu import native


def main():
    ok = native.build(verbose=True)
    if ok and native.available():
        print("built", native._SO)
        return 0
    print("native build failed (scipy fallback will be used)", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
