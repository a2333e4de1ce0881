"""Zero-shot / checkpoint evaluation entry point.

    python -m valor_tpu.cli.evaluate --config X.json --checkpoint ckpt \
        [--zero_shot true]

Equivalent of the reference's `--zero_shot` path (train.py:74-79).
"""

from __future__ import annotations

import sys

from valor_tpu.cli.train import main as train_main


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--zero_shot" not in " ".join(argv):
        argv += ["--zero_shot", "true"]
    train_main(argv)


if __name__ == "__main__":
    main()
