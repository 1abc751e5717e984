"""Command-line entry: python -m smplifyx_tpu.cli --config cfg/preset.yaml ...

Mirrors the reference invocation `python smplifyx/main.py --config ...`
(smplifyx/main.py:326-328) with the same YAML-preset + flag-override model.
"""

from __future__ import annotations

from smplifyx_tpu.app import run
from smplifyx_tpu.utils.config import parse_cli


def main(argv=None) -> None:
    cfg = parse_cli(argv)
    run(cfg)


if __name__ == "__main__":
    main()
