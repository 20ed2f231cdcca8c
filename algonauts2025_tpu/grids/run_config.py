"""Run a single Experiment from a JSON config file.

The entry point the external launcher (ALGONAUTS_TPU_LAUNCHER) invokes on
each TPU slice for job-array fan-out:

    python -m algonauts2025_tpu.grids.run_config /path/to/task_00000.json
"""

from __future__ import annotations

import json
import sys

from ..experiment import Experiment
from ..parallel.mesh import init_distributed


def main(path: str) -> None:
    init_distributed()
    config = json.loads(open(path).read())
    out = Experiment(**config).run()
    print(json.dumps(out, default=str))


def cli(argv: list[str] | None = None) -> None:
    """Console-script entry (``algonauts-tpu-run-config <config.json>``)."""
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        raise SystemExit("usage: algonauts-tpu-run-config <config.json>")
    main(argv[0])


if __name__ == "__main__":
    cli()
