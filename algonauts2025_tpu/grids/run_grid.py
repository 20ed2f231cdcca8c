"""Layer x seed hyperparameter sweep (parity with reference
grids/run_grid.py config values).

    python -m algonauts2025_tpu.grids.run_grid [--dry-run] [--overwrite]

Set ``infra.cluster="external"`` + ALGONAUTS_TPU_LAUNCHER in the base
config for one TPU slice per run.
"""

from __future__ import annotations

from ._launch import launch_sweep, sweep_parser

SWEEP = "grid"

#: fractional-depth layer selections swept against seeds
LAYER_CHOICES = [
    [0.0, 0.5, 1.0],
    [0.5, 0.75, 1.0],
    [0.5, 1.0],
    [0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
]


def main(argv: list[str] | None = None) -> list:
    parser = sweep_parser("layers x seed sweep")
    parser.add_argument("--seeds", type=int, default=5, help="number of seeds")
    args = parser.parse_args(argv)
    grid = {
        "data.layers": LAYER_CHOICES,
        "seed": list(range(args.seeds)),
    }
    return launch_sweep(SWEEP, grid, args=args)


if __name__ == "__main__":
    main()
