"""Model-soup ensemble fan-out (parity with reference
grids/run_ensemble.py config values).

    python -m algonauts2025_tpu.grids.run_ensemble [--n-models 1000]

Samples configs from the soup grid (layers, loss, aggregation, dropout,
subject embedding) and launches one run per sample; combine afterwards with
grids.average_submissions.
"""

from __future__ import annotations

from .run_grid import LAYER_CHOICES
from ._launch import launch_sweep, sweep_parser

SWEEP = "model_soup"

#: the soup's sampling space (reference run_ensemble.py:27-53 values)
SOUP_GRID = {
    "data.layers": LAYER_CHOICES,
    "loss.name": ["MSELoss", "PearsonLoss", "SmoothL1Loss", "HuberLoss"],
    "data.layer_aggregation": [None, "group_mean"],
    "brain_model_config.subject_embedding": [True, False],
    "brain_model_config.layer_aggregation": ["cat", "mean"],
    "brain_model_config.feature_aggregation": ["cat", "sum"],
    "brain_model_config.modality_dropout": [0.0, 0.2, 0.4],
}


def main(argv: list[str] | None = None) -> list:
    parser = sweep_parser("model-soup ensemble sweep")
    parser.add_argument(
        "--n-models", type=int, default=1000, help="number of sampled configs"
    )
    parser.add_argument("--sample-seed", type=int, default=None)
    args = parser.parse_args(argv)
    return launch_sweep(
        SWEEP,
        dict(SOUP_GRID),
        base_update={"seed": None, "patience": None},
        sample=args.n_models,
        seed=args.sample_seed,
        args=args,
    )


if __name__ == "__main__":
    main()
