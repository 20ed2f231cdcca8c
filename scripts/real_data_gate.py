#!/usr/bin/env python
"""One-command real-data accuracy gate (ACCURACY.md protocol).

Thin CLI over algonauts2025_tpu.experiment.accuracy_gate — see that
module's docstring for the stages, thresholds, and interchange format.

    python scripts/real_data_gate.py \
        --ref-features /path/to/exported_reference_features \
        --ref-metrics  /path/to/reference_metrics.csv \
        [--seeds 33 34 35] [--out gate_report.json] [key=value ...]

Exit code 0 only when every stage ran AND passed.
"""

import sys

if __name__ == "__main__":
    from algonauts2025_tpu.experiment.accuracy_gate import main

    sys.exit(main())
