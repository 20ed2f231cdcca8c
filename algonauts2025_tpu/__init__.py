"""algonauts2025_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the TRIBE
trimodal brain encoder pipeline (reference: vovw/algonauts-2025).

Layers (bottom-up):
- core: time/event/segment primitives (host-side NumPy)
- config, cache: pydantic config surface + content-addressed array/task caches
- io: wav/video/fmri readers (host data plane)
- data: study loaders, enhancers, datasets
- features: frozen-backbone feature extractors (JAX)
- models, ops: trainable trunk + Pallas kernels
- parallel: device mesh / sharding
- training: optax training loop, metrics, checkpoints
- experiment, grids: end-to-end experiment app and orchestration
"""

__version__ = "0.1.0"

from . import runtime as _runtime

_runtime.enable_compilation_cache()
_runtime.force_cpu_if_requested()


_LAZY = {
    "Experiment": "algonauts2025_tpu.experiment",
    "Data": "algonauts2025_tpu.experiment",
    "run_grid": "algonauts2025_tpu.experiment.grid",
    "ConfDict": "algonauts2025_tpu.config",
    "StudyLoader": "algonauts2025_tpu.data.study",
    "average_submissions": "algonauts2025_tpu.grids.average_submissions",
}


def __getattr__(name: str):
    # lazy top-level API: `import algonauts2025_tpu as at; at.Experiment`
    # without paying the full import cost for light uses
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
