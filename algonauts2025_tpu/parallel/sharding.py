"""Parameter sharding rules for the ("data", "model") mesh.

Pure data parallelism replicates params; with ``model`` > 1 the large
weights shard over the model axis (tensor parallelism):

- SubjectLayers readout (S, C, D): shard D (the 1000-parcel axis) — the
  per-subject readouts are the biggest trainable weights (4 x 3072 x 1000),
  and the (B, O, T) output stays sharded on O through loss/metrics sums
  which jit reduces with a psum.
- trunk FF kernels (D, 4D)/(4D, D): shard the 4D axis (megatron-style
  column/row split), so the pair needs a single reduce per block.
- attention qkv/out kernels: shard heads via the output/input feature axis.

Everything else replicates.  XLA SPMD inserts the collectives; this module
only *annotates*.
"""

from __future__ import annotations

import logging
import typing as tp

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = ["state_shardings", "param_spec", "sharding_report"]


def param_spec(path: str, shape: tuple[int, ...], model_axes: int) -> P:
    """PartitionSpec for one parameter by its flattened path."""
    if model_axes <= 1:
        return P()
    if "predictor" in path and path.endswith("weights"):
        return P(None, None, "model")  # (S, C, D): shard parcels
    if "predictor" in path and path.endswith("bias"):
        return P(None, "model")
    # scanned trunk blocks: (L, in, out) kernels
    if "blocks" in path and "ff" in path and path.endswith("kernel"):
        if len(shape) == 3:
            # column-parallel for the expanding matmul, row-parallel for the
            # contracting one (in > out -> contract)
            return P(None, None, "model") if shape[1] < shape[2] else P(None, "model", None)
    if "blocks" in path and ("qkv" in path or "attn/out" in path) and path.endswith("kernel"):
        if len(shape) == 3:
            return P(None, None, "model") if "qkv" in path else P(None, "model", None)
    return P()


def state_shardings(state: tp.Any, mesh: Mesh) -> tp.Any:
    """A TrainState-shaped pytree of NamedShardings.

    Parameters whose shard axis does not divide the model-axis size fall
    back to replication — loudly, because a silently-replicated readout on
    a tp>1 mesh trains slower with no other signal."""
    model_axes = mesh.shape.get("model", 1)

    def one(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_entries)
        spec = param_spec(path, getattr(leaf, "shape", ()), model_axes)
        # guard: only shard axes that divide evenly
        if spec != P():
            for axis_name, dim in zip(spec, getattr(leaf, "shape", ())):
                if axis_name is not None and dim % model_axes:
                    logger.warning(
                        "param %s shape %s does not divide model=%d on axis %r; "
                        "replicating (tensor parallelism disabled for it)",
                        path,
                        getattr(leaf, "shape", ()),
                        model_axes,
                        axis_name,
                    )
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, state)


def sharding_report(state: tp.Any, mesh: Mesh) -> dict[str, int]:
    """How many parameter *elements* are sharded vs replicated under the
    mesh — the observability hook for "is tp actually engaged?"."""
    shardings = state_shardings(state, mesh)
    counts = {"sharded": 0, "replicated": 0}
    for leaf, sh in zip(jax.tree.leaves(state), jax.tree.leaves(shardings)):
        size = int(getattr(leaf, "size", 0) or 0)
        if isinstance(sh, NamedSharding) and any(s is not None for s in sh.spec):
            counts["sharded"] += size
        else:
            counts["replicated"] += size
    return counts
