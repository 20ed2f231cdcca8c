"""Pipeline parallelism for scanned layer stacks (GPipe over ppermute).

Every transformer in this framework runs its depth under ``nn.scan``
with stacked (L, ...) params — one compiled layer body regardless of
depth (models/backbones/llama.py:143-209).  That layout is exactly what
stage-sharding wants: slice the leading L axis over a ``stage`` mesh
axis and each device holds a contiguous block of layers with NO
re-plumbing of the layer code.

:func:`pipeline_scan` runs the classic GPipe schedule: the batch splits
into M microbatches, the loop runs M + S - 1 steps, at each step every
stage applies its local layers (an inner ``lax.scan``) to the
activation it holds and ``ppermute``\\ s the result to the next stage —
a pure ICI neighbor exchange, no host involvement.  Bubble fraction is
(S-1)/(M+S-1); the activation working set per device is one microbatch.
Layer-invariant inputs (RoPE tables, masks) ride as ``consts``: they
are looked up per microbatch index from the replicated input instead of
flowing through the ppermute chain and output buffers, so only the
genuinely-evolving activation pays communication and buffer memory.

The reference never needs this (Lightning DDP replicates the whole
model, reference main.py:388-394); it exists here so the 3B text
backbone can run inference on chips too small to hold it — stage
memory is L/S of the weights.  Exactness vs the single-device scan is
pinned by tests/test_parallel_sp_pp.py (the schedule only reorders
WHICH device computes a layer, never the math within one microbatch).

Gradient contract: ``jax.grad`` works through the schedule — the
fori_loop bound (M + S - 1) is static, ``ppermute``/``psum``/``.at[].set``
all have reverse rules — and param/input gradients match the plain
``lax.scan`` gradients over the same microbatch shapes, including
gradients flowing through ``collect``\\ ed states
(tests/test_parallel_sp_pp.py::TestPipelineScan::test_grad_matches_sequential).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_scan", "pipelined_llama_states"]


def _pipeline_local(
    params_local: tp.Any,
    microbatches: tp.Any,
    consts: tp.Any,
    *,
    layer_fn: tp.Callable[..., tp.Any],
    collect: tp.Callable[[tp.Any], jax.Array] | None,
    n_microbatches: int,
    axis_name: str,
):
    """Per-device body (inside shard_map).

    ``params_local``: pytree with leading axis L_local (this stage's
    layers).  ``microbatches``/``consts``: replicated pytrees with
    leading axis M.  Returns (outputs, states): ``outputs`` the final
    activations (M, ...) — real values psum'd off the last stage — and
    ``states`` the per-layer collected states (L_local, M, ...) whose
    leading axis shard_map stitches into L_total (or a dummy when
    ``collect`` is None).
    """
    stage = lax.axis_index(axis_name)
    n_stage = lax.psum(1, axis_name)
    m = n_microbatches
    def vary(x):
        # idempotent device-varying cast (pcast rejects varying->varying)
        if axis_name in getattr(jax.typeof(x), "vma", ()):
            return x
        return lax.pcast(x, axis_name, to="varying")

    one_mb = jax.tree.map(lambda x: x[0], microbatches)
    one_c = jax.tree.map(lambda x: x[0], consts)

    def local_apply(act, const):
        # params are stage-varying, so the scan carry must be too
        act = jax.tree.map(vary, act)

        def body(a, p):
            a2 = layer_fn(p, a, const)
            st = collect(a2) if collect is not None else jnp.zeros((), jnp.float32)
            return a2, st
        return lax.scan(body, act, params_local)

    # static shapes for the state buffer: (L_local, M+1 garbage slot, ...)
    st_shape = jax.eval_shape(local_apply, one_mb, one_c)[1]
    l_local = st_shape.shape[0]

    # activations flow stage s -> s+1; stage 0 receives zeros (unused)
    perm = [(j, j + 1) for j in range(n_stage - 1)]

    def step(t, carry):
        buf, outputs, states = carry
        # microbatch this stage works on at step t (clipped during bubbles)
        mb_idx = jnp.clip(t - stage, 0, m - 1)
        valid = (t >= stage) & (t - stage < m)
        fresh = jax.tree.map(lambda x: x[jnp.clip(t, 0, m - 1)], microbatches)
        inp = jax.tree.map(lambda f, b: jnp.where(stage == 0, f, b), fresh, buf)
        const = jax.tree.map(lambda x: x[mb_idx], consts)
        out, sts = local_apply(inp, const)
        # writes land in garbage slot m when this step is a bubble
        w_idx = jnp.where(valid, mb_idx, m)
        states = states.at[:, w_idx].set(sts)
        rec = valid & (stage == n_stage - 1)
        o_idx = jnp.where(rec, mb_idx, m)
        outputs = jax.tree.map(lambda buf_, o: buf_.at[o_idx].set(o), outputs, out)
        buf_next = jax.tree.map(lambda x: lax.ppermute(x, axis_name, perm), out)
        return buf_next, outputs, states

    init = (
        jax.tree.map(lambda x: vary(jnp.zeros_like(x)), one_mb),
        jax.tree.map(
            lambda x: vary(jnp.zeros((m + 1,) + x.shape, x.dtype)), one_mb
        ),
        vary(jnp.zeros((l_local, m + 1) + st_shape.shape[1:], st_shape.dtype)),
    )
    _, outputs, states = lax.fori_loop(0, m + n_stage - 1, step, init)
    # non-last stages only ever wrote the garbage slot: psum recovers the
    # last stage's values on every device (replicated output)
    outputs = jax.tree.map(lambda x: lax.psum(x[:m], axis_name), outputs)
    if collect is None:
        return outputs, jnp.zeros((1, 1), jnp.float32)
    # stage-local (L_local, M, ...): shard_map's out_spec stitches the
    # leading axis into the global (L_total, M, ...) stack
    return outputs, states[:, :m]


def pipeline_scan(
    layer_fn: tp.Callable[..., tp.Any],
    stacked_params: tp.Any,
    activations: tp.Any,
    mesh: Mesh,
    axis_name: str = "stage",
    n_microbatches: int = 2,
    collect: tp.Callable[[tp.Any], jax.Array] | None = None,
    consts: tp.Any = None,
):
    """Apply an (L, ...)-stacked layer sequence, stages sharded over the mesh.

    ``layer_fn(params_one_layer, act) -> act`` is the single-layer body;
    ``activations`` is a pytree whose leaves all have leading batch axis
    B (B must divide ``n_microbatches``; each microbatch is B/M rows).
    ``consts`` optionally carries layer-INVARIANT per-row inputs (same
    leading axis B): they reach the layer as a third argument
    (``layer_fn(params, act, const)``) but never enter the ppermute
    chain, output buffers, or the final psum — pass masks/position
    tables here, and keep ``activations`` to what the layers actually
    transform.  ``collect(act)`` optionally extracts a per-layer state
    (the Llama hidden-states use case); collected states return as
    (L, B, ...).

    Returns ``(final_activations, states_or_None)`` with the batch axis
    restored.
    """
    n_stage = mesh.shape[axis_name]
    l_total = jax.tree.leaves(stacked_params)[0].shape[0]
    if l_total % n_stage:
        raise ValueError(f"{l_total} layers not divisible by {n_stage} stages")
    b = jax.tree.leaves(activations)[0].shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by {n_microbatches} microbatches")
    mb = b // n_microbatches

    fn3 = layer_fn if consts is not None else (lambda p, a, _c: layer_fn(p, a))
    to_micro = lambda x: x.reshape((n_microbatches, mb) + x.shape[1:])
    micro = jax.tree.map(to_micro, activations)
    consts_m = jax.tree.map(to_micro, consts) if consts is not None else ()

    fn = jax.shard_map(
        functools.partial(
            _pipeline_local,
            layer_fn=fn3,
            collect=collect,
            n_microbatches=n_microbatches,
            axis_name=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(), P(axis_name)),
    )
    outputs, states = fn(stacked_params, micro, consts_m)
    outputs = jax.tree.map(
        lambda x: x.reshape((b,) + x.shape[2:]), outputs
    )
    if collect is None:
        return outputs, None
    states = states.reshape((l_total, b) + states.shape[3:])
    return outputs, states


def pipelined_llama_states(
    cfg,
    params: tp.Mapping[str, tp.Any],
    input_ids: jax.Array,
    attention_mask: jax.Array | None,
    mesh: Mesh,
    axis_name: str = "stage",
    n_microbatches: int = 2,
) -> jax.Array:
    """LlamaBackbone forward with the 28-layer stack pipeline-sharded.

    Reproduces ``LlamaBackbone.__call__`` (models/backbones/llama.py)
    bit-for-bit per microbatch: the preamble is the SAME
    ``attention_inputs`` helper the backbone calls (rope tables, masks,
    right-pad contract), and the (L+1, B, T, D) hidden-state stack is
    assembled identically — only the layer loop is distributed.  RoPE
    tables and masks ride as pipeline consts (no ICI traffic for them);
    just the (mb, T, D) hidden state flows stage to stage.  ``params``
    is the backbone's param tree (the ``layers`` subtree carries the
    stacked (L, ...) leaves).
    """
    from ..models.backbones.llama import (
        LlamaLayer,
        RMSNorm,
        attention_inputs,
    )

    b, t = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), jnp.int32)
    embed_tbl = params["embed_tokens"]["embedding"]
    x = jnp.take(embed_tbl, input_ids, axis=0).astype(cfg.dtype)
    cos, sin, mask, lengths, right_padded = attention_inputs(cfg, attention_mask)
    x = jnp.where(right_padded[:, None, None], x, jnp.nan)

    layer = LlamaLayer(cfg)

    def layer_fn(p, x_, const):
        cos_, sin_, mask_, len_ = const
        (x2, *_), _y = layer.apply(
            {"params": p}, (x_, cos_, sin_, mask_, len_), None
        )
        return x2

    x, states = pipeline_scan(
        layer_fn,
        params["layers"],
        x,
        mesh,
        axis_name=axis_name,
        n_microbatches=n_microbatches,
        collect=lambda x_: x_.astype(jnp.float32),
        consts=(cos, sin, mask, lengths),
    )
    x = RMSNorm(cfg.rms_eps).apply({"params": params["final_norm"]}, x)
    head = jnp.take(embed_tbl, input_ids, axis=0).astype(jnp.float32)[None]
    full = jnp.concatenate([head, states], axis=0)
    return full.at[-1].set(x.astype(jnp.float32))
