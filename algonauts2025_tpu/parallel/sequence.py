"""Sequence parallelism: exact ring attention over a mesh axis.

The long-sequence hot path of this framework is V-JEPA2 feature
extraction — 8192-token full attention per 64-frame window
(models/backbones/vjepa2.py).  On a single chip that runs through the
Pallas flash kernel; on a multi-chip slice the sequence itself can be
sharded so each chip holds T/n tokens and the KV shards rotate around
the ring (ICI neighbor exchange), giving O(T/n) activation memory per
chip and overlap-friendly communication.  The reference has no
equivalent (it never runs multi-GPU inference; see SURVEY.md §5
"Long-context/SP": absent by construction) — this is the TPU-native
extension point called out there.

Design notes
------------
- Standard ring attention (the flash recipe distributed over devices):
  each step computes a local (Tq_local x Tkv_local) score block against
  the currently-held KV shard, folds it into running (o, m, l)
  flash statistics, and ``ppermute``\\ s the KV shard to the next device.
  After ``n`` steps every query row has seen every key exactly once.
- The local block uses plain einsum in fp32: XLA fuses the exp/scale
  chain, and on a real slice the block is small enough
  (8192/n x 8192/n) that the MXU stays busy without a Pallas kernel.
  Swapping the inner block for a stats-returning flash kernel is a
  drop-in optimization — the merge algebra here does not change.
- Full (non-causal) attention is the video/trunk inference contract;
  ``causal=True`` adds the decoder mask (each step knows its KV shard's
  origin device, hence its global key offset).  The combine is
  order-independent up to fp reassociation, so the result matches
  single-device attention to fp32 roundoff.

Gradient contract
-----------------
``jax.grad`` works through the ring: the ``fori_loop`` trip count is the
static mesh-axis size (JAX scan-converts it for reverse mode) and
``ppermute`` transposes to the inverted permutation, so q/k/v gradients
match the single-device attention gradients to fp32 roundoff —
equivalence (incl. causal) is pinned by
``tests/test_parallel_sp_pp.py::TestRingAttention::test_grad_matches_single_device``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention_local", "sequence_parallel_attention"]


def ring_attention_local(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str,
    causal: bool = False,
) -> jax.Array:
    """Exact attention where Q and K/V are sharded over ``axis_name``.

    Call inside ``shard_map``.  ``q``: (B, H, Tq_local, D) — this
    device's query shard; ``k``/``v``: (B, H, Tkv_local, D) — this
    device's KV shard.  Returns (B, H, Tq_local, D): the attention of
    the local queries over the GLOBAL key/value sequence.

    ``causal=True`` masks global key position > global query position
    (the decoder contract): each step knows which device its current KV
    shard ORIGINATED from (rank - step mod n), which fixes the shard's
    global key offset.  Masked scores take -1e30, exactly like the
    single-device paths (ops/attention.py) — the flash-stats merge
    wipes any fully-masked step's contribution via the zero correction
    factor, so no NaN can survive (every causal row sees at least its
    own diagonal when its own shard arrives).
    """
    n = lax.psum(1, axis_name)
    rank = lax.axis_index(axis_name)
    d = q.shape[-1]
    tq, tkv = q.shape[2], k.shape[2]
    scale = d**-0.5
    qf = q.astype(jnp.float32) * scale
    # ring: every device forwards its current KV shard to the next
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(i, carry):
        o, m, l, k_c, v_c = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_c.astype(jnp.float32)
        )  # (B, H, Tq, Tkv_local)
        if causal:
            src = (rank - i) % n  # device this KV shard originated from
            q_pos = rank * tq + lax.broadcasted_iota(jnp.int32, (tq, tkv), 0)
            k_pos = src * tkv + lax.broadcasted_iota(jnp.int32, (tq, tkv), 1)
            s = jnp.where((q_pos >= k_pos)[None, None], s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        o_new = o * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32)
        )
        k_n = lax.ppermute(k_c, axis_name, perm)
        v_n = lax.ppermute(v_c, axis_name, perm)
        return o_new, m_new, l_new, k_n, v_n

    b, h, tq, _ = q.shape
    # mark the zero-init stats as device-varying so the fori_loop carry
    # type matches the (varying) step outputs under shard_map's vma checks
    vary = lambda x: lax.pcast(x, axis_name, to="varying")
    init = (
        vary(jnp.zeros((b, h, tq, d), jnp.float32)),
        vary(jnp.full((b, h, tq), -jnp.inf, jnp.float32)),
        vary(jnp.zeros((b, h, tq), jnp.float32)),
        k,
        v,
    )
    o, _, l, _, _ = lax.fori_loop(0, n, step, init)
    return (o / l[..., None]).astype(q.dtype)


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "data",
    causal: bool = False,
) -> jax.Array:
    """(B, H, T, D) attention with T sharded over ``mesh[axis_name]``.

    The global arrays are resharded so the sequence axis spans the mesh
    axis; each device runs :func:`ring_attention_local`.  The mesh axis
    size must divide T.  ``causal=True`` gives the decoder mask.
    Exactness vs the single-device path is pinned by
    ``tests/test_parallel_sp_pp.py``.
    """
    n = mesh.shape[axis_name]
    t = q.shape[2]
    if t % n:
        raise ValueError(
            f"sequence length {t} not divisible by mesh axis "
            f"{axis_name!r} of size {n}"
        )
    spec = P(None, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(ring_attention_local, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
