"""Blockwise flash attention (Pallas TPU) for long sequences.

The video backbone attends over 8192 tokens per 64-frame window; letting
XLA materialize the (8192, 8192) fp32 score matrix in HBM makes attention
~20x slower than HBM bandwidth allows (measured 0.65 s/layer on v5e).
This kernel streams KV blocks through VMEM with online softmax — scores
never touch HBM.  Non-causal, no mask (windows are fixed-length); head
dims are zero-padded to the 128-lane tile, which leaves the results exact.

Grid: (batch*heads, T/q_block); per program the full K/V for that head sit
in VMEM (a few MB at these sizes) and a fori_loop walks kv blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ._util import round_up as _round_up

__all__ = ["flash_attention"]


def _flash_kernel(
    len_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    kv_block: int,
    scale: float,
    causal: bool,
    masked: bool,
):
    q = q_ref[0]  # (qb, Dp)
    qb, dp = q.shape
    t = k_ref.shape[1]
    q_off = pl_program_id(1) * qb
    valid = len_ref[pl_program_id(0)] if masked else t
    # skip provably-empty kv blocks (exact: a skipped block contributes
    # p = exp(-1e30 - m) = 0): causal -> blocks past row q_off+qb-1;
    # masked -> blocks entirely beyond `valid` (right-padded lengths), so
    # padded llama batches do O(T*valid) score work instead of O(T^2)
    n_kv = t // kv_block
    if causal:
        n_kv = jnp.minimum((q_off + qb + kv_block - 1) // kv_block, n_kv)
    if masked:
        n_kv = jnp.minimum((valid + kv_block - 1) // kv_block, n_kv)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl_ds(i * kv_block, kv_block), :]
        v = v_ref[0, pl_ds(i * kv_block, kv_block), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        if causal or masked:
            col = i * kv_block + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_block), 1)
            keep = jnp.ones((qb, kv_block), bool)
            if causal:
                row = q_off + jax.lax.broadcasted_iota(jnp.int32, (qb, kv_block), 0)
                keep &= col <= row
            if masked:
                keep &= col < valid
            s = jnp.where(keep, s, -1e30)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((qb, dp), jnp.float32)
    m0 = jnp.full((qb, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((qb, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    out = acc / jnp.maximum(l, 1e-30)
    if masked:
        # an all-masked row (valid == 0) has every score at -1e30, so p is
        # uniform and out becomes a mean of padded V; force zeros instead
        out = jnp.where(valid > 0, out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def pl_program_id(axis):
    from jax.experimental import pallas as pl

    return pl.program_id(axis)


def pl_ds(start, size):
    from jax.experimental import pallas as pl

    return pl.ds(start, size)


def _fast_kernel(
    q_ref, k_ref, v_ref, o_ref, *, kv_block: int, sum_lane: int, score_dtype
):
    """Non-causal, unmasked fast path.

    Two VPU passes removed vs the general kernel: the softmax scale is
    folded into q by the caller, and the row-sum of p rides the PV matmul
    through a ones-column planted in v's zero padding (lane ``sum_lane``) —
    numerically this matches summing the bf16-cast p, the same values the
    PV matmul consumes, so numerator and denominator stay consistent.

    ``score_dtype=bfloat16`` stores the score block s in bf16 (MXU still
    accumulates fp32 internally); the kernel is VMEM-bandwidth-bound on s
    (BENCH_NOTES.md), so halving its footprint buys real time.  The cast
    adds ~2^-8 relative error to logits that already carry bf16 q/k input
    error of the same order; max/exp math stays fp32 in registers.
    """
    q = q_ref[0]
    qb, dp = q.shape
    t = k_ref.shape[1]

    def body(i, carry):
        acc, m = carry
        k = k_ref[0, pl_ds(i * kv_block, kv_block), :]
        v = v_ref[0, pl_ds(i * kv_block, kv_block), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # Mosaic requires fp32 matmul accumulators; the bf16 variant stores
        # the score block through a cast instead (halved VMEM footprint if
        # the compiler folds it into the result stream)
        s = s.astype(score_dtype)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True).astype(jnp.float32))
        p = jnp.exp(s.astype(jnp.float32) - m_new)
        alpha = jnp.exp(m - m_new)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc * alpha + pv, m_new

    acc0 = jnp.zeros((qb, dp), jnp.float32)
    m0 = jnp.full((qb, 1), -jnp.inf, jnp.float32)
    acc, _ = jax.lax.fori_loop(0, t // kv_block, body, (acc0, m0))
    l = acc[:, sum_lane : sum_lane + 1]
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _prep_fast_inputs(q, k, v):
    """Shared input prep for the unmasked fast kernels: softmax scale
    folded into q, head dim zero-padded to the 128-lane tile with a
    ones-column planted in v's padding at lane ``d`` (the MXU-side row
    sum), heads flattened into the grid axis.  Returns (qp, kp, vp, dp).
    """
    b, h, t, d = q.shape
    dp = _round_up(d + 1, 128)
    scale = jnp.asarray(d**-0.5, jnp.float32)
    pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
    qp = jnp.pad((q.astype(jnp.float32) * scale).astype(q.dtype), pad)
    qp = qp.reshape(b * h, t, dp)
    kp = jnp.pad(k, pad).reshape(b * h, t, dp)
    ones = jnp.ones(v.shape[:-1] + (1,), v.dtype)
    vp = jnp.pad(
        jnp.concatenate([v, ones], axis=-1), [(0, 0), (0, 0), (0, 0), (0, dp - d - 1)]
    )
    vp = vp.reshape(b * h, t, dp)
    return qp, kp, vp, dp


def _fast_flash(
    q, k, v, q_block: int, kv_block: int, interpret: bool, score_dtype=jnp.float32
):
    """Plain (non-causal, unmasked) flash attention with folded scale and
    MXU-side row sums; head dim padded to the 128-lane tile.

    NOT on the production dispatch path (flash_attention routes that case
    to the faster _bounded_flash): kept as the measured online-max baseline
    that scripts/bench_attn.py A/Bs new kernel ideas against, same policy
    as flash_attention_packed below."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    qp, kp, vp, dp = _prep_fast_inputs(q, k, v)

    q_spec = pl.BlockSpec(
        (1, q_block, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec((1, t, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _fast_kernel, kv_block=kv_block, sum_lane=d, score_dtype=score_dtype
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t, dp), q.dtype),
        grid=(b * h, t // q_block),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dp,
            bytes_accessed=4 * b * h * t * dp * 2,
            transcendentals=b * h * t * t,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, t, dp)[..., :d]


def _bounded_kernel(
    kmax_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    kv_block: int,
    sum_lane: int,
):
    """Shifted-softmax fast path: exp(s - C) with C an a-priori upper bound.

    softmax is shift-invariant, so any per-row constant C_i >= max_j s_ij
    yields the exact same output as the max-shifted form; Cauchy-Schwarz
    gives one for free: s_ij = q_i . k_j <= |q_i| * max_j |k_j|.  Using it
    instead of the online running max removes a full read pass over the
    score block (the binding VMEM-bandwidth resource, BENCH_NOTES.md) and
    the serial acc-rescale dependency between kv iterations.

    The raw Cauchy-Schwarz bound can overshoot the true max by an
    arbitrary margin on pathological norm/correlation structure (e.g.
    orthogonal large-norm q/k), which would underflow every exp and
    silently zero rows.  The shift is therefore clamped per row to
    ``lb_i + 55`` where lb_i = q_i . mean(first 512 keys) — the mean score
    over any key subset lower-bounds the row max, so l >= exp(-55) by
    construction and underflow is impossible.  lb costs one 512-row pass
    over the VMEM-resident K plus an MXU matvec (~1% measured).
    The clamp keeps the exact-softmax property (any shift does); the only
    remaining theoretical failure is exp overflow at a >143-nat per-row
    score spread, which surfaces loudly as inf/nan, never as silent
    zeros.  (Measured shift gap on standard-normal q/k: 4-11 nats.)
    """
    q = q_ref[0]
    qb, dp = q.shape
    t = k_ref.shape[1]
    # per-row shift: min(|q_i| * max_j |k_j|, lb_i + 55); scale is already
    # folded into q; the per-head key-norm max rides in via scalar
    # prefetch (computing it here would re-stream K per q-block program)
    kmax = kmax_ref[pl_program_id(0)]
    n_sub = min(t, 512)
    k_sub_mean = k_ref[0, :n_sub, :].astype(jnp.float32).mean(axis=0)
    lb = jax.lax.dot_general(
        q.astype(jnp.float32),
        k_sub_mean.reshape(dp, 1),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (qb, 1)
    qf = q.astype(jnp.float32)
    qn = jnp.sqrt((qf * qf).sum(axis=-1, keepdims=True))  # (qb, 1)
    c = jnp.minimum(qn * kmax, lb + 55.0)

    def body(i, acc):
        k = k_ref[0, pl_ds(i * kv_block, kv_block), :]
        v = v_ref[0, pl_ds(i * kv_block, kv_block), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - c)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + pv

    acc = jax.lax.fori_loop(
        0, t // kv_block, body, jnp.zeros((qb, dp), jnp.float32)
    )
    l = acc[:, sum_lane : sum_lane + 1]
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _bounded_flash(q, k, v, q_block: int, kv_block: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    qp, kp, vp, dp = _prep_fast_inputs(q, k, v)
    # per-(b,h) key-norm max, one HLO pass over K (cheap vs the kernel)
    kf = kp.astype(jnp.float32)
    kmax = jnp.sqrt((kf * kf).sum(axis=-1).max(axis=-1))  # (b*h,)

    q_spec = pl.BlockSpec(
        (1, q_block, dp), lambda i, j, _km: (i, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, t, dp), lambda i, j, _km: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # kmax rides in SMEM
        grid=(b * h, t // q_block),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )
    # score block (q_block x kv_block fp32) + K/V/q/out + headroom; the
    # default scoped-vmem limit (16 MB) rejects kv_block >= 8192
    vmem_bytes = min(
        100 * 1024 * 1024,
        q_block * kv_block * 4 * 2 + 4 * t * dp * 4 + 8 * 1024 * 1024,
    )
    out = pl.pallas_call(
        functools.partial(_bounded_kernel, kv_block=kv_block, sum_lane=d),
        out_shape=jax.ShapeDtypeStruct((b * h, t, dp), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_bytes,
            # heads are independent; q-blocks revisit the same KV block
            # (measured ~2% faster than the default scheduling)
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dp,
            bytes_accessed=4 * b * h * t * dp * 2,
            transcendentals=b * h * t * t,
        ),
    )(kmax, qp, kp, vp)
    return out.reshape(b, h, t, dp)[..., :d]


@functools.partial(
    jax.jit,
    static_argnames=("q_block", "kv_block", "causal", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_block: int = 512,
    kv_block: int = 1024,
    causal: bool = False,
    lengths: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """(B, H, T, D) attention without materialized scores.

    ``causal`` restricts to the lower triangle (decoder backbones);
    ``lengths`` (B,) int32 masks right-padded keys per batch row.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    scale = d**-0.5
    dp = _round_up(d, 128)
    if t % q_block or t % kv_block:
        raise ValueError(
            f"flash_attention requires T divisible by blocks, got {t} "
            f"({q_block}/{kv_block}); pick block sizes dividing T"
        )
    if not causal and lengths is None and d % 128:
        # fast path (frozen-backbone inference): shifted-softmax bounded
        # kernel, scale folded into q, row sums riding the PV matmul
        # through a ones-lane in the head-dim padding (hence d % 128 != 0:
        # a full head dim would force an extra 128-lane tile).  Big blocks
        # measure fastest — the kernel is VMEM-bandwidth-bound on the
        # score block, and fewer iterations amortize fixed overhead
        # (21.5 vs 23.1 ms at ViT-G shapes, scripts/bench_attn.py).
        # Auto-tuning only kicks in at the DEFAULT block args; explicit
        # values are honored so callers can bound the VMEM footprint.
        qb, kvb = q_block, kv_block
        if (q_block, kv_block) == (512, 1024):
            qb = 1024 if t % 1024 == 0 and t >= 1024 else q_block
            while (
                kvb * 2 <= t
                and t % (kvb * 2) == 0
                and qb * kvb * 2 * 4 <= 32 * 1024 * 1024
            ):
                kvb *= 2
        return _bounded_flash(q, k, v, qb, kvb, interpret)
    pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
    qp = jnp.pad(q, pad).reshape(b * h, t, dp)
    kp = jnp.pad(k, pad).reshape(b * h, t, dp)
    vp = jnp.pad(v, pad).reshape(b * h, t, dp)
    masked = lengths is not None
    if lengths is None:
        lens = jnp.full((b * h,), t, jnp.int32)
    else:
        lens = jnp.repeat(lengths.reshape(b).astype(jnp.int32), h, axis=0)

    # index maps receive the scalar-prefetch ref as a trailing arg
    q_spec = pl.BlockSpec(
        (1, q_block, dp), lambda i, j, _lens: (i, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, t, dp), lambda i, j, _lens: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lens rides in SMEM, whole, every program
        grid=(b * h, t // q_block),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            kv_block=kv_block,
            scale=scale,
            causal=causal,
            masked=masked,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, t, dp), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dp // (2 if causal else 1),
            bytes_accessed=(3 * b * h * t * dp + b * h * t * dp) * 2,
            transcendentals=b * h * t * t,
        ),
    )(lens, qp, kp, vp)
    return out.reshape(b, h, t, dp)[..., :d]


def _flash_kernel_packed(
    q_ref, k_ref, v_ref, o_ref, *, kv_block: int, scale: float
):
    """Two heads per program, packed block-diagonally into the 128 lanes.

    With head_dim 64 the MXU runs at half depth/width; packing head pair
    (a, b) as qhat = [qa | qb] and khat/vhat block-diagonal recovers full
    128-wide matmuls at identical FLOP count.  Non-causal, no mask (the
    video backbone's fixed windows).

    Ref shapes: q/o (1, 2, qb, d); k/v (1, 2, T, d).
    """
    d = q_ref.shape[-1]  # 64
    qb = q_ref.shape[2]
    t = k_ref.shape[2]
    n_kv = t // kv_block
    qhat = jnp.concatenate([q_ref[0, 0], q_ref[0, 1]], axis=-1)  # (qb, 128)

    def body(i, carry):
        acc, m, l = carry  # acc (qb, 2d); m, l (qb, 2)
        # block-diagonal K/V tiles built in-loop (small transients; a big
        # persistent scratch would blow the VMEM budget)
        zero = jnp.zeros((kv_block, d), k_ref.dtype)
        ka = k_ref[0, 0, pl_ds(i * kv_block, kv_block), :]
        kb = k_ref[0, 1, pl_ds(i * kv_block, kv_block), :]
        va = v_ref[0, 0, pl_ds(i * kv_block, kv_block), :]
        vb = v_ref[0, 1, pl_ds(i * kv_block, kv_block), :]
        k2 = jnp.concatenate(
            [
                jnp.concatenate([ka, zero], axis=-1),
                jnp.concatenate([zero, kb], axis=-1),
            ],
            axis=0,
        )  # (2kvb, 2d) block-diag
        v2 = jnp.concatenate(
            [
                jnp.concatenate([va, zero], axis=-1),
                jnp.concatenate([zero, vb], axis=-1),
            ],
            axis=0,
        )
        s = jax.lax.dot_general(
            qhat, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale  # (qb, 2kvb): [:, :kvb] head a, [:, kvb:] head b
        sa = s[:, :kv_block]
        sb = s[:, kv_block:]
        m_blk = jnp.stack([sa.max(axis=-1), sb.max(axis=-1)], axis=-1)
        m_new = jnp.maximum(m, m_blk)
        pa = jnp.exp(sa - m_new[:, :1])
        pb = jnp.exp(sb - m_new[:, 1:])
        alpha = jnp.exp(m - m_new)  # (qb, 2)
        l_new = l * alpha + jnp.stack([pa.sum(axis=-1), pb.sum(axis=-1)], axis=-1)
        p2 = jnp.concatenate([pa, pb], axis=-1).astype(v2.dtype)
        pv = jax.lax.dot_general(
            p2, v2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (qb, 2d) = [out_a | out_b]
        alpha_wide = jnp.concatenate(
            [jnp.repeat(alpha[:, :1], d, axis=-1), jnp.repeat(alpha[:, 1:], d, axis=-1)],
            axis=-1,
        )
        acc_new = acc * alpha_wide + pv
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((qb, 2 * d), jnp.float32)
    m0 = jnp.full((qb, 2), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((qb, 2), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_kv, body, (acc0, m0, l0))
    l_wide = jnp.concatenate(
        [jnp.repeat(l[:, :1], d, axis=-1), jnp.repeat(l[:, 1:], d, axis=-1)], axis=-1
    )
    out = acc / jnp.maximum(l_wide, 1e-30)
    o_ref[0, 0] = out[:, :d].astype(o_ref.dtype)
    o_ref[0, 1] = out[:, d:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block", "kv_block", "interpret"))
def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_block: int = 512,
    kv_block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal flash attention for head_dim 64 with head-pair packing."""
    b, h, t, d = q.shape
    assert d == 64 and h % 2 == 0, (h, d)
    if t % q_block or t % kv_block:
        raise ValueError(f"T={t} must divide blocks ({q_block}/{kv_block})")
    scale = d**-0.5
    n_pairs = b * h // 2
    qp = q.reshape(n_pairs, 2, t, d)
    kp = k.reshape(n_pairs, 2, t, d)
    vp = v.reshape(n_pairs, 2, t, d)

    # the remote AOT compiler crashes above ~16 heads per call; chunk the
    # pair axis through lax.map (one compiled kernel, executed per chunk)
    max_pairs = 8
    if n_pairs > max_pairs:
        chunk = max(c for c in range(1, max_pairs + 1) if n_pairs % c == 0)
        qc = qp.reshape(n_pairs // chunk, chunk, 2, t, d)
        kc = kp.reshape(n_pairs // chunk, chunk, 2, t, d)
        vc = vp.reshape(n_pairs // chunk, chunk, 2, t, d)
        out = jax.lax.map(
            lambda args: _packed_call(
                args[0], args[1], args[2], q_block, kv_block, scale, interpret
            ),
            (qc, kc, vc),
        )
        return out.reshape(b, h, t, d)
    return _packed_call(qp, kp, vp, q_block, kv_block, scale, interpret).reshape(
        b, h, t, d
    )


def _packed_call(qp, kp, vp, q_block, kv_block, scale, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pairs, _, t, d = qp.shape

    q_spec = pl.BlockSpec(
        (1, 2, q_block, d), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, 2, t, d), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_flash_kernel_packed, kv_block=kv_block, scale=scale),
        out_shape=jax.ShapeDtypeStruct((n_pairs, 2, t, d), qp.dtype),
        grid=(n_pairs, t // q_block),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pairs * t * t * d,
            bytes_accessed=8 * n_pairs * t * d * 2,
            transcendentals=2 * n_pairs * t * t,
        ),
    )(qp, kp, vp)
