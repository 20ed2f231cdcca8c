"""int8 matmul path for frozen-backbone inference (v5e native int8 MXU).

w8a8 symmetric quantization: weights per-output-channel, activations
per-row (dynamic) or calibrated static scalars.  History: dynamic
activation quantization measured NEUTRAL in-graph at ViT-G shapes (the
per-row max/round/cast passes ate the MXU gain, r2); static calibrated
scales + the fused Pallas kernels below (whole-MLP fusion, in-register
quantization, r3) made it a real win (video stage 8.68 -> 7.94 s per 24
windows).  Since r4 the `quantize` flag on the VJEPA2 feature is ON by
default (feature agreement r = 0.99987 vs exact bf16, ACCURACY.md) and
remains part of the cache identity — quantized features are their own
cache universe, `quantize=False` opts back into exact bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ._util import round_up as _round_up

__all__ = [
    "quantize_weight",
    "int8_matmul",
    "int8_matmul_fused",
    "int8_mlp_fused",
    "QuantDense",
    "calibrate_quant_scales",
]


def _static_scale(s, poison_if: jax.Array | None = None) -> jax.Array:
    """Validate a calibrated static activation scale.

    a_scale == 0 is the "uncalibrated" sentinel (see calibrate_quant_scales);
    running the static path with it would saturate every activation to
    +/-127 and emit plausible finite garbage.  Poison the scale with NaN
    instead so the output is loudly wrong (NaN propagates through the
    in-kernel dequant multiply).  ``poison_if`` lets coupled scales (the
    fused MLP's x/h pair) poison together."""
    s = jnp.asarray(s, jnp.float32)
    bad = s <= 0 if poison_if is None else poison_if
    return jnp.where(bad, jnp.nan, jnp.maximum(s, 1e-12))


def quantize_weight(w: np.ndarray | jax.Array) -> tuple[jax.Array, jax.Array]:
    """(K, N) float weights -> (int8 (K, N), fp32 per-column scale (N,)).

    NumPy inputs are quantized on the HOST (np.round is the same
    round-half-even): the HF converters call this once per dense per layer,
    and eager device dispatch costs ~0.4 s per primitive on the
    remotely-attached chip (CLAUDE.md) — >1000 round trips for ViT-G."""
    if isinstance(w, np.ndarray):
        w32 = np.asarray(w, np.float32)
        scale = np.maximum(np.abs(w32).max(axis=-2) / 127.0, 1e-12)
        w_q = np.clip(np.round(w32 / scale[..., None, :]), -127, 127).astype(np.int8)
        return jnp.asarray(w_q), jnp.asarray(scale.astype(np.float32))
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def int8_matmul(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array | None = None,
) -> jax.Array:
    """x (..., K) float @ int8 (K, N); accumulates int32 on the MXU.

    ``x_scale=None``: dynamic per-row activation scales (an extra
    memory-bound max pass over x — measured to eat most of the int8 MXU
    gain at ViT-G shapes).  ``x_scale`` scalar: static, calibrated offline
    for frozen backbones; the quantize cast fuses into the producer and
    the matmul chain runs at 1.44x the bf16 rate (scripts/bench_int8.py:
    191 vs 133 TF/s equivalent).
    """
    lead = x.shape[:-1]
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    if x_scale is None:
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
    else:
        sx = _static_scale(x_scale)
    x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * sx * w_scale[None]
    return out.reshape(lead + (w_q.shape[-1],))


def _largest_tile_divisor(n: int, cap: int) -> int:
    """Largest multiple-of-128 divisor of ``n`` that is <= cap (0 if none)."""
    best = 0
    for d in range(128, min(n, cap) + 1, 128):
        if n % d == 0:
            best = d
    return best


def _fused_w8a8_kernel(sx_ref, x_ref, w_ref, wsc_ref, bias_ref, out_ref, acc_ref):
    """One (bm, bn) output tile: quantize the bf16 activation block with the
    static scale in-register, int8 MXU matmul into an int32 accumulator,
    dequantize + bias on the way out.  Nothing int8/int32 ever reaches HBM,
    which is what made the XLA-level w8a8 path measure neutral
    (BENCH_NOTES.md round 2: quant/dequant passes don't fuse under the
    layer scan)."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # true division, not reciprocal-multiply: matches int8_matmul's
    # quantization bit-for-bit (reciprocal flips ~1e-3 of boundary rounds)
    xq = jnp.clip(
        jnp.round(x_ref[:].astype(jnp.float32) / sx_ref[0]), -127.0, 127.0
    ).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        scale = sx_ref[0] * wsc_ref[0, :]
        out = acc_ref[:].astype(jnp.float32) * scale[None, :] + bias_ref[0, :][None, :]
        out_ref[:] = out.astype(out_ref.dtype)


def int8_matmul_fused(
    x: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    x_scale: jax.Array,
    bias: jax.Array | None = None,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused w8a8 matmul: bf16 x (..., K) @ int8 w (K, N) -> out_dtype.

    ``x_scale`` must be a calibrated static scalar (calibrate_quant_scales);
    the kernel quantizes activations in-register, so unlike ``int8_matmul``
    there is no HBM round trip for the int8 activations or the int32
    accumulator.  Matches the unfused path bit-for-bit (same round/clip,
    same int32 accumulation, fp32 dequant)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = x.shape[:-1]
    kdim = x.shape[-1]
    n = w_q.shape[-1]
    if kdim % 128 or n % 128:
        raise ValueError(
            f"int8_matmul_fused needs 128-aligned dims, got K={kdim}, N={n}"
        )
    xf = x.reshape(-1, kdim)
    m = xf.shape[0]

    # K and N are 128-aligned (validated above), so 128 itself always
    # divides them: _largest_tile_divisor can never return 0 here, and
    # bn/bk divide n/kdim exactly — only the row dim ever needs padding
    bn = n if n <= 2048 else _largest_tile_divisor(n, 2048)
    bk = kdim if kdim <= 2048 else _largest_tile_divisor(kdim, 2048)
    assert bn and kdim % bk == 0 and n % bn == 0, (kdim, n, bk, bn)

    mp = _round_up(m, bm)
    if mp != m:
        xf = jnp.pad(xf, ((0, mp - m), (0, 0)))
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    sx = _static_scale(x_scale).reshape(1)
    grid = (mp // bm, n // bn, kdim // bk)
    out = pl.pallas_call(
        _fused_w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sx,
        xf,
        w_q,
        w_scale.astype(jnp.float32).reshape(1, n),
        bias.astype(jnp.float32).reshape(1, n),
    )
    return out[:m].reshape(lead + (n,))


def _gelu_erf_approx(x):
    """Exact-form gelu with an in-kernel erf: Mosaic has no erf/erfc
    lowering, so we use Abramowitz–Stegun 7.1.26 (max |err| 1.5e-7 —
    ~5 orders below the int8 quantization noise floor)."""
    import jax.numpy as jnp

    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.sign(z) * erf_abs
    return 0.5 * x * (1.0 + erf)


def _fused_mlp_kernel(
    sc_ref, x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, out_ref,
    fchunk: int,
):
    """Whole transformer MLP (fc1 -> gelu -> fc2) on one (bm, K) row tile.

    Both int8 weight matrices stay VMEM-resident across the M grid; the
    (bm, F) hidden activations live only in registers/VMEM — dequant, gelu
    and requant happen in-flight per F chunk, so the HBM traffic is exactly
    x in + out out.  This is what the XLA-level int8 path could never do:
    its gelu pass alone costs ~1 ms/layer of HBM bandwidth at ViT-G shapes."""
    import jax.numpy as jnp

    sx = sc_ref[0]
    sh = sc_ref[1]
    xq = jnp.clip(
        jnp.round(x_ref[:].astype(jnp.float32) / sx), -127.0, 127.0
    ).astype(jnp.int8)
    f = w1_ref.shape[1]
    acc2 = None
    for c in range(f // fchunk):
        sl = slice(c * fchunk, (c + 1) * fchunk)
        acc = jax.lax.dot_general(
            xq, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * (sx * s1_ref[0, sl])[None, :]
        h = h + b1_ref[0, sl][None, :]
        h = _gelu_erf_approx(h)
        hq = jnp.clip(jnp.round(h / sh), -127.0, 127.0).astype(jnp.int8)
        part = jax.lax.dot_general(
            hq, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc2 = part if acc2 is None else acc2 + part
    out = acc2.astype(jnp.float32) * (sh * s2_ref[0, :])[None, :]
    out = out + b2_ref[0, :][None, :]
    out_ref[:] = out.astype(out_ref.dtype)


def int8_mlp_fused(
    x: jax.Array,
    w1_q: jax.Array,
    w1_scale: jax.Array,
    b1: jax.Array,
    w2_q: jax.Array,
    w2_scale: jax.Array,
    b2: jax.Array,
    x_scale: jax.Array,
    h_scale: jax.Array,
    # bm 256 measured fastest at ViT-G shapes (179 vs 161 TF/s at 512 —
    # smaller tiles pipeline the VPU quant/gelu work against the MXU)
    bm: int = 256,
    fchunk: int = 2048,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused w8a8 MLP: gelu(x @ w1 + b1) @ w2 + b2, all quant in-kernel.

    ``x_scale``/``h_scale`` are calibrated static activation scales (input
    and post-gelu hidden respectively).  Requires F % fchunk == 0 after
    internal fchunk shrink; K and F must be multiples of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lead = x.shape[:-1]
    kdim = x.shape[-1]
    f = w1_q.shape[-1]
    if kdim % 128 or f % 128:
        raise ValueError(
            f"int8_mlp_fused needs 128-aligned dims, got K={kdim}, F={f}"
        )
    while f % fchunk or fchunk > f:
        fchunk //= 2
    xf = x.reshape(-1, kdim)
    m = xf.shape[0]
    mp = _round_up(m, bm)
    if mp != m:
        xf = jnp.pad(xf, ((0, mp - m), (0, 0)))

    # coupled poisoning: either scale uncalibrated -> both NaN, so the
    # output is NaN even though int8 casts in between would launder one
    bad = (jnp.asarray(x_scale, jnp.float32) <= 0) | (
        jnp.asarray(h_scale, jnp.float32) <= 0
    )
    sc = jnp.stack(
        [
            _static_scale(x_scale, poison_if=bad),
            _static_scale(h_scale, poison_if=bad),
        ]
    )
    whole = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_fused_mlp_kernel, fchunk=fchunk),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, kdim), lambda i: (i, 0)),
            whole(kdim, f),
            whole(1, f),
            whole(1, f),
            whole(f, kdim),
            whole(1, kdim),
            whole(1, kdim),
        ],
        out_specs=pl.BlockSpec((bm, kdim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, kdim), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sc,
        xf,
        w1_q,
        w1_scale.astype(jnp.float32).reshape(1, f),
        b1.astype(jnp.float32).reshape(1, f),
        w2_q,
        w2_scale.astype(jnp.float32).reshape(1, kdim),
        b2.astype(jnp.float32).reshape(1, kdim),
    )
    return out[:m].reshape(lead + (kdim,))


class QuantDense:
    """Functional int8 dense over pre-quantized params.

    Not a flax module: frozen backbones pass params explicitly, so the
    quantized kernel/scale/bias ride the same param pytree (converted once
    by ``quantize_params``)."""

    @staticmethod
    def apply(params: dict, x: jax.Array, out_dtype=jnp.bfloat16) -> jax.Array:
        # honor a calibrated static activation scale when the param tree
        # carries one (calibrate_quant_scales) — the dynamic per-row path
        # is measured to erase most of the int8 gain
        y = int8_matmul(
            x, params["kernel_q"], params["scale"], x_scale=params.get("a_scale")
        )
        if "bias" in params:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(out_dtype)


_DENSE_NAMES = ("query", "key", "value", "proj", "fc1", "fc2")


def quantize_tree(params: dict, names: tuple[str, ...] = _DENSE_NAMES) -> dict:
    """Quantize every named dense sub-dict of a float param pytree (the
    conversion path for an already-loaded float backbone)."""

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and k in names and "kernel" in v:
                out[k] = quantize_dense_params(v)
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


def quantize_dense_params(dense_params: dict) -> dict:
    """{'kernel','bias'?} float tree -> {'kernel_q','scale','bias'?}.

    Works on stacked (L, K, N) scan params too (per-layer scales).
    NumPy kernels stay on the host end to end (see quantize_weight)."""
    kernel = dense_params["kernel"]
    if isinstance(kernel, np.ndarray):
        kernel = np.asarray(kernel, np.float32)
        # host path: per-column max broadcasts over any leading axes, so
        # stacked (L, K, N) quantizes per layer with no vmap/device work
        w_q, scale = quantize_weight(kernel)
        a_scale = jnp.zeros(kernel.shape[:-2], jnp.float32)
    else:
        kernel = jnp.asarray(kernel, jnp.float32)
        if kernel.ndim == 3:  # (L, K, N): quantize each layer independently
            w_q, scale = jax.vmap(quantize_weight)(kernel)
            a_scale = jnp.zeros((kernel.shape[0],), jnp.float32)
        else:
            w_q, scale = quantize_weight(kernel)
            a_scale = jnp.zeros((), jnp.float32)
    # 0 = uncalibrated; static-scale mode requires calibrate_quant_scales
    out = {"kernel_q": w_q, "scale": scale, "a_scale": a_scale}
    if "bias" in dense_params:
        out["bias"] = jnp.asarray(dense_params["bias"], jnp.float32)
    return out


def calibrate_quant_scales(apply_fn, params: dict, *inputs, margin: float = 1.0) -> dict:
    """Set static activation scales from one observed forward pass.

    Runs ``apply_fn({"params": params}, *inputs, mutable=["quant_stats"])``
    — every ``_QDense`` sows its input absmax into ``quant_stats`` (max-
    reduced over calls; stacked (L,) under nn.scan) — then returns params
    with each ``a_scale`` set to ``absmax * margin / 127``.  Frozen
    backbones have stationary activation statistics, so one representative
    batch suffices; pass ``margin > 1`` for clip headroom on unseen data.
    """
    mutated = jax.jit(
        lambda p, *xs: apply_fn({"params": p}, *xs, mutable=["quant_stats"])[1]
    )(params, *inputs)
    stats = mutated.get("quant_stats", {})

    def walk(p_node, s_node):
        out = {}
        for key, val in p_node.items():
            if isinstance(val, dict):
                out[key] = walk(val, s_node.get(key, {}) if isinstance(s_node, dict) else {})
            elif key == "a_scale":
                absmax = s_node.get("absmax") if isinstance(s_node, dict) else None
                if absmax is None:
                    out[key] = val
                else:
                    if isinstance(absmax, (tuple, list)):
                        absmax = absmax[0]
                    out[key] = jnp.maximum(
                        jnp.asarray(absmax, jnp.float32) * margin / 127.0, 1e-12
                    )
            else:
                out[key] = val
        return out

    return walk(params, stats)
