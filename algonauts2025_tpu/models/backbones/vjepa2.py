"""V-JEPA2 video ViT backbone (flax.linen) for frozen video features.

The reference runs HF ``facebook/vjepa2-vitg-fpc64-256`` in torch
(reference features/video.py:239-274).  TPU-native reimplementation of the
encoder: 3D tubelet patch embedding (tubelet 2 x patch 16), pre-LN ViT
blocks with the V-JEPA 3D rotary attention (frame/height/width thirds of
each head rotated independently, theta 10000, tiled cos/sin + interleaved
pair rotation — replicated exactly from the original convention), GELU MLP,
final LayerNorm.  Returns the (L+1, B, N, D) hidden-state stack (last entry
final-normed, HF parity).

The patch embedding is expressed as a reshape + single matmul (einsum) —
the tubelet conv has stride == kernel, so on TPU it is exactly a patchify
+ projection, which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VJEPA2Config", "VJEPA2Backbone", "params_from_hf", "VJEPA2_VITG"]


@dataclasses.dataclass(frozen=True)
class VJEPA2Config:
    crop_size: int = 256
    patch_size: int = 16
    tubelet_size: int = 2
    frames_per_clip: int = 64
    hidden_size: int = 1408
    num_layers: int = 40
    num_heads: int = 22
    mlp_ratio: float = 48 / 11
    layer_norm_eps: float = 1e-6
    dtype: tp.Any = jnp.bfloat16
    #: w8a8 int8 matmuls for qkv/proj/mlp (ops/quant.py fused kernels).
    #: This backbone-config default is False, but the VJEPA2 *feature*
    #: passes quantize=True since r4 (features/video.py — the production
    #: default, r=0.99987 vs exact bf16); quantized features live in
    #: their own cache universe either way
    quantize: bool = False
    #: with quantize: use calibrated static activation scales instead of
    #: dynamic per-row maxima (requires calibrate_quant_scales first)
    quant_static: bool = False
    #: sequence parallelism: when set, the module expects to run inside a
    #: ``shard_map`` with the TOKEN axis sharded over this mesh axis —
    #: attention runs as exact ring attention (parallel/sequence.py),
    #: rotary tables take the shard's global token offset, and token
    #: pooling becomes a pmean.  None (default) = single-device layout.
    sequence_parallel_axis: str | None = None


def _int8_init(key, shape, dtype=jnp.int8):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


class _QDense(nn.Module):
    """Dense over pre-quantized int8 weights + per-column scales.

    ``static_scale=True`` uses the calibrated per-matmul activation scale
    ``a_scale`` (set by ``calibrate_quant_scales``) instead of dynamic
    per-row maxima; on TPU that path runs as a fused Pallas kernel that
    quantizes in-register (no HBM-visible int8 activations).  Every call
    sows the input absmax into the ``quant_stats`` collection when it is
    mutable, which is how calibration observes activations.  Setup-style
    (explicit ``in_features``) so a parent block can reach the params for
    cross-matmul fusion (``int8_mlp_fused``).
    """

    in_features: int
    features: int
    use_bias: bool = True
    static_scale: bool = False

    def setup(self):
        self.kernel_q = self.param(
            "kernel_q", _int8_init, (self.in_features, self.features)
        )
        self.scale = self.param(
            "scale", nn.initializers.constant(0.01), (self.features,), jnp.float32
        )
        self.a_scale = self.param("a_scale", nn.initializers.zeros, (), jnp.float32)
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )

    def observe(self, x: jax.Array) -> None:
        """Sow the input absmax for calibrate_quant_scales."""
        if self.is_mutable_collection("quant_stats"):
            self.sow(
                "quant_stats",
                "absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.quant import int8_matmul, int8_matmul_fused

        self.observe(x)
        calibrated = self.static_scale and not self.is_mutable_collection(
            "quant_stats"
        )
        # the Pallas kernels need 128-aligned contraction/output dims
        # (MXU lane width); tiny test configs fall back to the XLA path
        aligned = self.in_features % 128 == 0 and self.features % 128 == 0
        if calibrated and aligned and jax.default_backend() == "tpu":
            return int8_matmul_fused(
                x,
                self.kernel_q,
                self.scale,
                self.a_scale,
                bias=self.bias if self.use_bias else None,
                out_dtype=x.dtype,
            )
        # during a calibration pass (mutable quant_stats) a_scale may still
        # be 0 — always quantize dynamically there so downstream layers see
        # sane activations while their absmax is being observed
        y = int8_matmul(
            x,
            self.kernel_q,
            self.scale,
            x_scale=self.a_scale if calibrated else None,
        )
        if self.use_bias:
            y = y + self.bias
        return y.astype(x.dtype)


def _dense_factory(cfg: "VJEPA2Config"):
    def dense(name: str, features: int | None = None, bias: bool = True, in_features: int | None = None):
        features = cfg.hidden_size if features is None else features
        if cfg.quantize:
            return _QDense(
                in_features or cfg.hidden_size,
                features,
                use_bias=bias,
                static_scale=cfg.quant_static,
                name=name,
            )
        return nn.Dense(
            features, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.dtype, name=name
        )

    return dense


VJEPA2_VITG = VJEPA2Config()


def _rope_tables(n: int, head_dim: int, crop_size: int, patch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Full-width (N, head_dim) cos/sin tables for the V-JEPA 3D rotary.

    The head dim splits into (frame, height, width) thirds rotated against
    their own position id, plus an identity tail (cos=1, sin=0).  Within a
    segment the cos/sin values are *tiled* (not interleaved) across lanes
    while rotation pairs are interleaved — faithful to the original repo's
    rotate_queries_or_keys.  Computed once per forward in NumPy; the scan
    body just applies two multiplies and a pair swap.
    """
    grid = crop_size // patch_size
    tokens_per_frame = grid * grid
    ids = np.arange(n)
    frame_ids = ids // tokens_per_frame
    rem = ids - frame_ids * tokens_per_frame
    height_ids = rem // grid
    width_ids = rem - height_ids * grid

    seg = int(2 * ((head_dim // 3) // 2))
    cos = np.ones((n, head_dim), np.float32)
    sin = np.zeros((n, head_dim), np.float32)
    for which, pos in enumerate((frame_ids, height_ids, width_ids)):
        omega = np.arange(seg // 2, dtype=np.float32) / (seg / 2.0)
        omega = 1.0 / 10000**omega
        freq = pos[:, None].astype(np.float32) * omega  # (N, seg/2)
        lo = which * seg
        cos[:, lo : lo + seg] = np.tile(np.cos(freq), (1, 2))
        sin[:, lo : lo + seg] = np.tile(np.sin(freq), (1, 2))
    return cos, sin


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, N, D) bf16; cos/sin: (N, D) fp32.  One fused rotation —
    the identity tail (cos=1, sin=0) makes the global expression exact."""
    x32 = x.astype(jnp.float32)
    pair = x32.reshape(x32.shape[:-1] + (x32.shape[-1] // 2, 2))
    rot = jnp.stack([-pair[..., 1], pair[..., 0]], axis=-1).reshape(x32.shape)
    return (x32 * cos + rot * sin).astype(x.dtype)


class VJEPA2Attention(nn.Module):
    cfg: VJEPA2Config

    @nn.compact
    def __call__(self, x: jax.Array, rope: tuple[jax.Array, jax.Array]) -> jax.Array:
        cfg = self.cfg
        b, n, _ = x.shape
        h = cfg.num_heads
        hd = cfg.hidden_size // h
        dense = _dense_factory(cfg)
        q = dense("query")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = dense("key")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = dense("value")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        cos, sin = rope
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        out = _attention(q, k, v, cfg.dtype, axis=cfg.sequence_parallel_axis)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        return dense("proj")(out)


def _pick_block(t: int, preferred: int) -> int:
    for b in (preferred, 512, 256, 128):
        if b <= t and t % b == 0:
            return b
    return 0


def _attention(
    q: jax.Array, k: jax.Array, v: jax.Array, dtype, axis: str | None = None
) -> jax.Array:
    """Blockwise flash attention on TPU (scores never touch HBM);
    XLA fallback elsewhere or for awkward sequence lengths.  With
    ``axis`` (sequence parallelism) the token axis is sharded over that
    mesh axis and the exact ring recipe rotates KV shards around it."""
    if axis is not None:
        from ...parallel.sequence import ring_attention_local

        return ring_attention_local(q, k, v, axis)
    t, hd = q.shape[-2], q.shape[-1]
    qb = _pick_block(t, 512)
    kvb = _pick_block(t, 1024)
    if jax.default_backend() == "tpu" and qb and kvb and t >= 1024:
        from ...ops.flash_attention import flash_attention

        return flash_attention(q, k, v, q_block=qb, kv_block=kvb)
    # v.dtype == cfg.dtype here, so the shared helper's probs cast matches
    del dtype, hd
    from ...ops.attention import dot_product_attention

    return dot_product_attention(q, k, v)


def _token_mean(x: jax.Array, axis: str | None) -> jax.Array:
    """fp32 mean over the token axis (axis 1 of (B, N, D)).  Under
    sequence parallelism the local mean is pmean'd over the mesh axis —
    shards hold equal token counts, so that IS the global mean."""
    m = x.astype(jnp.float32).mean(axis=1)
    if axis is not None:
        m = jax.lax.pmean(m, axis)
    return m


class VJEPA2Block(nn.Module):
    """Pre-LN ViT block; scan-compatible (carry=x)."""

    cfg: VJEPA2Config

    token_pool: bool = False

    @nn.compact
    def __call__(self, x, rope):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
        )
        x = x + VJEPA2Attention(cfg, name="attn")(ln("norm1")(x), rope)
        dense = _dense_factory(cfg)
        mlp_dim = int(cfg.hidden_size * cfg.mlp_ratio)
        fc1 = dense("fc1", mlp_dim)
        fc2 = dense("fc2", cfg.hidden_size, in_features=mlp_dim)
        h = ln("norm2")(x)
        fused_ok = (
            cfg.quantize
            and cfg.quant_static
            and jax.default_backend() == "tpu"
            and not self.is_mutable_collection("quant_stats")
            and cfg.hidden_size % 128 == 0
            and mlp_dim % 128 == 0
        )
        if fused_ok:
            # whole-MLP Pallas kernel: the (N, mlp_dim) hidden activations
            # and both quant passes never touch HBM (ops/quant.py)
            from ...ops.quant import int8_mlp_fused

            h = int8_mlp_fused(
                h,
                fc1.kernel_q,
                fc1.scale,
                fc1.bias,
                fc2.kernel_q,
                fc2.scale,
                fc2.bias,
                fc1.a_scale,
                fc2.a_scale,
                out_dtype=h.dtype,
            )
        else:
            h = fc1(h)
            h = nn.gelu(h, approximate=False)
            h = fc2(h)
        x = x + h
        if self.token_pool:
            # emit only the token mean: saves a (T, D) fp32 HBM write per
            # layer (the video feature pools over tokens anyway)
            return x, _token_mean(x, cfg.sequence_parallel_axis)
        return x, x.astype(jnp.float32)


class VJEPA2Backbone(nn.Module):
    """Frozen encoder; input (B, T, H, W, 3) normalized pixels.

    Blocks run under nn.scan with stacked (L, ...) params: one compiled
    block regardless of depth (ViT-G is 40 layers).
    """

    cfg: VJEPA2Config
    #: emit token-pooled (L+1, B, D) states instead of (L+1, B, N, D)
    token_pool: bool = False

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, t, hgt, wid, c = pixels.shape
        ts, ps = cfg.tubelet_size, cfg.patch_size
        # tubelet patchify: (B, T/ts, ts, H/ps, ps, W/ps, ps, C) -> tokens
        x = pixels.reshape(b, t // ts, ts, hgt // ps, ps, wid // ps, ps, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B, T', Hp, Wp, ts, ps, ps, C)
        x = x.reshape(b, (t // ts) * (hgt // ps) * (wid // ps), ts * ps * ps * c)
        kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (ts * ps * ps * c, cfg.hidden_size),
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (cfg.hidden_size,))
        x = (
            jnp.einsum(
                "bnd,dk->bnk",
                x.astype(cfg.dtype),
                kernel.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            )
            + bias
        ).astype(cfg.dtype)

        spa = cfg.sequence_parallel_axis
        if self.token_pool:
            head = _token_mean(x, spa)[None]
        else:
            head = x.astype(jnp.float32)[None]
        # rotary tables are layer-invariant: build once, broadcast into the
        # scan (the rotation itself is two multiplies + a pair swap)
        n_tokens = x.shape[1]
        if spa is None:
            cos_np, sin_np = _rope_tables(
                n_tokens, cfg.hidden_size // cfg.num_heads,
                cfg.crop_size, cfg.patch_size,
            )
            rope = (jnp.asarray(cos_np), jnp.asarray(sin_np))
        else:
            # under sequence parallelism x holds a contiguous token shard;
            # positions are global: build the full table (host NumPy, tiny)
            # and slice this shard's rows at its global offset
            n_global = n_tokens * jax.lax.psum(1, spa)
            cos_np, sin_np = _rope_tables(
                n_global, cfg.hidden_size // cfg.num_heads,
                cfg.crop_size, cfg.patch_size,
            )
            start = jax.lax.axis_index(spa) * n_tokens
            rope = tuple(
                jax.lax.dynamic_slice_in_dim(jnp.asarray(t), start, n_tokens)
                for t in (cos_np, sin_np)
            )
        ScannedBlock = nn.scan(
            VJEPA2Block,
            variable_axes={"params": 0, "quant_stats": 0},
            split_rngs={"params": True},
            in_axes=nn.broadcast,
            length=cfg.num_layers,
        )
        x, layer_states = ScannedBlock(cfg, token_pool=self.token_pool, name="layers")(x, rope)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm")(x)
        if self.token_pool:
            last = _token_mean(x, spa)
        else:
            last = x.astype(jnp.float32)
        full = jnp.concatenate([head, layer_states], axis=0)
        full = full.at[-1].set(last)
        return full


def params_from_hf(state_dict: tp.Mapping[str, tp.Any], cfg: VJEPA2Config) -> dict:
    """Convert an HF VJEPA2Model encoder state dict to this param pytree,
    stacking per-layer weights along a leading (num_layers,) axis."""

    def arr(name, transpose=False):
        w = state_dict[name]
        w = np.asarray(w.float() if hasattr(w, "float") else w, dtype=np.float32)
        if transpose:
            w = w.T
        return jnp.asarray(w)

    def arr_np(name, transpose=False):
        w = state_dict[name]
        w = np.asarray(w.float() if hasattr(w, "float") else w, dtype=np.float32)
        return w.T if transpose else w

    def linear(prefix):
        if cfg.quantize:
            from ...ops.quant import quantize_dense_params

            # NumPy inputs keep the whole int8 conversion host-side — the
            # jnp path costs one eager device round trip per primitive on
            # remotely-attached chips
            return quantize_dense_params(
                {
                    "kernel": arr_np(prefix + ".weight", transpose=True),
                    "bias": arr_np(prefix + ".bias"),
                }
            )
        return {
            "kernel": jnp.asarray(arr(prefix + ".weight", transpose=True), cfg.dtype),
            "bias": jnp.asarray(arr(prefix + ".bias"), cfg.dtype),
        }

    def layernorm(prefix):
        return {"scale": arr(prefix + ".weight"), "bias": arr(prefix + ".bias")}

    pref = "encoder."
    # conv3d weight (D, C, ts, ps, ps) -> flat (ts*ps*ps*C, D) matching our
    # patchify order (ts, ps, ps, C)
    conv_w = arr(pref + "embeddings.patch_embeddings.proj.weight")
    d = conv_w.shape[0]
    kernel = np.transpose(np.asarray(conv_w), (2, 3, 4, 1, 0)).reshape(-1, d)

    def layer_params(i: int) -> dict:
        p = pref + f"layer.{i}."
        return {
            "norm1": layernorm(p + "norm1"),
            "norm2": layernorm(p + "norm2"),
            "attn": {
                "query": linear(p + "attention.query"),
                "key": linear(p + "attention.key"),
                "value": linear(p + "attention.value"),
                "proj": linear(p + "attention.proj"),
            },
            "fc1": linear(p + "mlp.fc1"),
            "fc2": linear(p + "mlp.fc2"),
        }

    all_layers = [layer_params(i) for i in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *all_layers)
    return {
        "patch_kernel": jnp.asarray(kernel),
        "patch_bias": arr(pref + "embeddings.patch_embeddings.proj.bias"),
        "final_norm": layernorm(pref + "layernorm"),
        "layers": stacked,
    }
