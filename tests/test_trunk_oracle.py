"""Trunk architectural oracle: flax TransformerEncoder vs an independent
torch re-derivation of the x_transformers Encoder semantics the reference
builds (modeling_utils/models/transformer.py:43-61: rotary on, scalenorm
on, scale_residual on, pre-norm, final norm, exact-gelu FF, no-bias
attention projections).

x_transformers itself is not installed in this environment, so golden
activations cannot be recorded directly; ``scripts/make_trunk_fixture.py``
generates them in any environment that has the package, and
``test_trunk_matches_recorded_fixture`` consumes the file when present.
Until then this torch replica — written against the x_transformers source
semantics, including its half-split rotary pairing — is the strongest
available cross-check: weights are transferred torch->flax (with the
rotary basis permutation that maps the half-split convention onto our
interleaved one) and outputs must agree to fp32 tolerance.
"""

import math
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from algonauts2025_tpu.models.transformer import TransformerEncoder

torch.manual_seed(0)


# -- torch re-derivation of x_transformers Encoder ------------------------


class RefScaleNorm(torch.nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.scale = dim**-0.5
        self.eps = eps
        self.g = torch.nn.Parameter(torch.ones(1))

    def forward(self, x):
        norm = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / norm.clamp(min=self.eps) * self.g


def ref_rotary_freqs(t, rot_dim, base=10000.0):
    inv = 1.0 / (base ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    freqs = torch.einsum("i,j->ij", torch.arange(t).float(), inv)
    return torch.cat((freqs, freqs), dim=-1)  # (t, rot_dim), duplicated halves


def ref_rotate_half(x):
    x1, x2 = x.chunk(2, dim=-1)
    return torch.cat((-x2, x1), dim=-1)


def ref_apply_rotary(x, freqs):
    rot = freqs.shape[-1]
    xr, xp = x[..., :rot], x[..., rot:]
    xr = xr * freqs.cos() + ref_rotate_half(xr) * freqs.sin()
    return torch.cat((xr, xp), dim=-1)


class RefLayerNorm(torch.nn.Module):
    """x_transformers (>=1.27) LayerNorm: learned gamma, FIXED zero beta,
    torch F.layer_norm eps=1e-5."""

    def __init__(self, dim):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.ones(dim))
        self.register_buffer("beta", torch.zeros(dim))

    def forward(self, x):
        return torch.nn.functional.layer_norm(
            x, x.shape[-1:], self.gamma, self.beta
        )


class RefAttention(torch.nn.Module):
    def __init__(self, dim, heads, dim_head, rot_dim, causal=False):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.rot_dim = heads, dim_head, rot_dim
        self.causal = causal
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_k = torch.nn.Linear(dim, inner, bias=False)
        self.to_v = torch.nn.Linear(dim, inner, bias=False)
        self.to_out = torch.nn.Linear(inner, dim, bias=False)

    def forward(self, x):
        b, t, _ = x.shape
        h, dh = self.heads, self.dim_head

        def split(z):
            return z.view(b, t, h, dh).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        if self.rot_dim:
            freqs = ref_rotary_freqs(t, self.rot_dim)
            q, k = ref_apply_rotary(q, freqs), ref_apply_rotary(k, freqs)
        dots = torch.einsum("bhqd,bhkd->bhqk", q, k) * dh**-0.5
        if self.causal:
            ii = torch.arange(t)
            dots = dots.masked_fill(ii[None, :] > ii[:, None], -torch.inf)
        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhqk,bhkd->bhqd", attn, v)
        return self.to_out(out.transpose(1, 2).reshape(b, t, h * dh))


class RefFF(torch.nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.net = torch.nn.Sequential(
            torch.nn.Linear(dim, dim * mult),
            torch.nn.GELU(),  # exact erf form
            torch.nn.Linear(dim * mult, dim),
        )

    def forward(self, x):
        return self.net(x)


class RefEncoder(torch.nn.Module):
    """Pre-norm, per-dim scaled residuals, final norm — x_transformers
    Encoder/Decoder across the knobs the config surface exposes
    (reference modeling_utils/models/transformer.py:16-61): scalenorm vs
    layernorm, rotary on/off, scale_residual on/off, ff_mult, causal."""

    def __init__(self, dim, depth, heads, mult=4, rotary=True,
                 scalenorm=True, scale_residual=True, causal=False):
        super().__init__()
        dh = dim // heads
        self.rot_dim = min(max(dh // 2, 32), dh) if rotary else 0
        self.scale_residual = scale_residual
        norm = RefScaleNorm if scalenorm else RefLayerNorm
        self.layers = torch.nn.ModuleList()
        for _ in range(depth):
            self.layers.append(
                torch.nn.ModuleDict(
                    dict(
                        attn_norm=norm(dim),
                        attn=RefAttention(dim, heads, dh, self.rot_dim, causal),
                        ff_norm=norm(dim),
                        ff=RefFF(dim, mult),
                    )
                )
            )
            if scale_residual:
                self.layers[-1].res_a = torch.nn.Parameter(torch.ones(dim))
                self.layers[-1].res_f = torch.nn.Parameter(torch.ones(dim))
        self.final_norm = norm(dim)

    def forward(self, x):
        for layer in self.layers:
            res_a = layer.res_a if self.scale_residual else 1.0
            res_f = layer.res_f if self.scale_residual else 1.0
            x = x * res_a + layer.attn(layer.attn_norm(x))
            x = x * res_f + layer.ff(layer.ff_norm(x))
        return self.final_norm(x)


def _halfsplit_to_interleaved_perm(dh, rot_dim):
    """Index map: ours[d] = theirs[perm[d]] for one head's feature axis."""
    perm = np.arange(dh)
    half = rot_dim // 2
    for j in range(half):
        perm[2 * j] = j
        perm[2 * j + 1] = j + half
    return perm


def _norm_params(norm):
    if isinstance(norm, RefScaleNorm):
        return {"g": jnp.asarray(norm.g.item())}
    return {"scale": jnp.asarray(norm.gamma.detach().numpy())}


def _transfer(ref: RefEncoder, dim, depth, heads):
    """Torch replica params -> our scanned flax param tree."""
    dh = dim // heads
    perm = _halfsplit_to_interleaved_perm(dh, ref.rot_dim)

    def lin(w):  # torch Linear weight (out, in) -> flax kernel (in, out)
        return jnp.asarray(w.detach().numpy().T)

    def permute_heads(kernel):  # (dim, h*dh) -> permuted per head
        k = np.asarray(kernel).reshape(dim, heads, dh)
        return jnp.asarray(k[:, :, perm].reshape(dim, heads * dh))

    layers = []
    for layer in ref.layers:
        qkv = jnp.concatenate(
            [
                permute_heads(lin(layer["attn"].to_q.weight)),
                permute_heads(lin(layer["attn"].to_k.weight)),
                lin(layer["attn"].to_v.weight),
            ],
            axis=-1,
        )
        block = {
            "attn_norm": _norm_params(layer["attn_norm"]),
            "attn": {
                "qkv": {"kernel": qkv},
                "out": {"kernel": lin(layer["attn"].to_out.weight)},
            },
            "ff_norm": _norm_params(layer["ff_norm"]),
            "ff": {
                "Dense_0": {
                    "kernel": lin(layer["ff"].net[0].weight),
                    "bias": jnp.asarray(layer["ff"].net[0].bias.detach().numpy()),
                },
                "Dense_1": {
                    "kernel": lin(layer["ff"].net[2].weight),
                    "bias": jnp.asarray(layer["ff"].net[2].bias.detach().numpy()),
                },
            },
        }
        if ref.scale_residual:
            block["res_scale_attn"] = jnp.asarray(layer.res_a.detach().numpy())
            block["res_scale_ff"] = jnp.asarray(layer.res_f.detach().numpy())
        layers.append({"block": block})
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "blocks": stacked,
        "final_norm": _norm_params(ref.final_norm),
    }


# spans the deployed config surface (reference TransformerEncoderConfig
# knobs: ff_mult, use_scalenorm, rotary_pos_emb, scale_residual, causal —
# causal builds an x_transformers Decoder, transformer.py:58-61)
ORACLE_CONFIGS = [
    # dim, depth, heads, t, knobs
    (64, 2, 4, 12, {}),                          # defaults, shallow
    (96, 3, 2, 31, {}),                          # defaults, odd seq len
    (64, 2, 4, 17, {"mult": 2}),                 # ff_mult=2
    (64, 3, 4, 12, {"scale_residual": False}),   # plain residuals
    (64, 2, 4, 12, {"rotary": False}),           # no positional encoding
    (64, 2, 4, 19, {"scalenorm": False}),        # x_transformers LayerNorm
    (64, 2, 4, 13, {"causal": True}),            # Decoder (causal mask)
    (96, 2, 3, 12, {"scalenorm": False, "scale_residual": False, "mult": 3}),
    # flagship-shaped (r4 verdict #8): the deployed trunk is dim 3072 /
    # depth 8 / heads 8 / dim_head = dim//heads (reference
    # transformer.py:55 sets attn_dim_head = dim // heads) with the
    # default knobs.  Scaled to dim 256 (the reference's own minimum,
    # transformer.py:50) at the deployed depth and head count:
    (256, 8, 8, 48, {}),                         # deployed depth/heads/knobs
    # and the flagship's PARTIAL-rotary regime: dh 384 -> rot_dim 192
    # (=dh/2); dh 128 -> rot_dim 64 reproduces the same rot/dh ratio
    (256, 8, 2, 33, {}),                         # depth 8, dh 128, rot 0.5
]


@pytest.mark.parametrize("dim,depth,heads,t,knobs", ORACLE_CONFIGS)
def test_trunk_matches_torch_rederivation(dim, depth, heads, t, knobs):
    torch.manual_seed(depth + len(knobs))
    ref = RefEncoder(dim, depth, heads, **knobs)
    # non-trivial gains: ones/zeros would mask wiring bugs
    with torch.no_grad():
        for layer in ref.layers:
            if ref.scale_residual:
                layer.res_a.mul_(torch.rand_like(layer.res_a) * 0.5 + 0.75)
                layer.res_f.mul_(torch.rand_like(layer.res_f) * 0.5 + 0.75)
            if isinstance(layer["attn_norm"], RefScaleNorm):
                layer["attn_norm"].g.mul_(1.3)
            else:
                layer["attn_norm"].gamma.mul_(
                    torch.rand_like(layer["attn_norm"].gamma) * 0.5 + 0.75
                )
    x = torch.randn(2, t, dim)
    with torch.no_grad():
        want = ref(x).numpy()

    model = TransformerEncoder(
        dim=dim,
        depth=depth,
        heads=heads,
        dim_head=dim // heads,
        ff_mult=knobs.get("mult", 4),
        rotary_pos_emb=knobs.get("rotary", True),
        use_scalenorm=knobs.get("scalenorm", True),
        scale_residual=knobs.get("scale_residual", True),
        causal=knobs.get("causal", False),
    )
    params = _transfer(ref, dim, depth, heads)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


FIXTURE = Path(__file__).parent / "fixtures" / "trunk_xtransformers.npz"


def test_trunk_matches_recorded_fixture():
    """Golden activations recorded from REAL x_transformers by
    scripts/make_trunk_fixture.py (requires an env with the package)."""
    if not FIXTURE.exists():
        pytest.skip("no recorded x_transformers fixture in this environment")
    data = np.load(FIXTURE)
    model = TransformerEncoder(
        dim=int(data["dim"]),
        depth=int(data["depth"]),
        heads=int(data["heads"]),
        dim_head=int(data["dim"]) // int(data["heads"]),
    )
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(
            model.init(jax.random.PRNGKey(0), jnp.asarray(data["x"]))["params"]
        ),
        [jnp.asarray(data[f"p{i}"]) for i in range(int(data["n_params"]))],
    )
    got = np.asarray(model.apply({"params": params}, jnp.asarray(data["x"])))
    np.testing.assert_allclose(got, data["y"], atol=5e-5, rtol=1e-4)
