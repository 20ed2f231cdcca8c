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


class RefAttention(torch.nn.Module):
    def __init__(self, dim, heads, dim_head, rot_dim):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head, self.rot_dim = heads, dim_head, rot_dim
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
        freqs = ref_rotary_freqs(t, self.rot_dim)
        q, k = ref_apply_rotary(q, freqs), ref_apply_rotary(k, freqs)
        dots = torch.einsum("bhqd,bhkd->bhqk", q, k) * dh**-0.5
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
    Encoder(rotary_pos_emb=True, use_scalenorm=True, scale_residual=True)."""

    def __init__(self, dim, depth, heads, mult=4):
        super().__init__()
        dh = dim // heads
        self.rot_dim = min(max(dh // 2, 32), dh)
        self.layers = torch.nn.ModuleList()
        for _ in range(depth):
            self.layers.append(
                torch.nn.ModuleDict(
                    dict(
                        attn_norm=RefScaleNorm(dim),
                        attn=RefAttention(dim, heads, dh, self.rot_dim),
                        ff_norm=RefScaleNorm(dim),
                        ff=RefFF(dim, mult),
                    )
                )
            )
            self.layers[-1].res_a = torch.nn.Parameter(torch.ones(dim))
            self.layers[-1].res_f = torch.nn.Parameter(torch.ones(dim))
        self.final_norm = RefScaleNorm(dim)

    def forward(self, x):
        for layer in self.layers:
            x = x * layer.res_a + layer.attn(layer.attn_norm(x))
            x = x * layer.res_f + layer.ff(layer.ff_norm(x))
        return self.final_norm(x)


def _halfsplit_to_interleaved_perm(dh, rot_dim):
    """Index map: ours[d] = theirs[perm[d]] for one head's feature axis."""
    perm = np.arange(dh)
    half = rot_dim // 2
    for j in range(half):
        perm[2 * j] = j
        perm[2 * j + 1] = j + half
    return perm


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
        layers.append(
            {
                "block": {
                    "attn_norm": {"g": jnp.asarray(layer["attn_norm"].g.item())},
                    "attn": {
                        "qkv": {"kernel": qkv},
                        "out": {"kernel": lin(layer["attn"].to_out.weight)},
                    },
                    "res_scale_attn": jnp.asarray(layer.res_a.detach().numpy()),
                    "ff_norm": {"g": jnp.asarray(layer["ff_norm"].g.item())},
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
                    "res_scale_ff": jnp.asarray(layer.res_f.detach().numpy()),
                }
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "blocks": stacked,
        "final_norm": {"g": jnp.asarray(ref.final_norm.g.item())},
    }


@pytest.mark.parametrize("dim,depth,heads,t", [(64, 2, 4, 12), (96, 3, 2, 31)])
def test_trunk_matches_torch_rederivation(dim, depth, heads, t):
    torch.manual_seed(depth)
    ref = RefEncoder(dim, depth, heads)
    # non-trivial residual gains: ones would mask res_scale wiring bugs
    with torch.no_grad():
        for layer in ref.layers:
            layer.res_a.mul_(torch.rand_like(layer.res_a) * 0.5 + 0.75)
            layer.res_f.mul_(torch.rand_like(layer.res_f) * 0.5 + 0.75)
            layer["attn_norm"].g.mul_(1.3)
    x = torch.randn(2, t, dim)
    with torch.no_grad():
        want = ref(x).numpy()

    model = TransformerEncoder(dim=dim, depth=depth, heads=heads, dim_head=dim // heads)
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
