"""Record golden x_transformers Encoder activations for the trunk oracle.

Run in ANY environment that has x_transformers installed:

    python scripts/make_trunk_fixture.py

It builds the reference encoder config
(/root/reference/modeling_utils/modeling_utils/models/transformer.py:43-61
semantics: rotary, scalenorm, scale_residual, exact gelu) at a small size,
transfers its weights into our flax ``TransformerEncoder`` param layout
(including the half-split -> interleaved rotary basis permutation), and
writes input/weights/output to ``tests/fixtures/trunk_xtransformers.npz``.
``tests/test_trunk_oracle.py::test_trunk_matches_recorded_fixture`` then
asserts parity in CI.  This environment has no x_transformers (zero
egress), so the file must be generated elsewhere and checked in.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# dim >= 256 (the reference's own x-transformers guard) and dim_head 64:
# x_transformers builds a max(dim_head // 2, 32)-dim rotary, so heads
# narrower than 32 dims would rotate differently than any clamped replica
DIM, DEPTH, HEADS, T, B = 256, 2, 4, 12, 2


def main() -> None:
    import torch
    from x_transformers import Encoder

    import jax
    import jax.numpy as jnp

    from algonauts2025_tpu.models.transformer import TransformerEncoder
    from tests.test_trunk_oracle import _halfsplit_to_interleaved_perm

    torch.manual_seed(7)
    enc = Encoder(
        dim=DIM,
        depth=DEPTH,
        heads=HEADS,
        attn_dim_head=DIM // HEADS,
        rotary_pos_emb=True,
        use_scalenorm=True,
        scale_residual=True,
        attn_flash=False,
        attn_dropout=0.0,
        ff_dropout=0.0,
    ).eval()
    x = torch.randn(B, T, DIM)
    with torch.no_grad():
        y = enc(x).numpy()

    dh = DIM // HEADS
    rot_dim = enc.rotary_pos_emb.dim if hasattr(enc, "rotary_pos_emb") else max(dh // 2, 32)
    perm = _halfsplit_to_interleaved_perm(dh, min(rot_dim, dh))

    def lin(w):
        return np.asarray(w.detach().numpy().T)

    def permute_heads(kernel):
        k = np.asarray(kernel).reshape(DIM, HEADS, dh)
        return k[:, :, perm].reshape(DIM, HEADS * dh)

    layers = []
    # x_transformers stores [attn, ff] pairs in enc.layers: each entry is
    # (norms, block, residual)
    pairs = list(enc.layers)
    for i in range(DEPTH):
        (an, attn, ares) = pairs[2 * i]
        (fn, ff, fres) = pairs[2 * i + 1]
        layers.append(
            {
                "block": {
                    "attn_norm": {"g": np.asarray(an[0].g.detach().numpy()).reshape(())},
                    "attn": {
                        "qkv": {
                            "kernel": np.concatenate(
                                [
                                    permute_heads(lin(attn.to_q.weight)),
                                    permute_heads(lin(attn.to_k.weight)),
                                    lin(attn.to_v.weight),
                                ],
                                axis=-1,
                            )
                        },
                        "out": {"kernel": lin(attn.to_out.weight)},
                    },
                    "res_scale_attn": np.asarray(ares.residual_scale.detach().numpy()),
                    "ff_norm": {"g": np.asarray(fn[0].g.detach().numpy()).reshape(())},
                    "ff": {
                        "Dense_0": {
                            "kernel": lin(ff.ff[0][0].weight),
                            "bias": np.asarray(ff.ff[0][0].bias.detach().numpy()),
                        },
                        "Dense_1": {
                            "kernel": lin(ff.ff[-1].weight),
                            "bias": np.asarray(ff.ff[-1].bias.detach().numpy()),
                        },
                    },
                    "res_scale_ff": np.asarray(fres.residual_scale.detach().numpy()),
                }
            }
        )
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    params = {
        "blocks": stacked,
        "final_norm": {"g": np.asarray(enc.final_norm.g.detach().numpy()).reshape(())},
    }

    model = TransformerEncoder(dim=DIM, depth=DEPTH, heads=HEADS, dim_head=dh)
    got = np.asarray(model.apply({"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x.numpy())))
    err = np.abs(got - y).max()
    print("flax-vs-x_transformers max err:", err)
    assert err < 1e-4, (
        f"refusing to write a golden fixture with max err {err}: the weight "
        "transfer or a semantic divergence must be fixed first"
    )

    leaves, _ = jax.tree_util.tree_flatten(params)
    out = {
        "dim": DIM, "depth": DEPTH, "heads": HEADS,
        "x": x.numpy(), "y": y, "n_params": len(leaves),
    }
    for i, leaf in enumerate(leaves):
        out[f"p{i}"] = np.asarray(leaf)
    dest = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    dest.mkdir(exist_ok=True)
    np.savez(dest / "trunk_xtransformers.npz", **out)
    print("wrote", dest / "trunk_xtransformers.npz")


if __name__ == "__main__":
    main()
