"""int8-vs-bf16 feature agreement at full ViT-G scale (ACCURACY.md).

Runs the same random 64-frame window through the exact bf16 backbone
and the fused w8a8 static-scale path (calibrated, margin 1.5), then
reports global Pearson r, worst per-layer r, and worst per-token
cosine.  Run on the real chip: python scripts/quant_parity.py
"""
import sys; sys.path.insert(0, ".")
import algonauts2025_tpu
import dataclasses, numpy as np, jax, jax.numpy as jnp
from algonauts2025_tpu.models.backbones.vjepa2 import VJEPA2_VITG, VJEPA2Backbone
from algonauts2025_tpu.ops.quant import calibrate_quant_scales, quantize_tree

rng = np.random.default_rng(0)
cfg = VJEPA2_VITG
model = VJEPA2Backbone(cfg, token_pool=True)
px = jnp.asarray(rng.uniform(-1, 1, (1, 64, 256, 256, 3)).astype(np.float32)).astype(jnp.bfloat16)
params = jax.jit(lambda k: model.init(k, jnp.zeros((1, cfg.frames_per_clip, 256, 256, 3)))["params"])(jax.random.PRNGKey(0))
ref = np.asarray(jax.jit(lambda p, x: model.apply({"params": p}, x))(params, px))  # (L+1, B, D)

qcfg = dataclasses.replace(cfg, quantize=True, quant_static=False)
qmodel = VJEPA2Backbone(qcfg, token_pool=True)
qparams = quantize_tree(jax.device_get(params))
qparams = calibrate_quant_scales(qmodel.apply, qparams, px, margin=1.5)
scfg = dataclasses.replace(cfg, quantize=True, quant_static=True)
smodel = VJEPA2Backbone(scfg, token_pool=True)
out = np.asarray(jax.jit(lambda p, x: smodel.apply({"params": p}, x))(qparams, px))

a = ref.reshape(-1, ref.shape[-1]).astype(np.float64)
b = out.reshape(-1, out.shape[-1]).astype(np.float64)
# per-layer-token cosine + global pearson r on the pooled features
r = np.corrcoef(a.ravel(), b.ravel())[0, 1]
cos = (a*b).sum(-1)/(np.linalg.norm(a,axis=-1)*np.linalg.norm(b,axis=-1)+1e-12)
per_layer_r = [np.corrcoef(ref[l].ravel(), out[l].ravel())[0,1] for l in range(ref.shape[0])]
print(f"global r: {r:.6f}  min row cos: {cos.min():.6f}  min layer r: {min(per_layer_r):.6f}")
print("per-layer r (every 5):", [f"{per_layer_r[l]:.5f}" for l in range(0, len(per_layer_r), 5)])
