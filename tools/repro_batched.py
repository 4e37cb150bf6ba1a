import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from cmtcoop_tpu.ops import pillars as pu
from cmtcoop_tpu.ops.pillar_fused import fused_pillar_conv

rng = np.random.default_rng(0)
z, c, p = 8, 4, 256
occ_bev = rng.uniform(size=(32, 32)) < 0.35
ys, xs = np.nonzero(occ_bev)
n = min(len(ys), p)
coords = np.full((p, 2), -1, np.int32); coords[:n, 0], coords[:n, 1] = ys[:n], xs[:n]
mask = np.zeros((p,), bool); mask[:n] = True
grid = pu.PillarGrid(jnp.asarray(coords), jnp.asarray(mask), (32, 32), z)
nbr = pu.pillar_neighbor_map(grid)
occ = (rng.uniform(size=(p, z)) < 0.5) & mask[:, None]
feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
w = rng.normal(size=(2, 27, c, c)).astype(np.float32) * 0.3
rows = jnp.asarray(np.pad(feats.reshape(p, z*c), ((0,0),(0,128-z*c))))
st = lambda x: jnp.stack([x, x])
f = jax.jit(lambda r, nb, ww, oc: fused_pillar_conv(
    r, nb, ww, kz=3, z_stride=1, z_pad=1, subm=True, relu=True,
    packed_shape=(z, c), occ_out=oc, agents=2, interpret=False))
out = f(st(rows), st(nbr), jnp.asarray(w), st(jnp.asarray(occ)))
print("OK", out.shape, float(jnp.sum(out.astype(jnp.float32))))
