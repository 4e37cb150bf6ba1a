"""Decoder attention parity vs torch.nn.MultiheadAttention."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.models.petr_decoder import MultiheadAttention


def test_mha_matches_torch(rng):
    torch = pytest.importorskip("torch")
    C, H, B, Nq, Nk = 32, 4, 2, 7, 11
    q = rng.normal(size=(B, Nq, C)).astype(np.float32)
    k = rng.normal(size=(B, Nk, C)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        oracle = tmha(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(k))[0].numpy()

    mha = MultiheadAttention(C, H, impl="xla")
    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k),
                      jnp.asarray(k))
    w_in = tmha.in_proj_weight.detach().numpy()
    b_in = tmha.in_proj_bias.detach().numpy()
    new = {
        "q_proj": {"kernel": w_in[:C].T, "bias": b_in[:C]},
        "k_proj": {"kernel": w_in[C:2 * C].T, "bias": b_in[C:2 * C]},
        "v_proj": {"kernel": w_in[2 * C:].T, "bias": b_in[2 * C:]},
        "out_proj": {
            "kernel": tmha.out_proj.weight.detach().numpy().T,
            "bias": tmha.out_proj.bias.detach().numpy()},
    }
    params = {"params": jax.tree.map(jnp.asarray, new)}
    out = mha.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)


def test_mha_additive_mask(rng):
    torch = pytest.importorskip("torch")
    C, H, B, N = 16, 2, 1, 6
    q = rng.normal(size=(B, N, C)).astype(np.float32)
    attn_mask = rng.uniform(size=(N, N)) > 0.5
    attn_mask[:, 0] = False  # keep at least one visible key

    tmha = torch.nn.MultiheadAttention(C, H, dropout=0.0, batch_first=True)
    tmha.eval()
    with torch.no_grad():
        oracle = tmha(torch.from_numpy(q), torch.from_numpy(q),
                      torch.from_numpy(q),
                      attn_mask=torch.from_numpy(attn_mask))[0].numpy()

    mha = MultiheadAttention(C, H, impl="xla")
    w_in = tmha.in_proj_weight.detach().numpy()
    b_in = tmha.in_proj_bias.detach().numpy()
    params = {"params": jax.tree.map(jnp.asarray, {
        "q_proj": {"kernel": w_in[:C].T, "bias": b_in[:C]},
        "k_proj": {"kernel": w_in[C:2 * C].T, "bias": b_in[C:2 * C]},
        "v_proj": {"kernel": w_in[2 * C:].T, "bias": b_in[2 * C:]},
        "out_proj": {
            "kernel": tmha.out_proj.weight.detach().numpy().T,
            "bias": tmha.out_proj.bias.detach().numpy()},
    })}
    bias = jnp.where(jnp.asarray(attn_mask), -1e9, 0.0)[None, None]
    out = mha.apply(params, jnp.asarray(q), jnp.asarray(q), jnp.asarray(q),
                    bias=bias)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)
