"""Decoder attention parity vs torch.nn.MultiheadAttention."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.models import petr_decoder
from cmtcoop_tpu.models.petr_decoder import (MultiheadAttention,
                                             PETRTransformerDecoder)


def _iter_jaxprs(v):
    if hasattr(v, "jaxpr"):  # ClosedJaxpr
        yield v.jaxpr
    elif hasattr(v, "eqns"):  # Jaxpr
        yield v
    elif isinstance(v, (tuple, list)):
        for x in v:
            yield from _iter_jaxprs(x)


def _count_primitive(jaxpr, name):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == name:
            n += 1
        for val in eqn.params.values():
            for sub in _iter_jaxprs(val):
                n += _count_primitive(sub, name)
    return n


def _decoder_pallas_calls(train_mode, nq=900, nk=44000, backend_ok=True,
                          monkeypatch=None):
    if monkeypatch is not None:
        monkeypatch.setattr(petr_decoder, "packed_flash_backend_ok",
                            lambda: backend_ok)
    dec = PETRTransformerDecoder(num_layers=6, train_mode=train_mode)
    q = jax.ShapeDtypeStruct((1, nq, 256), jnp.float32)
    mem = jax.ShapeDtypeStruct((1, nk, 256), jnp.float32)
    params = jax.eval_shape(dec.init, jax.random.PRNGKey(0), q, mem, q, mem)
    kwargs = {"rngs": {"dropout": jax.random.PRNGKey(1)}} if train_mode else {}
    jaxpr = jax.make_jaxpr(
        lambda p, a, b, c, d: dec.apply(p, a, b, c, d, **kwargs))(
            params, q, mem, q, mem)
    return _count_primitive(jaxpr.jaxpr, "pallas_call")


def test_eval_cross_attention_takes_packed_flash_path(monkeypatch):
    """Regression guard: at bench shapes (900 q, ~44k KV tokens, eval) the
    dispatch predicates in MultiheadAttention/PETRTransformerDecoder must
    select the head-packed Pallas flash kernel for all 6 cross-attentions —
    a predicate tweak that silently drops to the generic path costs ~2x
    attention latency and no functional test would notice."""
    n = _decoder_pallas_calls(train_mode=False, monkeypatch=monkeypatch)
    assert n == 6, f"expected 6 packed-flash cross-attns, traced {n}"


def test_eval_packed_flash_path_pads_odd_kv(monkeypatch):
    """Non-multiple-of-block KV memories must be padded into the packed
    path (not silently routed to the generic one)."""
    n = _decoder_pallas_calls(train_mode=False, nk=4500,
                              monkeypatch=monkeypatch)
    assert n == 6, f"expected 6 packed-flash cross-attns, traced {n}"


def test_train_mode_avoids_packed_flash(monkeypatch):
    """Training (attn dropout on) must route through the XLA path: the
    packed kernel is dropout-free/eval-only."""
    n = _decoder_pallas_calls(train_mode=True, monkeypatch=monkeypatch)
    assert n == 0, f"train path traced {n} pallas_calls, expected 0"


def test_non_tpu_backend_avoids_packed_flash(monkeypatch):
    n = _decoder_pallas_calls(train_mode=False, backend_ok=False,
                              monkeypatch=monkeypatch)
    assert n == 0, f"non-tpu backend traced {n} pallas_calls, expected 0"


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


def test_mha_attn_dropout_semantics(rng):
    """attn_dropout reproduces torch nn.MultiheadAttention(dropout=p) train
    semantics: inverted dropout on the softmax weights, no renormalization.

    With a single key the softmax weight is exactly 1.0, so per (query,
    head) the post-dropout weight is either 1/(1-p) or 0 — the pre-out_proj
    value is v/(1-p) or 0. We check the drop rate and the kept-scale
    against the same statistics measured from torch in train mode.
    """
    torch = pytest.importorskip("torch")
    C, H, B, Nq, Nk, P = 8, 1, 1, 256, 1, 0.1
    q = rng.normal(size=(B, Nq, C)).astype(np.float32)
    k = rng.normal(size=(B, Nk, C)).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(C, H, dropout=P, batch_first=True)
    tmha.train()
    with torch.no_grad():
        eval_out = None
        tmha.eval()
        eval_out = tmha(torch.from_numpy(q), torch.from_numpy(k),
                        torch.from_numpy(k))[0].numpy()
        tmha.train()
        drops = []
        for _ in range(20):
            o = tmha(torch.from_numpy(q), torch.from_numpy(k),
                     torch.from_numpy(k))[0].numpy()
            # dropped rows equal the out_proj bias exactly
            bias_row = tmha.out_proj.bias.detach().numpy()
            drops.append(
                np.isclose(o, bias_row, atol=1e-6).all(-1).mean())
        torch_drop_rate = float(np.mean(drops))

    from cmtcoop_tpu.models.petr_decoder import MultiheadAttention
    mha = MultiheadAttention(C, H, impl="xla", attn_dropout=P,
                             train_mode=True)
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
    bias_row = tmha.out_proj.bias.detach().numpy()
    drops, kept_vals = [], []
    for i in range(20):
        out = np.asarray(mha.apply(
            params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k),
            rngs={"dropout": jax.random.PRNGKey(i)}))
        dropped = np.isclose(out, bias_row, atol=1e-6).all(-1)
        drops.append(dropped.mean())
        kept_vals.append(out[~dropped])
    ours_drop_rate = float(np.mean(drops))
    # both are Binomial(256*20, 0.1) means: 3 sigma ~ 0.0125
    assert abs(ours_drop_rate - P) < 0.02, ours_drop_rate
    assert abs(ours_drop_rate - torch_drop_rate) < 0.03
    # kept rows carry the 1/(1-p) inverted-dropout scale (no renorm):
    # compare against the eval output scaled by 1/(1-p) minus bias offset
    expect = (eval_out[0] - bias_row) / (1 - P) + bias_row
    got = np.concatenate(kept_vals)
    np.testing.assert_allclose(
        got, np.broadcast_to(expect[:1], got.shape), rtol=1e-4, atol=1e-5)


def test_mha_attn_dropout_off_at_eval(rng):
    """Eval mode ignores attn_dropout (deterministic, no rng needed)."""
    from cmtcoop_tpu.models.petr_decoder import MultiheadAttention
    C, H = 8, 2
    q = jnp.asarray(rng.normal(size=(1, 4, C)).astype(np.float32))
    mha_d = MultiheadAttention(C, H, impl="xla", attn_dropout=0.5,
                               train_mode=False)
    mha_0 = MultiheadAttention(C, H, impl="xla")
    params = mha_0.init(jax.random.PRNGKey(0), q, q, q)
    np.testing.assert_array_equal(
        np.asarray(mha_d.apply(params, q, q, q)),
        np.asarray(mha_0.apply(params, q, q, q)))
