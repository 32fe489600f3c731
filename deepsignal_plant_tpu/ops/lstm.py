"""Bidirectional LSTM layers as XLA-friendly scans.

TPU-first design notes (vs. the reference's cuDNN nn.LSTM, models.py:137-157):

- The input-to-hidden projection for *all* timesteps and *both* directions is
  hoisted out of the recurrence into one large batched matmul
  (``einsum('btf,dfg->dbtg')``) that maps straight onto the MXU.
- The recurrence itself runs as a single ``lax.scan`` over time with the two
  directions stacked on a leading axis — the backward direction simply
  consumes a time-flipped copy of the projected inputs, so one scan drives
  both directions (half the scan dispatches, twice the matmul batch).
- Gate order inside the packed 4H axis is i, f, g, o — the torch layout —
  so converted reference checkpoints drop in without reindexing.
- Initial (h, c) are zeros: deterministic inference. The reference samples
  randn initial states on every forward (models.py:169-176), which makes its
  own outputs nondeterministic; parity is therefore defined at the level of
  per-site calls, not bitwise logits.

Parameters per layer (a dict pytree):
    w_ih: (2, input_size, 4H)   w_hh: (2, H, 4H)   b: (2, 4H)
with direction 0 = forward, 1 = backward, and b = torch's b_ih + b_hh.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


def init_bilstm_layer(key: jax.Array, input_size: int, hidden_size: int,
                      dtype=jnp.float32) -> Params:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch nn.LSTM's default
    so training dynamics are comparable to the reference."""
    k = 1.0 / math.sqrt(hidden_size)
    k_ih, k_hh, k_b = jax.random.split(key, 3)
    return {
        "w_ih": jax.random.uniform(k_ih, (2, input_size, 4 * hidden_size),
                                   dtype, -k, k),
        "w_hh": jax.random.uniform(k_hh, (2, hidden_size, 4 * hidden_size),
                                   dtype, -k, k),
        # two torch bias vectors folded into one (their sum is what the cell
        # sees); init as sum of two U(-k, k) draws
        "b": (jax.random.uniform(k_b, (2, 4 * hidden_size), dtype, -k, k)
              + jax.random.uniform(jax.random.fold_in(k_b, 1),
                                   (2, 4 * hidden_size), dtype, -k, k)),
    }


def _scan_bidir(xproj: jax.Array, w_hh: jax.Array, hidden_size: int,
                h0c0: tuple[jax.Array, jax.Array] | None,
                compute_dtype) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run the fused two-direction recurrence.

    xproj: (T, 2, B, 4H) — input projections, backward direction already
    time-flipped. Returns (ys (T, 2, B, H), h_T (2, B, H), c_T (2, B, H)).
    """
    T, _, B, _ = xproj.shape
    H = hidden_size
    # same mixed-precision contract as the pallas kernels: h (the matmul
    # operand) is stored in compute_dtype for the MXU-native dot rate,
    # but gate math and the cell state stay f32 — so the engine's
    # pallas->scan runtime fallback is semantically equivalent, not just
    # approximately so
    if h0c0 is None:
        h0 = jnp.zeros((2, B, H), compute_dtype)
        c0 = jnp.zeros((2, B, H), jnp.float32)
    else:
        h0, c0 = h0c0
        h0 = h0.astype(compute_dtype)
        c0 = c0.astype(jnp.float32)

    def step(carry, x_t):
        h, c = carry
        gates = x_t.astype(jnp.float32) + \
            jnp.einsum("dbh,dhg->dbg", h, w_hh,
                       preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
        c_new = f * c + i * g
        h_new = (o * jnp.tanh(c_new)).astype(compute_dtype)
        return (h_new, c_new), h_new

    (h_T, c_T), ys = lax.scan(step, (h0, c0), xproj)
    return ys, h_T, c_T.astype(compute_dtype)


def bilstm_layer(x: jax.Array, params: Params, hidden_size: int,
                 h0c0=None, compute_dtype=jnp.float32,
                 return_sequence: bool = True,
                 impl: str = "scan") -> jax.Array:
    """One bidirectional LSTM layer.

    x: (B, T, F). Returns (B, T, 2H) if return_sequence, else the final
    hidden states concatenated (B, 2H) — which equals the reference readout
    ``cat(out[:, -1, :H], out[:, 0, H:])`` (models.py:229-231).

    impl: "scan" (lax.scan) or "pallas" (fused TPU kernels; a custom VJP
    serves training). Both share one mixed-precision contract: storage
    and matmul operands in compute_dtype; gate math, cell states and
    gradient accumulation f32.
    """
    x = x.astype(compute_dtype)
    # (B,T,F) @ (2,F,4H) -> (2,B,T,4H): one MXU matmul for every step x dir
    # (w_ih cast too: a mixed bf16 x f32 dot would promote back to f32
    # and forfeit the MXU bf16 rate on the model's largest matmul)
    xproj = jnp.einsum("btf,dfg->dbtg", x,
                       params["w_ih"].astype(compute_dtype),
                       preferred_element_type=compute_dtype)
    xproj = xproj + params["b"][:, None, None, :].astype(compute_dtype)
    # flip time for the backward direction, then scan time-major
    xproj = jnp.stack([xproj[0], jnp.flip(xproj[1], axis=1)], axis=0)
    xproj = jnp.moveaxis(xproj, 2, 0)  # (T, 2, B, 4H)

    if impl == "pallas":
        if h0c0 is not None:
            raise ValueError("pallas recurrence supports zero initial "
                             "states only")
        from .pallas_lstm import bilstm_recurrence_trainable
        # differentiable wrapper: primal = the minimal forward kernel;
        # under jax.grad a residual-saving forward + fused reverse-time
        # backward kernel run instead. The kernels take the storage dtype
        # from xproj (bf16 = MXU native rate, 1.76x f32 — the round-1
        # "27x slower" bf16 measurement was a tunnel artifact, see
        # docs/BENCH.md); gate math, cell states and dW accumulation are
        # f32 inside the kernel at either storage dtype.
        ys = bilstm_recurrence_trainable(
            xproj, params["w_hh"].astype(compute_dtype), hidden_size)
        h_T = ys[-1]
    else:
        ys, h_T, _ = _scan_bidir(xproj, params["w_hh"].astype(compute_dtype),
                                 hidden_size, h0c0, compute_dtype)
    if not return_sequence:
        return jnp.concatenate([h_T[0], h_T[1]], axis=-1)  # (B, 2H)
    fwd = jnp.moveaxis(ys[:, 0], 0, 1)                  # (B, T, H)
    bwd = jnp.moveaxis(jnp.flip(ys[:, 1], axis=0), 0, 1)
    return jnp.concatenate([fwd, bwd], axis=-1)          # (B, T, 2H)


def bilstm_stack(x: jax.Array, layers: list[Params], hidden_size: int,
                 dropout_rate: float = 0.0, dropout_rng=None,
                 train: bool = False, compute_dtype=jnp.float32,
                 last_layer_sequence: bool = True,
                 impl: str = "scan") -> jax.Array:
    """Multi-layer BiLSTM with inter-layer dropout (torch semantics: dropout
    on every layer's output except the last, models.py:156-157).

    When ``last_layer_sequence`` is False the top layer returns only the
    final-state concat — exactly what the classifier head consumes — which
    lets XLA skip materializing the top layer's full sequence output.
    """
    out = x
    n = len(layers)
    for li, p in enumerate(layers):
        is_last = li == n - 1
        out = bilstm_layer(out, p, hidden_size, compute_dtype=compute_dtype,
                           return_sequence=(not is_last) or last_layer_sequence,
                           impl=impl)
        if train and dropout_rate > 0.0 and not is_last:
            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - dropout_rate
            mask = jax.random.bernoulli(sub, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0).astype(out.dtype)
    return out
