"""ModelBiLSTM — the flagship per-site 5mC classifier, in JAX.

Architecture parity with the reference (deepsignal_plant/models.py:99-240):

- seq branch:    base embedding (16->4) ++ per-base mean/std/len
                 -> 1-layer BiLSTM(H=nhid_seq) -> Linear(2H->H) -> ReLU
- signal branch: 13x16 raw-signal matrix
                 -> 1-layer BiLSTM(H=nhid_signal) -> Linear(2H->H) -> ReLU
- combined:      concat -> 3-layer BiLSTM(H=256)
                 -> readout cat(fwd last step, bwd first step) = final states
                 -> dropout -> Linear(512->256) -> dropout -> ReLU
                 -> Linear(256->2); returns (logits, softmax)

Deviations (deliberate, documented):
- initial LSTM states are zeros, not per-forward randn (models.py:169-176):
  inference here is deterministic.
- the BiLSTM recurrences hoist all input projections into batched MXU
  matmuls and run one fused two-direction scan per layer (ops/lstm.py), or a
  Pallas fused kernel on TPU (ops/pallas_lstm.py).

The model is a plain pytree of arrays + pure functions — trivially jit/pjit
-able and checkpoint-convertible from the reference's torch state_dict
(models/convert.py).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.lstm import bilstm_stack, init_bilstm_layer

Params = dict[str, Any]


class Batch(NamedTuple):
    """Model inputs; shapes (B, L) / (B, L, S)."""
    kmer: jax.Array              # int32 base codes
    base_means: jax.Array        # float32
    base_stds: jax.Array         # float32
    base_signal_lens: jax.Array  # float32
    signals: jax.Array           # float32 (B, L, S)


def _init_linear(key: jax.Array, in_dim: int, out_dim: int,
                 dtype=jnp.float32) -> Params:
    """torch nn.Linear default init: kaiming-uniform weight (a=sqrt(5)) which
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); same bound for bias."""
    k = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -k, k),
            "b": jax.random.uniform(kb, (out_dim,), dtype, -k, k)}


def init_params(key: jax.Array, cfg: ModelConfig,
                dtype=jnp.float32) -> Params:
    """Initialize the full parameter pytree for ``cfg``."""
    keys = iter(jax.random.split(key, 16))
    params: Params = {}
    if cfg.module != "signal_bilstm":
        params["embed"] = jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.embedding_size), dtype)
        params["lstm_seq"] = [
            init_bilstm_layer(next(keys),
                              cfg.seq_input_size if li == 0
                              else 2 * cfg.nhid_seq,
                              cfg.nhid_seq, dtype)
            for li in range(cfg.num_layers_branch)]
        params["fc_seq"] = _init_linear(next(keys), 2 * cfg.nhid_seq,
                                        cfg.nhid_seq, dtype)
    if cfg.module != "seq_bilstm":
        params["lstm_signal"] = [
            init_bilstm_layer(next(keys),
                              cfg.signal_len if li == 0
                              else 2 * cfg.nhid_signal,
                              cfg.nhid_signal, dtype)
            for li in range(cfg.num_layers_branch)]
        params["fc_signal"] = _init_linear(next(keys), 2 * cfg.nhid_signal,
                                           cfg.nhid_signal, dtype)
    params["lstm_comb"] = [
        init_bilstm_layer(next(keys),
                          cfg.hidden_size if li == 0 else 2 * cfg.hidden_size,
                          cfg.hidden_size, dtype)
        for li in range(cfg.num_layers_comb)]
    params["fc1"] = _init_linear(next(keys), 2 * cfg.hidden_size,
                                 cfg.hidden_size, dtype)
    params["fc2"] = _init_linear(next(keys), cfg.hidden_size,
                                 cfg.num_classes, dtype)
    return params


def _dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def forward(params: Params, batch: Batch, cfg: ModelConfig,
            train: bool = False, dropout_rng: jax.Array | None = None,
            ) -> tuple[jax.Array, jax.Array]:
    """Pure forward pass -> (logits, softmax_probs), both (B, num_classes)."""
    cdt = jnp.dtype(cfg.compute_dtype)
    L = cfg.seq_len
    rngs = (list(jax.random.split(dropout_rng, 4))
            if (train and dropout_rng is not None) else [None] * 4)
    # pallas carries a fused custom-VJP backward in both f32 and bf16
    # (bf16 storage/matmuls, f32 gate math and dW accumulation, f32 cell
    # states), so both inference and training honor cfg.recurrence at
    # either compute dtype
    impl = cfg.recurrence

    out_seq = out_signal = None
    if cfg.module != "signal_bilstm":
        feats = [batch.base_means.reshape(-1, L, 1),
                 batch.base_stds.reshape(-1, L, 1)]
        if cfg.is_signallen:
            feats.append(batch.base_signal_lens.reshape(-1, L, 1))
        if cfg.is_base:
            feats = [params["embed"][batch.kmer.astype(jnp.int32)]] + feats
        x_seq = jnp.concatenate([f.astype(cdt) for f in feats], axis=2)
        out_seq = bilstm_stack(x_seq, params["lstm_seq"], cfg.nhid_seq,
                               cfg.dropout_rate, rngs[0], train, cdt,
                               impl=impl)
        out_seq = out_seq @ params["fc_seq"]["w"].astype(cdt) \
            + params["fc_seq"]["b"].astype(cdt)
        out_seq = jax.nn.relu(out_seq)

    if cfg.module != "seq_bilstm":
        x_sig = batch.signals.astype(cdt)
        out_signal = bilstm_stack(x_sig, params["lstm_signal"],
                                  cfg.nhid_signal, cfg.dropout_rate, rngs[1],
                                  train, cdt, impl=impl)
        out_signal = out_signal @ params["fc_signal"]["w"].astype(cdt) \
            + params["fc_signal"]["b"].astype(cdt)
        out_signal = jax.nn.relu(out_signal)

    if cfg.module == "seq_bilstm":
        out = out_seq
    elif cfg.module == "signal_bilstm":
        out = out_signal
    else:
        out = jnp.concatenate([out_seq, out_signal], axis=2)

    # top stack returns only final states (== reference readout models.py:229)
    out = bilstm_stack(out, params["lstm_comb"], cfg.hidden_size,
                       cfg.dropout_rate, rngs[2], train, cdt,
                       last_layer_sequence=False, impl=impl)

    if train:
        out = _dropout(out, cfg.dropout_rate, rngs[3])
    out = out @ params["fc1"]["w"].astype(cdt) + params["fc1"]["b"].astype(cdt)
    if train:
        rng_extra = jax.random.fold_in(rngs[3], 1)
        out = _dropout(out, cfg.dropout_rate, rng_extra)
    out = jax.nn.relu(out)
    logits = out @ params["fc2"]["w"].astype(cdt) \
        + params["fc2"]["b"].astype(cdt)
    logits = logits.astype(jnp.float32)
    return logits, jax.nn.softmax(logits, axis=1)


class ModelBiLSTM:
    """Thin OO wrapper bundling (config, params) with jit-compiled apply."""

    def __init__(self, cfg: ModelConfig | None = None, params: Params | None = None,
                 seed: int = 0):
        self.cfg = cfg or ModelConfig()
        self.params = (params if params is not None
                       else init_params(jax.random.PRNGKey(seed), self.cfg))
        self._infer = jax.jit(
            lambda p, b: forward(p, b, self.cfg, train=False))

    def __call__(self, batch: Batch) -> tuple[jax.Array, jax.Array]:
        return self._infer(self.params, batch)
