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


# A/B kill switch for the fully-fused inference kernels (pallas
# recurrence only): benchmarks/fused_infer_ab.py flips this to compare
# against the round-4 einsum+recurrence-kernel path
_FUSED_ENABLED = True


def _dropout(x: jax.Array, rate: float, rng: jax.Array) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _forward_fused_tm(params: Params, batch: Batch, cfg: ModelConfig
                      ) -> tuple[jax.Array, jax.Array]:
    """Inference forward over the fully-fused time-major kernels
    (ops/pallas_fused.py). Only the raw (B, T, F<=16) inputs transpose;
    everything to the readout runs time-major, branch fc layers apply
    row-split on the (fwd, bwd) halves so no concat materializes."""
    from ..ops.pallas_fused import bilstm_stack_fused_tm
    cdt = jnp.dtype(cfg.compute_dtype)
    L = cfg.seq_len

    def branch_fc(pair, fc, H):
        # relu(cat(f, b) @ W + b) == relu(f @ W[:H] + b_ @ W[H:] + b)
        w = fc["w"].astype(cdt)
        f, b_ = pair
        return jax.nn.relu(f @ w[:H] + b_ @ w[H:]
                           + fc["b"].astype(cdt))

    out_seq = out_signal = None
    if cfg.module != "signal_bilstm":
        feats = [batch.base_means.reshape(-1, L, 1),
                 batch.base_stds.reshape(-1, L, 1)]
        if cfg.is_signallen:
            feats.append(batch.base_signal_lens.reshape(-1, L, 1))
        if cfg.is_base:
            feats = [params["embed"][batch.kmer.astype(jnp.int32)]] + feats
        x_seq = jnp.concatenate([f.astype(cdt) for f in feats], axis=2)
        pair = bilstm_stack_fused_tm(jnp.moveaxis(x_seq, 0, 1),
                                     params["lstm_seq"], cfg.nhid_seq,
                                     compute_dtype=cdt)
        out_seq = branch_fc(pair, params["fc_seq"], cfg.nhid_seq)

    if cfg.module != "seq_bilstm":
        x_sig = jnp.moveaxis(batch.signals.astype(cdt), 0, 1)
        pair = bilstm_stack_fused_tm(x_sig, params["lstm_signal"],
                                     cfg.nhid_signal, compute_dtype=cdt)
        out_signal = branch_fc(pair, params["fc_signal"], cfg.nhid_signal)

    if cfg.module == "seq_bilstm":
        comb_in = out_seq
    elif cfg.module == "signal_bilstm":
        comb_in = out_signal
    else:
        # the comb entry consumes the two branch outputs via row-split
        # projection — the branch concat never materializes either
        comb_in = (out_seq, out_signal)
    ys_f, ys_b = bilstm_stack_fused_tm(comb_in, params["lstm_comb"],
                                       cfg.hidden_size, compute_dtype=cdt,
                                       last_layer_sequence=False)
    out = jnp.concatenate([ys_f[0], ys_b[0]], axis=-1)    # (B, 2H)

    out = out @ params["fc1"]["w"].astype(cdt) + params["fc1"]["b"].astype(cdt)
    out = jax.nn.relu(out)
    logits = out @ params["fc2"]["w"].astype(cdt) \
        + params["fc2"]["b"].astype(cdt)
    logits = logits.astype(jnp.float32)
    return logits, jax.nn.softmax(logits, axis=1)


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
    # either compute dtype. Inference additionally upgrades "pallas" to
    # the round-5 FULLY-fused time-major layer kernels (input projection
    # computed inside the recurrence: the (T,2,B,4H) xproj tensor and
    # every inter-layer concat/flip/transpose never touch HBM —
    # ops/pallas_fused.py); train keeps the residual-saving trainable
    # pair in ops/pallas_lstm.py.
    impl = cfg.recurrence
    if impl == "pallas" and not train and _FUSED_ENABLED:
        return _forward_fused_tm(params, batch, cfg)

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


def forward_flops_per_site(cfg: ModelConfig) -> float:
    """Analytic forward FLOPs per site (matmul MACs x2; elementwise and
    embedding lookups excluded — they are <1% of the dot-product work).
    Drives the bench's MFU metric: mfu = sites/s x flops_per_site /
    chip_peak_flops."""
    T = cfg.seq_len

    def bilstm(in_size: int, H: int, n_layers: int) -> float:
        total = 0.0
        for li in range(n_layers):
            F = in_size if li == 0 else 2 * H
            # per dir per step: (F + H) x 4H MACs; x2 dirs x2 FLOP/MAC
            total += 2 * 2 * T * (F + H) * 4 * H
        return total

    flops = 0.0
    if cfg.module != "signal_bilstm":
        flops += bilstm(cfg.seq_input_size, cfg.nhid_seq,
                        cfg.num_layers_branch)
        flops += 2 * T * (2 * cfg.nhid_seq) * cfg.nhid_seq     # fc_seq
    if cfg.module != "seq_bilstm":
        flops += bilstm(cfg.signal_len, cfg.nhid_signal,
                        cfg.num_layers_branch)
        flops += 2 * T * (2 * cfg.nhid_signal) * cfg.nhid_signal
    # comb layer 0 input is cfg.hidden_size for EVERY module variant:
    # both = nhid_seq + nhid_signal = H; branch-only = that branch's fc
    # output, whose width is nhid_* = H (config.py:44-55, init_params
    # above builds lstm_comb[0] with in_size=cfg.hidden_size)
    flops += bilstm(cfg.hidden_size, cfg.hidden_size, cfg.num_layers_comb)
    flops += 2 * (2 * cfg.hidden_size) * cfg.hidden_size       # fc1
    flops += 2 * cfg.hidden_size * cfg.num_classes             # fc2
    return flops


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
