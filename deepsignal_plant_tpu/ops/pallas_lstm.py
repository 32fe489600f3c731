"""Pallas fused BiLSTM recurrence for TPU.

The scan formulation (ops/lstm.py) leaves XLA to schedule T sequential
steps of [load h -> matmul -> gates -> store h]. This kernel fuses the
whole recurrence: the recurrent weights stay resident in VMEM across all
timesteps, hidden/cell state lives in VMEM scratch, and the per-step input
projections stream in from HBM with Pallas' automatic grid double
buffering. Both directions run inside one kernel (backward consumes
time-flipped projections, exactly like the scan path).

Layout contract (same as ops/lstm.py):
    xproj: (T, 2, B, 4H)  input projections + bias, gate order i,f,g,o,
                          direction 1 already time-flipped
    w_hh:  (2, H, 4H)
    out:   (T, 2, B, H)   per-step hidden states (direction 1 in flipped
                          time, caller un-flips)

Used for inference only; training takes the scan path (which XLA
differentiates). Grid = (batch_tiles, T); scratch persists across the
sequential T dimension of the grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_kernel(x_ref, w_ref, y_ref, h_ref, c_ref, *, hidden_size: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = hidden_size
    for d in range(2):  # direction: 0 fwd, 1 (time-flipped) bwd
        x = x_ref[0, d]                        # (Bt, 4H)
        h = h_ref[d]                           # (Bt, H)
        gates = x + jnp.dot(h, w_ref[d], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c_new = f * c_ref[d] + i * g
        h_new = o * jnp.tanh(c_new)
        c_ref[d] = c_new
        h_ref[d] = h_new
        y_ref[0, d] = h_new


@functools.partial(jax.jit, static_argnames=("hidden_size", "block_b",
                                             "interpret"))
def bilstm_recurrence_pallas(xproj: jax.Array, w_hh: jax.Array,
                             hidden_size: int, block_b: int = 256,
                             interpret: bool = False) -> jax.Array:
    """Run the fused recurrence. xproj (T, 2, B, 4H) f32 -> (T, 2, B, H)."""
    T, D, B, G = xproj.shape
    H = hidden_size
    assert D == 2 and G == 4 * H

    pad_b = _round_up(max(B, 8), block_b) - B
    if pad_b:
        xproj = jnp.pad(xproj, ((0, 0), (0, 0), (0, pad_b), (0, 0)))
    Bp = B + pad_b
    nb = Bp // block_b

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden_size=H),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, 2, block_b, 4 * H),
                         lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 4 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, block_b, H),
                               lambda b, t: (t, 0, b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, Bp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, H), jnp.float32),   # h
            pltpu.VMEM((2, block_b, H), jnp.float32),   # c
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * T * Bp * H * 4 * H,
            bytes_accessed=(xproj.size + w_hh.size * nb * T
                            + T * 2 * Bp * H) * 4,
            transcendentals=T * 2 * Bp * H * 4,
        ),
        interpret=interpret,
    )(xproj.astype(jnp.float32), w_hh.astype(jnp.float32))
    if pad_b:
        out = out[:, :, :B, :]
    return out
