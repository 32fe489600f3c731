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

Inference runs the minimal kernel below; training runs the
residual-saving forward + fused reverse-time backward pair behind
``bilstm_recurrence_trainable`` (custom VJP, bottom of this file). All
kernels take their storage dtype (f32 or bf16) from xproj; gate math,
cell states and gradient accumulation stay f32. Grid =
(batch_tiles, T); scratch persists across the sequential T dimension of
the grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cell_step(x, h, c, w, H):
    """One LSTM cell update (gate order i,f,g,o) -> (h_new, c_new, gates).

    Matmul accumulates in f32 regardless of the storage dtype (h/w may be
    bf16 for 2x MXU rate); gate math and the cell state stay f32.
    """
    pre = x.astype(jnp.float32) + jnp.dot(
        h, w, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(pre[:, 1 * H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, jnp.concatenate([i, f, g, o], axis=-1)


def _lstm_kernel(x_ref, w_ref, y_ref, h_ref, c_ref, *, hidden_size: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = hidden_size
    for d in range(2):  # direction: 0 fwd, 1 (time-flipped) bwd
        h_new, c_new, _ = _cell_step(x_ref[0, d], h_ref[d], c_ref[d],
                                     w_ref[d], H)
        c_ref[d] = c_new
        h_ref[d] = h_new.astype(h_ref.dtype)
        y_ref[0, d] = h_new.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hidden_size", "block_b",
                                             "interpret"))
def bilstm_recurrence_pallas(xproj: jax.Array, w_hh: jax.Array,
                             hidden_size: int, block_b: int = 256,
                             interpret: bool = False) -> jax.Array:
    """Run the fused recurrence (forward only, minimal HBM traffic).
    xproj (T, 2, B, 4H) -> (T, 2, B, H), in xproj's dtype (f32, or bf16
    for 2x MXU rate with f32 gate math/accumulation)."""
    T, D, B, G = xproj.shape
    H = hidden_size
    assert D == 2 and G == 4 * H
    dtype = xproj.dtype if xproj.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32

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
        out_shape=jax.ShapeDtypeStruct((T, 2, Bp, H), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, H), dtype),         # h (matmul input)
            pltpu.VMEM((2, block_b, H), jnp.float32),   # c (f32 state)
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
    )(xproj.astype(dtype), w_hh.astype(dtype))
    if pad_b:
        out = out[:, :, :B, :]
    return out


# ---------------------------------------------------------------------------
# training path: forward saving residuals + fused backward (custom VJP)
# ---------------------------------------------------------------------------

def _lstm_fwd_save_kernel(x_ref, w_ref, y_ref, c_out_ref, g_ref,
                          h_ref, c_ref, *, hidden_size: int):
    """Forward step that also writes cell states and gate activations —
    the residuals the backward kernel needs (saving them beats recomputing
    the W_hh matmul per step in the backward).

    Storage dtype follows the refs (bf16 in mixed-precision training —
    halves residual HBM traffic and runs the recurrent dot at the MXU's
    bf16 rate); gate math and the cell state stay f32 (c_ref/c_out are
    always f32: tanh'(c) in the backward is precision-sensitive)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = hidden_size
    for d in range(2):
        h_new, c_new, gates = _cell_step(x_ref[0, d], h_ref[d], c_ref[d],
                                         w_ref[d], H)
        c_ref[d] = c_new
        h_ref[d] = h_new.astype(h_ref.dtype)
        y_ref[0, d] = h_new.astype(y_ref.dtype)
        c_out_ref[0, d] = c_new
        g_ref[0, d] = gates.astype(g_ref.dtype)


def _lstm_bwd_kernel(dy_ref, g_ref, c_ref, hprev_ref, cprev_ref, w_ref,
                     dx_ref, dw_ref, dh_ref, dc_ref, *, hidden_size: int):
    """Reverse-time backward step: consumes the saved gates/cell states
    (previous-step states read straight from the forward outputs with a
    shifted index map — no host-side copies), emits per-step dxproj, and
    accumulates a per-batch-tile dW_hh partial (batch tiles stay parallel;
    the partials are summed outside)."""
    t = pl.program_id(1)          # 0..T-1, mapped to true time T-1-t
    at_time_zero = t == pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    H = hidden_size
    wdt = w_ref.dtype  # matmul storage dtype (bf16 in mixed precision)
    for d in range(2):
        # elementwise gate math in f32 regardless of storage dtype; the
        # dh/dW dots take storage-dtype operands (MXU native rate) with
        # f32 accumulation
        gates = g_ref[0, d].astype(jnp.float32)
        i = gates[:, 0 * H:1 * H]
        f = gates[:, 1 * H:2 * H]
        g = gates[:, 2 * H:3 * H]
        o = gates[:, 3 * H:4 * H]
        c_t = c_ref[0, d]
        # the shifted blocks clamp at time 0; zero them there (h_-1 = c_-1 = 0)
        c_prev = jnp.where(at_time_zero, 0.0,
                           cprev_ref[0, d].astype(jnp.float32))
        h_prev = jnp.where(at_time_zero,
                           jnp.zeros((), wdt), hprev_ref[0, d])

        tanh_c = jnp.tanh(c_t)
        dh_total = dy_ref[0, d].astype(jnp.float32) + dh_ref[d]
        dc_total = dc_ref[d] + dh_total * o * (1.0 - tanh_c * tanh_c)
        da_i = dc_total * g * i * (1.0 - i)
        da_f = dc_total * c_prev * f * (1.0 - f)
        da_g = dc_total * i * (1.0 - g * g)
        da_o = dh_total * tanh_c * o * (1.0 - o)
        dgates = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)

        dx_ref[0, d] = dgates.astype(dx_ref.dtype)
        # dh_{t-1} contribution through the recurrent matmul
        dh_ref[d] = jnp.dot(dgates.astype(wdt), w_ref[d].T,
                            preferred_element_type=jnp.float32)
        dc_ref[d] = dc_total * f
        dw_ref[0, d] += jnp.dot(h_prev.T, dgates.astype(wdt),
                                preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("hidden_size", "block_b",
                                             "interpret"))
def _recurrence_fwd_save(xproj, w_hh, hidden_size, block_b=128,
                         interpret=False):
    T, D, B, G = xproj.shape
    H = hidden_size
    dtype = xproj.dtype if xproj.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    pad_b = _round_up(max(B, 8), block_b) - B
    if pad_b:
        xproj = jnp.pad(xproj, ((0, 0), (0, 0), (0, pad_b), (0, 0)))
    Bp = B + pad_b
    nb = Bp // block_b

    ys, cs, gs = pl.pallas_call(
        functools.partial(_lstm_fwd_save_kernel, hidden_size=H),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, 2, block_b, 4 * H), lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, 4 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, block_b, H), lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_b, H), lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, block_b, 4 * H), lambda b, t: (t, 0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # h states and gates in the storage dtype (bf16 halves the
            # residual bytes); cell states stay f32 for tanh'(c)
            jax.ShapeDtypeStruct((T, 2, Bp, H), dtype),
            jax.ShapeDtypeStruct((T, 2, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, 2, Bp, 4 * H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, H), dtype),         # h (matmul input)
            pltpu.VMEM((2, block_b, H), jnp.float32),   # c (f32 state)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xproj.astype(dtype), w_hh.astype(dtype))
    return ys, cs, gs


@functools.partial(jax.jit, static_argnames=("hidden_size", "block_b",
                                             "interpret"))
def _recurrence_bwd(dys, ys, cs, gs, w_hh, hidden_size, block_b=128,
                    interpret=False):
    """-> (dxproj (T,2,B,4H), dw_hh (2,H,4H)); all args already padded.
    Storage dtype (f32 or bf16) follows the saved gates; carries and the
    dW accumulator are always f32."""
    T, D, Bp, H4 = gs.shape
    H = hidden_size
    dtype = gs.dtype
    nb = Bp // block_b

    rev = lambda b, t: (T - 1 - t, 0, b, 0)  # noqa: E731
    # previous true timestep (clamped at 0; the kernel zeroes time 0)
    rev_prev = lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b, 0)  # noqa: E731
    spec_h = pl.BlockSpec((1, 2, block_b, H), rev,
                          memory_space=pltpu.VMEM)
    spec_h_prev = pl.BlockSpec((1, 2, block_b, H), rev_prev,
                               memory_space=pltpu.VMEM)
    spec_4h = pl.BlockSpec((1, 2, block_b, 4 * H), rev,
                           memory_space=pltpu.VMEM)

    dx, dw = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, hidden_size=H),
        grid=(nb, T),
        in_specs=[
            spec_h,                                   # dys
            spec_4h,                                  # gates
            spec_h,                                   # c
            spec_h_prev,                              # h_prev (= ys shifted)
            spec_h_prev,                              # c_prev (= cs shifted)
            pl.BlockSpec((2, H, 4 * H), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),    # w_hh
        ],
        out_specs=[
            spec_4h,                                  # dxproj
            pl.BlockSpec((1, 2, H, 4 * H), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),    # dw_hh per-tile partial
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, Bp, 4 * H), dtype),
            jax.ShapeDtypeStruct((nb, 2, H, 4 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, H), jnp.float32),  # dh carry
            pltpu.VMEM((2, block_b, H), jnp.float32),  # dc carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(dys.astype(dtype), gs, cs, ys, cs, w_hh.astype(dtype))
    return dx, jnp.sum(dw, axis=0)


_INTERPRET = False  # tests flip this to run the VJP kernels on CPU


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bilstm_recurrence_trainable(xproj: jax.Array, w_hh: jax.Array,
                                hidden_size: int) -> jax.Array:
    """Differentiable fused recurrence: the primal (inference) call runs
    the minimal forward kernel; under jax.grad the forward saves gate/cell
    residuals and the backward runs a fused reverse-time kernel."""
    return bilstm_recurrence_pallas(xproj, w_hh, hidden_size,
                                    interpret=_INTERPRET)


_TRAIN_BLOCK_B = 128


def _trainable_fwd(xproj, w_hh, hidden_size):
    B = xproj.shape[2]
    # static padding amount (jit outputs are traced, so derive it from
    # shapes here rather than returning it from the jitted kernel call)
    pad_b = _round_up(max(B, 8), _TRAIN_BLOCK_B) - B
    ys, cs, gs = _recurrence_fwd_save(xproj, w_hh, hidden_size,
                                      block_b=_TRAIN_BLOCK_B,
                                      interpret=_INTERPRET)
    out = ys[:, :, :B, :] if pad_b else ys
    return out, (ys, cs, gs, w_hh, B, pad_b)


def _trainable_bwd(hidden_size, res, dys):
    ys, cs, gs, w_hh, B, pad_b = res
    if pad_b:
        dys = jnp.pad(dys, ((0, 0), (0, 0), (0, pad_b), (0, 0)))
    dx, dw = _recurrence_bwd(dys, ys, cs, gs, w_hh, hidden_size,
                             block_b=_TRAIN_BLOCK_B, interpret=_INTERPRET)
    if pad_b:
        dx = dx[:, :, :B, :]
    return dx, dw.astype(w_hh.dtype)


bilstm_recurrence_trainable.defvjp(_trainable_fwd, _trainable_bwd)
