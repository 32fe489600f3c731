"""Fully-fused BiLSTM layer kernel: input projection + recurrence in one
Pallas kernel (round-5 ceiling work, VERDICT r4 item 2).

The round-1..4 TPU path ran each layer as [einsum xproj -> bias/flip/
transpose passes -> recurrence kernel]: the (T, 2, B, 4H) projection
tensor — the model's largest intermediate, ~218 MB at B=4096 —
round-tripped HBM between the einsum and the kernel, and the recurrence
kernel itself streamed 4H-wide inputs for an arithmetic intensity of
only ~214 FLOP/byte (HBM-bound). This kernel computes the projection
INSIDE the recurrence step:

    pre_d[t] = x_d[t] @ w_ih[d] + b[d] + h_d @ w_hh[d]

so per grid step it streams the F-wide raw input block instead of the
4H-wide projection (~4x less input traffic for the comb layers), never
materializes xproj at all, and does both big dots back to back on data
already in VMEM (~1050 FLOP/byte — compute-bound).

Layout contract — TIME-MAJOR, chosen for Mosaic's block rule (the last
two block dims must be sublane-divisible-by-8 x lane-divisible-by-128-
or-full; a batch-major (bb, 1, F) block violates it, a time-major
(1, bb, F) block satisfies it with zero padding):

    inputs  x:   (T, B, F) — raw layer input, NO time flip; the kernel
                 reads direction 1's step t block at time T-1-t via a
                 second BlockSpec over the same array
            w_ih (2, F, 4H), b (2, 4H), w_hh (2, H, 4H), gate order
                 i,f,g,o (torch layout, reference models.py:137-157)
    outputs ys_f, ys_b: (T, B, H) in TRUE time (direction 1's step-t
                 state is written at row T-1-t — callers never flip), or
                 (1, B, H) final states when seq_out=False (the top comb
                 layer feeds only cat(h_T^fwd, h_T^bwd) to the head,
                 reference models.py:229-231)

Because outputs are time-major too, a whole stack runs time-major end
to end: only the model's raw (B, T, F) inputs transpose once (tiny —
F <= 16), and the (fwd, bwd) halves thread between layers through
row-split projections, so no inter-layer concat, flip, or transpose
ever materializes in HBM.

Storage dtype follows x (bf16 = MXU-native rate); gate math and cell
state stay f32 — the same mixed-precision contract as ops/lstm.py, so
the scan path remains a semantically-equivalent fallback.

Inference-only: training keeps the residual-saving forward + fused
backward pair in ops/pallas_lstm.py (bilstm_recurrence_trainable).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(*refs, hidden_size: int, n_in: int):
    """refs = (xa_f, xa_b, [xb_f, xb_b,] w_ih, b, w_hh,
               ys_f, ys_b, h_scr, c_scr)."""
    xs = refs[:2 * n_in]
    w_ih_ref, b_ref, w_hh_ref = refs[2 * n_in:2 * n_in + 3]
    yf_ref, yb_ref = refs[2 * n_in + 3:2 * n_in + 5]
    h_ref, c_ref = refs[2 * n_in + 5:]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    H = hidden_size
    for d in range(2):
        # input projection: F-split halves against row-split w_ih
        row = 0
        pre = b_ref[d].astype(jnp.float32)[None, :]
        for i in range(n_in):
            x_d = xs[2 * i + d][0]              # (block_b, F_i)
            F_i = x_d.shape[-1]
            pre = pre + jnp.dot(
                x_d, w_ih_ref[d, row:row + F_i, :],
                preferred_element_type=jnp.float32)
            row += F_i
        # recurrence projection on the VMEM-resident hidden state
        pre = pre + jnp.dot(h_ref[d], w_hh_ref[d],
                            preferred_element_type=jnp.float32)
        i_g = jax.nn.sigmoid(pre[:, 0 * H:1 * H])
        f_g = jax.nn.sigmoid(pre[:, 1 * H:2 * H])
        g_g = jnp.tanh(pre[:, 2 * H:3 * H])
        o_g = jax.nn.sigmoid(pre[:, 3 * H:4 * H])
        c_new = f_g * c_ref[d] + i_g * g_g
        h_new = o_g * jnp.tanh(c_new)
        c_ref[d] = c_new
        h_ref[d] = h_new.astype(h_ref.dtype)
        y_ref = yf_ref if d == 0 else yb_ref
        y_ref[0] = h_new.astype(y_ref.dtype)


def bilstm_layer_fused(xs, w_ih: jax.Array, b: jax.Array,
                       w_hh: jax.Array, hidden_size: int,
                       seq_out: bool = True, block_b: int = 256,
                       interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """One fused BiLSTM layer, time-major. ``xs``: a (T, B, F) array or
    a tuple of them (their F's concatenate against w_ih's rows).
    Returns (ys_f, ys_b), each (T, B, H) in true time, or (1, B, H)
    final states when seq_out=False.

    Differentiable: the primal runs the fused kernel; under jax.grad the
    backward recomputes through the time-major scan formulation (rare
    eval-grad contexts only — production training runs the residual-
    saving kernel pair in ops/pallas_lstm.py via forward(train=True))."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    return _layer_fused_vjp(tuple(xs), w_ih, b, w_hh, hidden_size,
                            seq_out, block_b, interpret)


def _layer_scan_tm(xs, w_ih, b, w_hh, hidden_size: int, seq_out: bool
                   ) -> tuple[jax.Array, jax.Array]:
    """Differentiable time-major reference of the fused layer (same
    output contract), built on ops.lstm._scan_bidir."""
    from .lstm import _scan_bidir
    x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
    dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    x = x.astype(dtype)
    xp = jnp.einsum("tbf,dfg->tdbg", x, w_ih.astype(dtype),
                    preferred_element_type=dtype) \
        + b.astype(dtype)[None, :, None, :]
    xp = jnp.stack([xp[:, 0], jnp.flip(xp[:, 1], axis=0)], axis=1)
    ys, _, _ = _scan_bidir(xp, w_hh.astype(dtype), hidden_size, None,
                           dtype)
    ys_f = ys[:, 0]                          # (T, B, H), true time
    ys_b = jnp.flip(ys[:, 1], axis=0)        # un-flip to true time
    if not seq_out:
        return ys_f[-1:], ys_b[:1]           # h_T of each direction
    return ys_f, ys_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _layer_fused_vjp(xs, w_ih, b, w_hh, hidden_size, seq_out, block_b,
                     interpret):
    return _layer_fused_impl(xs, w_ih, b, w_hh, hidden_size, seq_out,
                             block_b, interpret)


def _layer_fused_fwd(xs, w_ih, b, w_hh, hidden_size, seq_out, block_b,
                     interpret):
    out = _layer_fused_impl(xs, w_ih, b, w_hh, hidden_size, seq_out,
                            block_b, interpret)
    return out, (xs, w_ih, b, w_hh)


def _layer_fused_bwd(hidden_size, seq_out, block_b, interpret, res, g):
    xs, w_ih, b, w_hh = res
    _, vjp = jax.vjp(
        lambda xs_, wi, b_, wh: _layer_scan_tm(xs_, wi, b_, wh,
                                               hidden_size, seq_out),
        xs, w_ih, b, w_hh)
    return vjp(g)


_layer_fused_vjp.defvjp(_layer_fused_fwd, _layer_fused_bwd)


@functools.partial(jax.jit, static_argnames=("hidden_size", "seq_out",
                                             "block_b", "interpret"))
def _layer_fused_impl(xs, w_ih: jax.Array, b: jax.Array,
                      w_hh: jax.Array, hidden_size: int,
                      seq_out: bool, block_b: int, interpret: bool
                      ) -> tuple[jax.Array, jax.Array]:
    T, B, _ = xs[0].shape
    H = hidden_size
    n_in = len(xs)
    assert w_ih.shape[0] == 2 and w_ih.shape[2] == 4 * H
    assert sum(x.shape[-1] for x in xs) == w_ih.shape[1]
    dtype = xs[0].dtype if xs[0].dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    xs = tuple(x.astype(dtype) for x in xs)

    bb = min(block_b, _round_up(max(B, 8), 8))
    pad_b = _round_up(max(B, 8), bb) - B
    if pad_b:
        xs = tuple(jnp.pad(x, ((0, 0), (0, pad_b), (0, 0))) for x in xs)
    Bp = B + pad_b
    nb = Bp // bb

    fwd = lambda bi, t: (t, bi, 0)              # noqa: E731
    bwd = lambda bi, t: (T - 1 - t, bi, 0)      # noqa: E731

    in_specs = []
    operands = []
    for x in xs:
        F_i = x.shape[-1]
        in_specs += [
            pl.BlockSpec((1, bb, F_i), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, F_i), bwd, memory_space=pltpu.VMEM),
        ]
        operands += [x, x]
    in_specs += [
        pl.BlockSpec(w_ih.shape, lambda bi, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b.shape, lambda bi, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_hh.shape, lambda bi, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [w_ih.astype(dtype), b.astype(jnp.float32),
                 w_hh.astype(dtype)]

    if seq_out:
        out_specs = [
            pl.BlockSpec((1, bb, H), fwd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, H), bwd, memory_space=pltpu.VMEM),
        ]
        out_T = T
    else:
        # every t maps to block 0; the sequential-final write (t = T-1,
        # i.e. h_T for both directions) is what lands
        last = lambda bi, t: (0, bi, 0)         # noqa: E731
        out_specs = [
            pl.BlockSpec((1, bb, H), last, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, H), last, memory_space=pltpu.VMEM),
        ]
        out_T = 1

    F_total = w_ih.shape[1]
    ys_f, ys_b = pl.pallas_call(
        functools.partial(_fused_kernel, hidden_size=H, n_in=n_in),
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((out_T, Bp, H), dtype),
            jax.ShapeDtypeStruct((out_T, Bp, H), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bb, H), dtype),         # h (matmul operand)
            pltpu.VMEM((2, bb, H), jnp.float32),   # c (f32 state)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * T * Bp * (F_total + H) * 4 * H,
            bytes_accessed=(2 * sum(x.size for x in xs)
                            + (w_ih.size + w_hh.size) * nb
                            + 2 * Bp * out_T * H)
            * jnp.dtype(dtype).itemsize,
            transcendentals=T * 2 * Bp * H * 4,
        ),
        interpret=interpret,
    )(*operands)
    if pad_b:
        ys_f, ys_b = ys_f[:, :B], ys_b[:, :B]
    return ys_f, ys_b


# default batch-tile width for the fused kernels; benchmarks sweep this
# (benchmarks/fused_infer_ab.py) and models/bilstm.forward reads it
BLOCK_B = 256

_INTERPRET = False  # tests flip this to run the fused kernels on CPU


def _defaults(block_b, interpret):
    if block_b is None:
        block_b = BLOCK_B
    if interpret is None:
        # honor the shared CPU-interpret switch (tests and the multichip
        # dryrun flip pallas_lstm._INTERPRET for the whole pallas family)
        from . import pallas_lstm
        interpret = _INTERPRET or pallas_lstm._INTERPRET
    return block_b, interpret


def bilstm_stack_fused_tm(xs, layers, hidden_size: int,
                          compute_dtype=jnp.float32,
                          last_layer_sequence: bool = True,
                          block_b: int | None = None,
                          interpret: bool | None = None
                          ) -> tuple[jax.Array, jax.Array]:
    """Time-major fused multi-layer BiLSTM (inference semantics — no
    dropout). ``xs``: (T, B, F) or a tuple of them. The (fwd, bwd)
    halves thread between layers through the next kernel's row-split
    projection — no inter-layer concat. Returns the final layer's
    (ys_f, ys_b), each (T, B, H), or (1, B, H) when
    ``last_layer_sequence`` is False."""
    block_b, interpret = _defaults(block_b, interpret)
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    xs = tuple(x.astype(compute_dtype) for x in xs)
    n = len(layers)
    for li, p in enumerate(layers):
        is_last = li == n - 1
        seq_out = (not is_last) or last_layer_sequence
        ys_f, ys_b = bilstm_layer_fused(
            xs, p["w_ih"].astype(compute_dtype),
            p["b"], p["w_hh"].astype(compute_dtype),
            hidden_size, seq_out=seq_out, block_b=block_b,
            interpret=interpret)
        xs = (ys_f, ys_b)
    return ys_f, ys_b


def bilstm_stack_fused(xs, layers, hidden_size: int,
                       compute_dtype=jnp.float32,
                       last_layer_sequence: bool = True,
                       block_b: int | None = None,
                       interpret: bool | None = None) -> jax.Array:
    """Batch-major convenience wrapper over the time-major stack: takes
    (B, T, F) input(s), returns (B, T, 2H), or (B, 2H) when
    ``last_layer_sequence`` is False (== the reference readout
    cat(h_T^fwd, h_T^bwd), models.py:229-231)."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    xs_tm = tuple(jnp.moveaxis(x, 0, 1) for x in xs)
    ys_f, ys_b = bilstm_stack_fused_tm(
        xs_tm, layers, hidden_size, compute_dtype=compute_dtype,
        last_layer_sequence=last_layer_sequence, block_b=block_b,
        interpret=interpret)
    if not last_layer_sequence:
        return jnp.concatenate([ys_f[0], ys_b[0]], axis=-1)
    return jnp.concatenate([jnp.moveaxis(ys_f, 0, 1),
                            jnp.moveaxis(ys_b, 0, 1)], axis=-1)
