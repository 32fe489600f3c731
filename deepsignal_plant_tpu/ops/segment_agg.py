"""Device-side sort + segment-sum for call_freq aggregation.

SURVEY.md §7 step 5 names an "optional device-side sort+segment-sum for
huge runs" next to the host accumulator; this is it. The expensive part
of per-block aggregation is the O(n log n) site-key sort (np.unique in
the host path, pipeline/call_freq.py); here a jitted XLA kernel does the
sort, the segment-boundary scan, and the exact integer segment sums
(coverage, met counts) on the accelerator, and hands the host a sorted
row order it can drive float64 ``np.add.at`` with.

Exactness contract (why the float sums stay on the host): the reference
accumulates per-site probability sums sequentially in file order with
Python floats (reference call_mods_freq.py:60-66 — float64). A stable
sort keys rows by site while preserving file order *within* each site,
so host float64 adds over ``rows[order]`` associate exactly like the
reference's loop — output stays byte-identical. Integer sums have no
association issue and come straight off the device.

TPU notes:
- int64 is unavailable (jax x64 off), so the (chrom-id, position) key is
  sorted as a two-pass stable 32-bit lexsort (secondary key first).
  Positions fit int32 for all but giant-chromosome assemblies; the
  caller (pipeline/call_freq._add_block) routes blocks with positions
  past 2**31-1 to the host path.
- Padding rows carry a sentinel key larger than any real key, sort to
  the tail, and form segments past the real ones; callers slice to the
  real segment count.
- Through a remote-attached tunnel the per-dispatch latency usually
  exceeds the sort's host cost; the flag default is therefore the host
  path, and this module is for direct-attached rigs / huge runs.
"""
from __future__ import annotations

import functools

import numpy as np

_SENTINEL = np.int32(2**31 - 1)
_MIN_BLOCK = 8192


@functools.lru_cache(maxsize=1)
def _jitted():
    import jax
    import jax.numpy as jnp

    def _reduce(hi, lo, met):
        n = hi.shape[0]
        # lexicographic stable sort: secondary (lo) first, then primary
        o1 = jnp.argsort(lo, stable=True)
        order = o1[jnp.argsort(hi[o1], stable=True)]
        sk_hi = hi[order]
        sk_lo = lo[order]
        new = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            (sk_hi[1:] != sk_hi[:-1]) | (sk_lo[1:] != sk_lo[:-1])])
        seg = jnp.cumsum(new.astype(jnp.int32)) - 1
        cov = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), seg,
                                  num_segments=n)
        met_sum = jax.ops.segment_sum(met[order], seg, num_segments=n)
        return order.astype(jnp.int32), seg, cov, met_sum

    return jax.jit(_reduce)


def device_available() -> bool:
    try:
        import jax
        jax.devices()
        return True
    except Exception:
        return False


def sort_segment_reduce(hi: np.ndarray, lo: np.ndarray,
                        met: np.ndarray):
    """Sort rows by (hi, lo) key and segment-sum on the default device.

    Args: int32 arrays of equal length n (hi < 2**30; lo >= 0).
    Returns ``(order, seg, cov, met_sum, n_seg)`` as host int32/int64
    arrays: ``order`` is the stable sort permutation (file order kept
    within a key), ``seg[i]`` the segment id of sorted row i, ``cov``/
    ``met_sum`` per-segment exact integer sums, ``n_seg`` the number of
    real segments. All arrays are sliced to the real (unpadded) extent.
    """
    n = len(hi)
    if n == 0:
        return (np.empty(0, np.int32), np.empty(0, np.int32),
                np.empty(0, np.int32), np.empty(0, np.int32), 0)
    block = _MIN_BLOCK
    while block < n:
        block *= 2
    pad = block - n
    if pad:
        hi = np.concatenate([hi, np.full(pad, _SENTINEL, np.int32)])
        lo = np.concatenate([lo, np.full(pad, _SENTINEL, np.int32)])
        met = np.concatenate([met, np.zeros(pad, np.int32)])
    order, seg, cov, met_sum = (np.asarray(a) for a in _jitted()(
        hi, lo, met))
    order = order[:n]          # sentinel pads sort strictly last
    seg = seg[:n]
    n_seg = int(seg[-1]) + 1
    return order, seg, cov[:n_seg], met_sum[:n_seg], n_seg
