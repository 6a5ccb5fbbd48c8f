"""Pallas TPU kernel: fused row-gather + Q-row minimum for the DNJ
batch scan.

The packed DNJ engine's hot loop (75% of device time at n=32768,
measured round 4 via jax.profiler) is the candidate-revalidation pass:
gather K data-dependent rows of the u32-packed u8 matrix, unpack,
compute the integer Q row q[c] = co*cell[c] - sD2[r] - sD2[c] over
c < r, and reduce to (row min, last-wins argmin).  XLA lowers the
(K, n) gather + compute + reduce at ~1/7 of the HBM/VPU roofline
(0.159 ms per 128x32768 pass); this kernel streams each row block
through a scalar-prefetched BlockSpec index map (one (1, W) DMA per
grid step, double-buffered by the pipeline) and fuses unpack, Q and
both reductions in VMEM — the (K, n) intermediate never exists.

Exactness: all arithmetic is int32 on exact integers, bit-identical
to the jnp formulation in tree/packed_engine.py (tested in
interpret mode and on device against the reference expression).

Layout note: sD2 is consumed as four byte-lane planes (4, W) int32
with plane b holding sD2[4*wi + b], so the kernel's per-lane Q uses
plain elementwise ops — no in-kernel gather.  The argmin tie rule is
the engine's last-wins: the LARGEST column index achieving the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kernel(rows_ref, co_ref, words_ref, sd2p_ref, rmin_ref, rarg_ref):
    big = jnp.int32(2 ** 31 - 1)
    k = pl.program_id(0)
    r = rows_ref[k]
    co = co_ref[0]
    W = words_ref.shape[1]
    w = words_ref[0, :].reshape(1, W)
    wi4 = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) * 4
    sd_r = sd2p_ref[r % 4, r // 4]
    mn = big
    am = jnp.int32(-1)
    for b in range(4):
        cell = ((w >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)) \
            .astype(jnp.int32)
        col = wi4 + b
        q = co * cell - sd_r - sd2p_ref[b, :].reshape(1, W)
        q = jnp.where(col < r, q, big)
        bmn = q.min()
        barg = jnp.where(q == bmn, col, -1).max()
        take = (bmn < mn) | ((bmn == mn) & (barg > am))
        am = jnp.where(take, barg, am)
        mn = jnp.where(take, bmn, mn)
    rmin_ref[k] = mn
    rarg_ref[k] = jnp.where(am < 0, 0, am)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qrow_mins(rows, co, words, sd2_planes, interpret: bool = False):
    """(rmin, rarg) int32 (K,) for the rows `rows` of the packed
    matrix.  rows: (K,) int32 (entries may repeat / be 0 for padding —
    mask the results by validity outside).  co: () int32 scalar.
    words: (n, W) uint32.  sd2_planes: (4, W) int32 byte-lane view of
    sD2 (use `sd2_to_planes`)."""
    K = rows.shape[0]
    n, W = words.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, W), lambda k, rows_ref, co_ref:
                         (rows_ref[k], 0)),
            pl.BlockSpec((4, W), lambda k, rows_ref, co_ref: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1,), lambda k, rows_ref, co_ref: (k,)),
            pl.BlockSpec((1,), lambda k, rows_ref, co_ref: (k,)),
        ],
    )
    rmin, rarg = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((K,), jnp.int32),
                   jax.ShapeDtypeStruct((K,), jnp.int32)],
        interpret=interpret,
    )(rows.astype(jnp.int32), jnp.asarray([co], jnp.int32), words,
      sd2_planes)
    return rmin, rarg


def sd2_to_planes(sd2, W):
    """(n,) int32 -> (4, W) byte-lane planes (plane b, word wi) =
    sd2[4*wi + b]."""
    return sd2.reshape(W, 4).T


def available() -> bool:
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False
