"""Pallas TPU kernel: fused row-gather + Q-row minimum for the DNJ
batch scan.

The packed DNJ engine's hot loop (75% of device time at n=32768,
measured round 4 via jax.profiler) is the candidate-revalidation pass:
gather K data-dependent rows of the u32-packed u8 matrix, unpack,
compute the integer Q row q[c] = co*cell[c] - sD2[r] - sD2[c] over
c < r, and reduce to (row min, last-wins argmin).  XLA lowers the
(K, n) gather + compute + reduce at ~1/7 of the HBM/VPU roofline
(0.159 ms per 128x32768 pass); this kernel streams row blocks through
a scalar-prefetched BlockSpec index map and fuses unpack, Q and both
reductions in VMEM — the (K, n) intermediate never exists.

Mosaic-legality notes (the round-4 version failed TPU lowering — the
(1, W) input block and 1-D (1,) output blocks violate the (8, 128)
tiling rule):
  * the words buffer is viewed as (n//8, 8, W) and fetched in
    (1, 8, W) blocks (block index rows[k] // 8); the wanted row is
    picked in-kernel by an arithmetic one-hot over the 8 sublanes —
    an 8x over-read, but each pass is DMA'd at full HBM rate instead
    of XLA's 1/7-roofline gather formulation;
  * the per-row sD2[r] term is prefetched as a scalar (K,) SMEM
    operand instead of a dynamic VMEM element read;
  * outputs are (1, K) blocks resident across all grid steps; step k
    writes lane k by arithmetic one-hot accumulation (no dynamic
    stores, no boolean-vector relayouts).

Exactness: all arithmetic is int32 on exact integers, bit-identical
to the jnp formulation in tree/packed_engine.py (interpret-mode
parity: tests/test_scan_pallas.py; on-device: benchmarks/tpu_smoke.py
gates the round).

The argmin tie rule is the engine's last-wins: the LARGEST column
index achieving the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

IBIG = 2 ** 31 - 1


def _kernel(rows_ref, sdr_ref, co_ref, words_ref, sd2p_ref,
            rmin_ref, rarg_ref):
    k = pl.program_id(0)
    r = rows_ref[k]
    sd_r = sdr_ref[k]
    co = co_ref[0]
    big = jnp.int32(IBIG)
    # int32 bit-pattern view: Mosaic has no unsigned reductions, and
    # (x >> 8b) & 0xFF extracts byte b identically under arithmetic
    # and logical shifts
    w8 = jax.lax.bitcast_convert_type(words_ref[0],
                                      jnp.int32)    # (8, W)
    W = w8.shape[1]
    # arithmetic one-hot row pick over the 8 sublanes of the block
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (8, W), 0)
            == r % 8).astype(jnp.int32)
    w = (w8 * rsel).sum(axis=0, keepdims=True)      # (1, W)
    # all four byte lanes as a (4, W) q tile: q[b, wi] is column
    # 4*wi + b
    cell = jnp.concatenate(
        [(w >> (8 * b)) & 0xFF for b in range(4)], axis=0)  # (4, W)
    col = (4 * jax.lax.broadcasted_iota(jnp.int32, (4, W), 1)
           + jax.lax.broadcasted_iota(jnp.int32, (4, W), 0))
    q = co * cell - sd_r - sd2p_ref[:]
    ok = (col < r).astype(jnp.int32)                # c < r only
    qm = q * ok + big * (1 - ok)
    mn = qm.min()
    # last-wins argmin: largest column achieving the min (+1/-1 keeps
    # the non-min contribution at -1 < any real column)
    am = (((qm == mn).astype(jnp.int32) * (col + 1)).max() - 1)
    # lane-k one-hot write into the resident (1, K) output blocks
    lane = jax.lax.broadcasted_iota(jnp.int32, rmin_ref.shape, 1)
    sel = (lane == k).astype(jnp.int32)
    keep = 1 - sel
    rmin_ref[...] = rmin_ref[...] * keep + mn * sel
    rarg_ref[...] = rarg_ref[...] * keep + jnp.maximum(am, 0) * sel


@functools.partial(jax.jit, static_argnames=("interpret",))
def qrow_mins(rows, co, words, sd2, interpret: bool = False):
    """(rmin, rarg) int32 (K,) for the rows `rows` of the packed
    matrix.  rows: (K,) int32 (entries may repeat / be 0 for padding —
    mask the results by validity outside).  co: () int32 scalar.
    words: (n, W) uint32 (n % 8 == 0, W % 128 == 0).  sd2: (n,) int32
    row sums in u units."""
    K = rows.shape[0]
    n, W = words.shape
    assert n % 8 == 0 and W % 128 == 0, (n, W)
    rows = rows.astype(jnp.int32)
    words3 = words.reshape(n // 8, 8, W)            # layout bitcast
    sd2p = sd2_to_planes(sd2, W)
    sdr = sd2[rows]                                 # tiny XLA gather
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((1, 8, W), lambda k, rows_ref, *_:
                         (rows_ref[k] // 8, 0, 0)),
            pl.BlockSpec((4, W), lambda k, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, K), lambda k, *_: (0, 0)),
            pl.BlockSpec((1, K), lambda k, *_: (0, 0)),
        ],
    )
    rmin, rarg = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, K), jnp.int32),
                   jax.ShapeDtypeStruct((1, K), jnp.int32)],
        interpret=interpret,
    )(rows, sdr, jnp.asarray([co], jnp.int32), words3, sd2p)
    return rmin[0], rarg[0]


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
