"""Pallas TPU kernel: fused one-hot expansion for the SNP matmul path.

The all-pairs SNP count is an int8 Gram matmul over one-hot base planes
(ops/snp_jax.py).  The matmul runs at ~93% of MXU int8 peak, but XLA's
expansion of packed u32 words into one-hot lanes costs more than the
matmul itself: the natural base-major column order ([word][base][plane])
makes XLA materialize cross-lane interleaves.

The Gram product is invariant under any column permutation applied to
both operands, so this kernel emits a *shift-major* layout instead —
for each of the 16 in-word base positions k and plane c, one contiguous
(rows, words) int8 segment equal to `((w >> (30-2k)) & 3 == c) & inc_k`.
Every segment is a pure elementwise function of the already-loaded u32
tile: zero cross-lane data movement, so the kernel runs at HBM write
bandwidth.  The include-mask plane M gets the matching [shift][word]
order, keeping shared-position counts aligned.

Counts are bit-for-bit identical to ops/snp_jax.snp_matrix (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 128   # sample rows per tile
WB = 512   # u32 words per tile (8192 bases)


def _expand_kernel_shared(seq_ref, pm_ref, x_ref):
    # no M output: under a shared mask the include plane is identical
    # for every sample, so npos comes from a popcount of the mask
    # words instead of an (n, 16W) buffer of duplicate rows
    w = seq_ref[:]                                  # (TI, WB) uint32
    pm = jnp.broadcast_to(pm_ref[:], w.shape)       # shared mask row
    for k in range(16):
        sh = jnp.uint32(30 - 2 * k)
        b = (w >> sh) & jnp.uint32(3)
        inc = (pm >> sh) & jnp.uint32(1)
        for c in range(4):
            x_ref[:, (k * 4 + c) * WB:(k * 4 + c + 1) * WB] = \
                ((b == c) & (inc == 1)).astype(jnp.int8)


def _expand_kernel_pairwise(seq_ref, pm_ref, x_ref, m_ref):
    w = seq_ref[:]
    pm = pm_ref[:]                                  # per-sample masks
    for k in range(16):
        sh = jnp.uint32(30 - 2 * k)
        b = (w >> sh) & jnp.uint32(3)
        inc = (pm >> sh) & jnp.uint32(1)
        m_ref[:, k * WB:(k + 1) * WB] = inc.astype(jnp.int8)
        for c in range(4):
            x_ref[:, (k * 4 + c) * WB:(k * 4 + c + 1) * WB] = \
                ((b == c) & (inc == 1)).astype(jnp.int8)


def available() -> bool:
    """True when the compiled TPU kernel path applies."""
    return jax.default_backend() == "tpu"


def _expand(seqs, masks, pairwise: bool):
    """(n, W) u32 + masks -> shift-major one-hot X (n, 64W) int8 and
    include plane M (n|1, 16W) int8."""
    n, W = seqs.shape
    assert n % TI == 0 and W % WB == 0, (n, W)
    grid = (n // TI, W // WB)
    seq_spec = pl.BlockSpec((TI, WB), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((TI, 64 * WB), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    # non-TPU backends run the kernel in the Pallas interpreter (used
    # by the CPU test suite; production CPU paths use ops/snp_jax or
    # ops/snp instead)
    interp = not available()
    if pairwise:
        X, M = pl.pallas_call(
            _expand_kernel_pairwise,
            grid=grid,
            in_specs=[seq_spec,
                      pl.BlockSpec((TI, WB), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=[x_spec,
                       pl.BlockSpec((TI, 16 * WB), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((n, 64 * W), jnp.int8),
                jax.ShapeDtypeStruct((n, 16 * W), jnp.int8),
            ],
            interpret=interp,
        )(seqs, masks)
        return X, M
    X = pl.pallas_call(
        _expand_kernel_shared,
        grid=grid,
        in_specs=[seq_spec,
                  pl.BlockSpec((1, WB), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n, 64 * W), jnp.int8),
        interpret=interp,
    )(seqs, masks)
    return X, None


def _matmul_counts(X, Y):
    return jax.lax.dot_general(X, Y, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _pad_w(a, wchunk):
    W = a.shape[-1]
    pad = (-W) % wchunk
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a, (W + pad) // wchunk


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix(seqs, paircmask, wchunk: int = 2048):
    """All-pairs SNP counts, shared mask — Pallas-expanded operands.

    Same contract and identical integer results as
    ops/snp_jax.snp_matrix.
    """
    n, _ = seqs.shape
    npadr = (-n) % TI
    if npadr:
        seqs = jnp.pad(seqs, ((0, npadr), (0, 0)))
    np_ = seqs.shape[0]
    seqs, nc = _pad_w(seqs, wchunk)
    pm, _ = _pad_w(paircmask[None, :], wchunk)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wchunk), (np_, wchunk))
        mblk = jax.lax.dynamic_slice(pm, (0, w * wchunk), (1, wchunk))
        X, _ = _expand(blk, mblk, pairwise=False)
        # include bits live at even positions of the pair mask
        npos_c = jax.lax.population_count(
            mblk & jnp.uint32(0x55555555)).sum(dtype=jnp.int32)
        return (c[0] + _matmul_counts(X, X),
                c[1] + npos_c.astype(jnp.int32)), None

    (matches, npos), _ = jax.lax.scan(
        body, (jnp.zeros((np_, np_), jnp.int32), jnp.int32(0)),
        jnp.arange(nc))
    return (npos - matches)[:n, :n]


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix_pairwise(seqs, incmasks, wchunk: int = 2048):
    """All-pairs (dist, shared) with per-sample masks — Pallas path.

    Same contract and identical integer results as
    ops/snp_jax.snp_matrix_pairwise.
    """
    n, _ = seqs.shape
    npadr = (-n) % TI
    if npadr:
        seqs = jnp.pad(seqs, ((0, npadr), (0, 0)))
        incmasks = jnp.pad(incmasks, ((0, npadr), (0, 0)))
    np_ = seqs.shape[0]
    seqs, nc = _pad_w(seqs, wchunk)
    incmasks, _ = _pad_w(incmasks, wchunk)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wchunk), (np_, wchunk))
        mblk = jax.lax.dynamic_slice(incmasks, (0, w * wchunk),
                                     (np_, wchunk))
        X, M = _expand(blk, mblk, pairwise=True)
        return (c[0] + _matmul_counts(X, X),
                c[1] + _matmul_counts(M, M)), None

    (matches, shared), _ = jax.lax.scan(
        body, (jnp.zeros((np_, np_), jnp.int32),
               jnp.zeros((np_, np_), jnp.int32)), jnp.arange(nc))
    return (shared - matches)[:n, :n], shared[:n, :n]
