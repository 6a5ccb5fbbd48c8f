"""TPU/JAX pairwise SNP-distance kernels over packed 2-bit sequences.

Host semantics (ops/snp.py; reference fsacmp.c:552-633) are reproduced
with an MXU-first formulation:

    matches(i,j) = X_i · X_j      X = one-hot(4 planes/base), masked
    shared(i,j)  = M_i · M_j      M = include-mask plane
    D(i,j)       = shared - matches

Both are int8 matmuls with int32 accumulation — the contraction runs on
the systolic array, which is the only unit that can amortize the
O(n² L) pair outer-product (elementwise XOR/popcount formulations
materialize (n, n, W) intermediates and drown in HBM traffic).  Counts
are exact: matches ≤ L < 2^31.

The genome axis is processed in chunks (``lax.fori_loop`` accumulating
the (n, n) Gram matrix), so peak memory is one (n, 64·Wc) int8 block —
the one-hot expansion never materializes fully.

Multi-chip: `sharded_snp_matrix` shards sample rows over a mesh axis;
jit/GSPMD inserts the all-gather of the opposing block over ICI.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WCHUNK = 2048  # u32 words (32768 bases) per accumulation chunk


def u64_to_u32(words64: np.ndarray) -> np.ndarray:
    """(W,) u64 -> (2W,) u32 preserving base order (hi first)."""
    hi = (words64 >> np.uint64(32)).astype(np.uint32)
    lo = (words64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = np.empty(2 * len(words64), np.uint32)
    out[0::2] = hi
    out[1::2] = lo
    return out


def inc32_to_pairmask(inc32: np.ndarray) -> np.ndarray:
    """Host: u32 include words (32 positions) -> u32 pair masks aligned
    with the u32 sequence words (16 positions each, bit 2k = include)."""
    hi = (inc32 >> np.uint32(16)).astype(np.uint32)
    lo = (inc32 & np.uint32(0xFFFF)).astype(np.uint32)
    out = np.empty(2 * len(inc32), np.uint32)
    out[0::2] = hi
    out[1::2] = lo
    x = out
    x = (x | (x << 8)) & np.uint32(0x00FF00FF)
    x = (x | (x << 4)) & np.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & np.uint32(0x33333333)
    x = (x | (x << 1)) & np.uint32(0x55555555)
    return x


def _onehot_planes(seqs: jnp.ndarray, pairmask: jnp.ndarray):
    """(n, W) u32 packed words + (n|1, W) u32 pair masks ->
    (n, W*64) int8 one-hot X and (n, W*16) int8 include plane M.

    Word layout (qseq2nibble, qseqs.c:60-88): base k of a word sits at
    bits (30-2k, 31-2k); its include bit is pair-mask bit (30-2k).
    """
    shifts = jnp.arange(15, -1, -1, dtype=jnp.uint32) * 2  # [30, ..., 0]
    b = (seqs[..., None] >> shifts) & jnp.uint32(3)
    inc = (pairmask[..., None] >> shifts) & jnp.uint32(1)
    inc = jnp.broadcast_to(inc, b.shape)
    planes = (b[..., None] == jnp.arange(4, dtype=jnp.uint32)) \
        & (inc[..., None] != 0)
    n = seqs.shape[0]
    X = planes.astype(jnp.int8).reshape(n, -1)
    M = inc.astype(jnp.int8).reshape(n, -1)
    return X, M


def _matmul_counts(X: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dot_general(
        X, Y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _pad_w(a, wchunk):
    W = a.shape[-1]
    pad = (-W) % wchunk
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a, (W + pad) // wchunk


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix(seqs: jnp.ndarray, paircmask: jnp.ndarray,
               wchunk: int = WCHUNK) -> jnp.ndarray:
    """All-pairs SNP counts under a shared include mask (fsacmp).

    seqs: (n, W) uint32; paircmask: (W,) uint32 pair mask.  Returns
    (n, n) int32 distances.
    """
    n, _ = seqs.shape
    seqs, nc = _pad_w(seqs, wchunk)
    pm, _ = _pad_w(paircmask[None, :], wchunk)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wchunk), (n, wchunk))
        mblk = jax.lax.dynamic_slice(pm, (0, w * wchunk), (1, wchunk))
        X, M = _onehot_planes(blk, mblk)
        return (c[0] + _matmul_counts(X, X),
                c[1] + M[0].astype(jnp.int32).sum(dtype=jnp.int32)), None

    (matches, npos), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), jnp.int32), jnp.int32(0)),
        jnp.arange(nc))
    return npos - matches


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix_pairwise(seqs: jnp.ndarray, incmasks: jnp.ndarray,
                        wchunk: int = WCHUNK):
    """All-pairs (dist, shared) with per-sample include masks
    (pairwise-mask mode, proxi == 0: pair mask = AND of both masks,
    fsacmpthrd.c:409-416).

    seqs: (n, W) u32; incmasks: (n, W) u32 pair-expanded masks.
    Returns (D, N) int32 matrices.
    """
    n, _ = seqs.shape
    seqs, nc = _pad_w(seqs, wchunk)
    incmasks, _ = _pad_w(incmasks, wchunk)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wchunk), (n, wchunk))
        mblk = jax.lax.dynamic_slice(incmasks, (0, w * wchunk),
                                     (n, wchunk))
        X, M = _onehot_planes(blk, mblk)
        return (c[0] + _matmul_counts(X, X),
                c[1] + _matmul_counts(M, M)), None

    (matches, shared), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), jnp.int32),
               jnp.zeros((n, n), jnp.int32)), jnp.arange(nc))
    return shared - matches, shared


def matmul_snp_matrix(seqs_onehot: jnp.ndarray, n_included: int):
    """Direct MXU entry for pre-built one-hot matrices."""
    return n_included - _matmul_counts(seqs_onehot, seqs_onehot)


def sharded_snp_matrix(seqs: np.ndarray, paircmask: np.ndarray,
                       mesh: Mesh, axis: str = "d") -> np.ndarray:
    """Multi-chip all-pairs SNP counts: sample rows sharded over `axis`;
    XLA all-gathers the opposing operand block over ICI."""
    n, W = seqs.shape
    ndev = mesh.shape[axis]
    npad = -(-n // ndev) * ndev
    seqs_p = np.zeros((npad, W), np.uint32)
    seqs_p[:n] = seqs
    sharding = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())
    sd = jax.device_put(seqs_p, sharding)
    pm = jax.device_put(paircmask, rep)

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P(axis, None)))
    def compute(sd, pm):
        X, M = _onehot_planes(sd, pm[None, :])
        matches = _matmul_counts(X, X)
        npos = M[0].astype(jnp.int32).sum(dtype=jnp.int32)
        return npos - matches

    return np.asarray(compute(sd, pm))[:n, :n]
