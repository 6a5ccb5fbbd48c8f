"""Pallas TPU kernel: shift-major ±1 3-Gram expansion + triangular
row-block Gram dots for the all-pairs SNP count.

The all-pairs SNP count is an int8 Gram matmul over signed base codes
(three ±1 planes per position, code·code = 4·[equal] − 1 — see
_signed_planes; reference kernel fsacmp.c:552-633).  This is 0.75x the
MACs and bytes of the 4-plane one-hot formulation shipped in round 3.  Two
measured facts (round 3, v5e) shape this design:

  * XLA's int8 dot runs at ~183 T-MACs/s (93% of the 197 T-MAC int8
    peak); a Pallas/Mosaic `dot_general` on the same int8 operands
    reaches only ~93 T-MACs/s (half rate) — so the contraction belongs
    to XLA, not to a fused Pallas kernel.
  * XLA's own one-hot expansion materializes cross-lane interleaves;
    the Pallas expansion kernel below emits a *shift-major* layout
    ([shift][plane][word] segments, pure elementwise per u32 tile) and
    runs at HBM write bandwidth.  The Gram product is invariant under
    any column permutation applied to both operands, so the layout is
    free.

The Gram matrix is symmetric, so the matmul enumerates only
lower-triangular row blocks: per genome chunk, block i contracts
against blocks 0..i in one (B, K) x (K, (i+1)B) dot — 0.5 + 1/(2*nblk)
of the full-Gram MACs.  The caller mirrors the lower triangle.

Counts are bit-for-bit identical to ops/snp_jax.snp_matrix /
snp_matrix_pairwise (tested; integer accumulation throughout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 128   # sample rows per expansion tile
WB = 512   # u32 words per expansion tile (8192 bases)
BLK = 512  # row-block height of the triangular Gram dots


def _signed_planes(w, inc, k):
    """±1 3-Gram base code for shift k: three int8 planes (s1, s0,
    s1*s0) with s = 1-2*bit, zeroed where the position is excluded.

    For two coded positions x, y: code(x)·code(y) = 4*[x == y] - 1, so
    a Gram dot G over the 3-plane layout gives matches = (G + npos)/4 —
    0.75x the MACs and expansion bytes of the 4-plane one-hot
    (VERDICT r3 item 9's proposed reformulation).

    Purely arithmetic (no boolean-vector selects): the round-4
    jnp.where formulation produced vector<i1> masks whose relayout
    Mosaic cannot compile ("Invalid relayout ... vector<128x512xi1>",
    BENCH_r04).  s*g and (s*g)*(s*g) = s1*s0*g give the zeroing for
    free since g is 0/1."""
    sh = jnp.uint32(30 - 2 * k)
    b = ((w >> sh) & jnp.uint32(3)).astype(jnp.int32)
    g = ((inc >> sh) & jnp.uint32(1)).astype(jnp.int32)
    b1 = (b >> 1) & 1
    b0 = b & 1
    p1 = (1 - 2 * b1) * g
    p0 = (1 - 2 * b0) * g
    return (p1.astype(jnp.int8), p0.astype(jnp.int8),
            (p1 * p0).astype(jnp.int8))


def _expand_kernel_shared(seq_ref, pm_ref, x_ref):
    # no M output: under a shared mask the include plane is identical
    # for every sample, so npos comes from a popcount of the mask
    # words instead of an (n, 16W) buffer of duplicate rows
    w = seq_ref[:]                                  # (TI, WB) uint32
    pm = jnp.broadcast_to(pm_ref[:], w.shape)       # shared mask row
    for k in range(16):
        for c, plane in enumerate(_signed_planes(w, pm, k)):
            x_ref[:, (k * 3 + c) * WB:(k * 3 + c + 1) * WB] = plane


def _expand_kernel_pairwise(seq_ref, pm_ref, x_ref, m_ref):
    w = seq_ref[:]
    pm = pm_ref[:]                                  # per-sample masks
    for k in range(16):
        sh = jnp.uint32(30 - 2 * k)
        inc = (pm >> sh) & jnp.uint32(1)
        m_ref[:, k * WB:(k + 1) * WB] = inc.astype(jnp.int8)
        for c, plane in enumerate(_signed_planes(w, pm, k)):
            x_ref[:, (k * 3 + c) * WB:(k * 3 + c + 1) * WB] = plane


def available() -> bool:
    """True when the compiled TPU kernel path applies."""
    return jax.default_backend() == "tpu"


def _expand(seqs, masks, pairwise: bool):
    """(n, W) u32 + masks -> shift-major ±1 3-Gram X (n, 48W) int8 and
    include plane M (n|1, 16W) int8."""
    n, W = seqs.shape
    assert n % TI == 0 and W % WB == 0, (n, W)
    grid = (n // TI, W // WB)
    seq_spec = pl.BlockSpec((TI, WB), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((TI, 48 * WB), lambda i, j: (i, j),
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
                jax.ShapeDtypeStruct((n, 48 * W), jnp.int8),
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
        out_shape=jax.ShapeDtypeStruct((n, 48 * W), jnp.int8),
        interpret=interp,
    )(seqs, masks)
    return X, None


def _tri_dot_acc(acc, X, nblk, B):
    """acc += lower-triangular row-block Gram of X: block i contracts
    against blocks 0..i in one XLA int8 dot (full MXU rate); the upper
    triangle of acc is never touched."""
    for i in range(nblk):
        Xi = jax.lax.slice_in_dim(X, i * B, (i + 1) * B)
        Xj = jax.lax.slice_in_dim(X, 0, (i + 1) * B)
        part = jax.lax.dot_general(Xi, Xj, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (i * B, 0), (B, (i + 1) * B))
            + part,
            (i * B, 0))
    return acc


def _mirror_tril(G):
    """Rebuild the full symmetric matrix from the computed lower
    triangle (upper blocks were never written)."""
    return jnp.tril(G) + jnp.tril(G, -1).T


def _pad_rows(a, B):
    pad = (-a.shape[0]) % B
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
    return a


def _pad_w(a, wchunk):
    W = a.shape[-1]
    pad = (-W) % wchunk
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a, (W + pad) // wchunk


def _chunk_words(npad: int, wchunk: int | None) -> int:
    """Words per accumulation chunk: keep the expanded X chunk
    (npad x 48*wc int8) around ~512 MiB, in WB multiples."""
    if wchunk is not None:
        return max(WB, (wchunk // WB) * WB)
    wc = (512 * 1024 * 1024) // (48 * npad)
    return int(max(WB, min(2048, (wc // WB) * WB)))


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix(seqs, paircmask, wchunk: int | None = None):
    """All-pairs SNP counts, shared mask — Pallas expansion +
    triangular XLA Gram dots.

    Same contract and identical integer results as
    ops/snp_jax.snp_matrix.
    """
    n, _ = seqs.shape
    B = BLK if n > BLK else max(TI, -(-n // TI) * TI)
    seqs = _pad_rows(seqs, B)
    np_ = seqs.shape[0]
    nblk = np_ // B
    wc = _chunk_words(np_, wchunk)
    seqs, nc = _pad_w(seqs, wc)
    pm, _ = _pad_w(paircmask[None, :], wc)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wc), (np_, wc))
        mblk = jax.lax.dynamic_slice(pm, (0, w * wc), (1, wc))
        X, _ = _expand(blk, mblk, pairwise=False)
        # include bits live at even positions of the pair mask
        npos_c = jax.lax.population_count(
            mblk & jnp.uint32(0x55555555)).sum(dtype=jnp.int32)
        return (_tri_dot_acc(c[0], X, nblk, B),
                c[1] + npos_c.astype(jnp.int32)), None

    (gram, npos), _ = jax.lax.scan(
        body, (jnp.zeros((np_, np_), jnp.int32), jnp.int32(0)),
        jnp.arange(nc))
    # ±1 3-Gram: G = 4*matches - npos  =>  dist = npos - matches
    #          = (3*npos - G) / 4  (exact integer division)
    return ((3 * npos - _mirror_tril(gram)) // 4)[:n, :n]


@functools.partial(jax.jit, static_argnames=("wchunk",))
def snp_matrix_pairwise(seqs, incmasks, wchunk: int | None = None):
    """All-pairs (dist, shared) with per-sample masks — Pallas
    expansion + triangular XLA Gram dots.

    Same contract and identical integer results as
    ops/snp_jax.snp_matrix_pairwise.
    """
    n, _ = seqs.shape
    B = BLK if n > BLK else max(TI, -(-n // TI) * TI)
    seqs = _pad_rows(seqs, B)
    incmasks = _pad_rows(incmasks, B)
    np_ = seqs.shape[0]
    nblk = np_ // B
    wc = _chunk_words(np_, wchunk)
    seqs, nc = _pad_w(seqs, wc)
    incmasks, _ = _pad_w(incmasks, wc)

    def body(c, w):
        blk = jax.lax.dynamic_slice(seqs, (0, w * wc), (np_, wc))
        mblk = jax.lax.dynamic_slice(incmasks, (0, w * wc), (np_, wc))
        X, M = _expand(blk, mblk, pairwise=True)
        return (_tri_dot_acc(c[0], X, nblk, B),
                _tri_dot_acc(c[1], M, nblk, B)), None

    (gram, shared), _ = jax.lax.scan(
        body, (jnp.zeros((np_, np_), jnp.int32),
               jnp.zeros((np_, np_), jnp.int32)), jnp.arange(nc))
    shared = _mirror_tril(shared)
    # dist = shared - matches = (3*shared - G) / 4, exact in integers
    dist = (3 * shared - _mirror_tril(gram)) // 4
    return dist[:n, :n], shared[:n, :n]
