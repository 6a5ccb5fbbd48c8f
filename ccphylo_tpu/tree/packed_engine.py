"""Blocked, u32-packed quantized DNJ — the 100k-taxa single-chip engine.

Reference scaling tools for huge runs are u8/u16 ByteScale matrices and
mmap out-of-core storage (matrix.c:116, bytescale.h:22-23, dnj.c:1054).
TPU-native equivalent: the quantized (u8) distance matrix lives in HBM
as **uint32 words, four cells per word**, split into `nb` row blocks
that are separate HBM buffers.  This dodges two axon/libtpu runtime
faults measured in round 1 (NOTES.md): narrow-dtype (u8/u16) buffers
crash the worker above ~24-49k taxa, and single buffers above 4 GiB
crash it above ~32k f32 taxa.  Packed-u32 blocked storage keeps every
buffer wide-dtype and ≤ ~1.3 GiB at n=100352 (u8 cells: n^2 bytes
total = 10.1 GB across 8 blocks on a 16 GB chip).

Join semantics are identical to tree/jax_engine.dnj_joins_q (complete
matrix, dtouc(d, 0.25) update quantization per nj.c:905, unquantized sD
bookkeeping per nj.c:907-911, scan="batch" revalidation with the
reference's last-wins tie rules) — with matching compute dtype the two
engines produce bit-identical join records, which is how this file is
tested.  Packing/unpacking is pure VPU shift/mask arithmetic; row scans
move 1/4 the HBM bytes of the f32 engine.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

import math

from ..io.qseqs import Name  # noqa: F401 (API type)
from ..ops.select import topk_mask_indices
from .jax_engine import _records_to_newick
from .segmenting import run_segmented


def _pad_packed(n: int, nb: int) -> int:
    """Rows padded so npad is a multiple of both 512 and 128*nb (any
    nb, not just powers of two — the lcm handles e.g. nb=3)."""
    mult = math.lcm(512, 128 * nb)
    return max(-(-n // mult) * mult, mult)


def _unpack_words(w):
    """(..., W) uint32 -> (..., 4W) uint32 byte values (little-endian
    lanes: cell 4k+b is byte b of word k)."""
    ff = jnp.uint32(0xFF)
    b = jnp.stack([(w >> jnp.uint32(s)) & ff for s in (0, 8, 16, 24)],
                  axis=-1)
    return b.reshape(*w.shape[:-1], w.shape[-1] * 4)


def _pack_bytes(v):
    """(..., 4W) uint32 byte values -> (..., W) uint32 words."""
    r = v.reshape(*v.shape[:-1], v.shape[-1] // 4, 4)
    return (r[..., 0] | (r[..., 1] << jnp.uint32(8))
            | (r[..., 2] << jnp.uint32(16))
            | (r[..., 3] << jnp.uint32(24)))


def _mk_one_join_packed(nb, R, W, m, bytescale, compute_dtype,
                        neg_limbs):
    """one_join body over u32-packed row-blocked storage; m/bytescale
    are traced scalars closed over."""
    n = nb * R
    dtype = jnp.dtype(compute_dtype)
    big = jnp.asarray(np.finfo(dtype).max, dtype)
    idx = jnp.arange(n)
    bs = jnp.asarray(bytescale, dtype)
    inv = jnp.asarray(1.0, dtype) / bs
    ff = jnp.uint32(0xFF)

    def deq(byte_vals):
        return byte_vals.astype(dtype) * inv

    def quant_bytes(d, rnd):
        # dtouc(d, rnd) (bytescale.h:22): C float->uint truncation,
        # clamped at the u8 cap instead of wrapping
        return jnp.clip(jnp.floor(d * bs + rnd), 0, 255) \
            .astype(jnp.uint32)

    def read_row_words(blocks, r):
        """Global row r -> (W,) uint32 words (one block gathers)."""
        def mk(b):
            def f():
                return jax.lax.dynamic_slice(
                    blocks[b], (r - b * R, jnp.int32(0)), (1, W))[0]
            return f
        return jax.lax.switch(r // R, [mk(b) for b in range(nb)])

    def write_row_words(blocks, r, words, gate):
        out = []
        for b in range(nb):
            lw = jnp.where(gate & (r // R == b), r - b * R, R)
            out.append(blocks[b].at[lw].set(words, mode="drop"))
        return tuple(out)

    def read_col_words(blocks, jw):
        """Word column jw -> (n,) uint32 (cells 4jw..4jw+3 per row)."""
        return jnp.concatenate([
            jax.lax.dynamic_slice(blocks[b], (jnp.int32(0), jw), (R, 1))
            [:, 0] for b in range(nb)])

    def write_col_words(blocks, jw, vals):
        out = []
        for b in range(nb):
            seg = jax.lax.dynamic_slice_in_dim(vals, b * R, R)[:, None]
            out.append(jax.lax.dynamic_update_slice(
                blocks[b], seg, (jnp.int32(0), jw)))
        return tuple(out)

    def gather_rows(blocks, r):
        """Rows r (K,) global -> (K, W) words, same global-descending
        semantics as dnj_joins_q's fused gather."""
        K = r.shape[0]
        acc = jnp.zeros((K, W), jnp.uint32)
        for b in range(nb):
            own = (r // R) == b
            lr = jnp.where(own, r - b * R, 0)
            acc = jnp.where(own[:, None], blocks[b][lr], acc)
        return acc

    def last_min(q):
        mn = q.min()
        return mn, jnp.where(q == mn, idx, -1).max().astype(jnp.int32)

    KB = 128

    def one_join(t, carry):
        blocks, sD, Q, P, seed, I, J, LI, LJ = carry
        m_t = m - t
        mt = jnp.asarray(m_t - 2, dtype)

        seed_ok = (seed != 0) & (Q[seed] != big)
        minv0 = jnp.where(seed_ok, Q[seed], big)
        pi0 = jnp.where(seed_ok, seed, 0)
        pj0 = jnp.where(seed_ok, P[seed], 0)

        def cand_mask(Q, minv):
            return (idx >= 1) & (idx < m_t) & (Q < minv)

        def bcond(c):
            return cand_mask(c[3], c[0]).any()

        def bbody(c):
            minv, pi, pj, Q, P = c
            cm = cand_mask(Q, minv)
            rows = topk_mask_indices(cm, idx, KB)
            valid = rows >= 1
            r = jnp.where(valid, rows, 0)
            Drows = deq(_unpack_words(gather_rows(blocks, r)))
            q = mt * Drows - sD[r][:, None] - sD[None, :]
            ok = idx[None, :] < r[:, None]
            q = jnp.where(ok, q, big)
            rmin = q.min(axis=1)
            rarg = jnp.where(q == rmin[:, None], idx[None, :], -1) \
                .max(axis=1).astype(jnp.int32)
            # C-exact cache gating (see jax_engine.dnj_joins batch_scan)
            rminv = jnp.where(valid, rmin, big)
            rm = jax.lax.cummin(
                jnp.concatenate([minv[None], rminv[:-1]]))
            reval = valid & (Q[r] < rm)
            tgt = jnp.where(reval, rows, n)
            Q = Q.at[tgt].set(jnp.where(reval, rmin, big), mode="drop")
            P = P.at[tgt].set(jnp.where(reval, rarg, 0), mode="drop")
            bvals = jnp.where(valid, rmin, big)
            bmin = bvals.min()
            bi = jnp.where(bvals == bmin, rows, -1).max() \
                .astype(jnp.int32)
            karg = jnp.where((bvals == bmin) & (rows == bi), rarg, 0) \
                .max().astype(jnp.int32)
            better = bmin < minv
            return (jnp.where(better, bmin, minv),
                    jnp.where(better, bi, pi),
                    jnp.where(better, karg, pj), Q, P)

        minv, pi, pj, Q, P = jax.lax.while_loop(
            bcond, bbody, (minv0, pi0, pj0, Q, P))
        hp = (pi != 0) | (pj != 0)
        i, j = pi, pj

        rowi_w = read_row_words(blocks, i)
        rowj_w = read_row_words(blocks, j)
        rowi = deq(_unpack_words(rowi_w))
        rowj = deq(_unpack_words(rowj_w))
        D_ij = rowi[j]

        Ni = jnp.asarray(m_t - 2, dtype)  # complete: N_k = m_t
        delta = jnp.where(Ni > 0, (sD[i] - D_ij) / jnp.maximum(Ni, 1)
                          - (sD[j] - D_ij) / jnp.maximum(Ni, 1), 0.0)
        Li = jnp.where(Ni > 0, (D_ij + delta) / 2, D_ij / 2)
        Lj = jnp.where(Ni > 0, (D_ij - delta) / 2, D_ij / 2)
        if not neg_limbs:
            Li_c = jnp.where(Li < 0, 0.0, jnp.where(Lj < 0, D_ij, Li))
            Lj_c = jnp.where(Li < 0, D_ij, jnp.where(Lj < 0, 0.0, Lj))
            Li, Lj = Li_c, Lj_c

        # updateD, complete-matrix both-path only (nj.c:893-948)
        active = idx < m_t
        valid_k = active & (idx != i) & (idx != j) & hp
        d_new = jnp.maximum((rowi + rowj - D_ij) / 2, 0.0)
        sD = jnp.where(valid_k, sD - (rowi + rowj - d_new), sD)
        sD = sD.at[j].set(jnp.where(
            hp, jnp.cumsum(jnp.where(valid_k, d_new, 0),
                           dtype=dtype)[-1], sD[j]))
        q_new = quant_bytes(d_new, 0.25)                  # (n,) u32
        rowj_bytes = jnp.where(valid_k, q_new, _unpack_words(rowj_w))
        rowj_w_new = _pack_bytes(rowj_bytes)
        blocks = write_row_words(blocks, j, rowj_w_new, hp)
        # column j: byte lane j%4 of word column j//4
        jw = j // 4
        sh = (jnp.uint32(8) * (j % 4).astype(jnp.uint32))
        colw = read_col_words(blocks, jw)
        keep = ~(ff << sh)
        colw_new = jnp.where(valid_k & hp,
                             (colw & keep) | (q_new << sh), colw)
        blocks = write_col_words(blocks, jw, colw_new)

        # cache repair for column j + fresh row j (reads see quantized;
        # post-updateD N = m_t - 1 -> (N_j + N_k - 4) >> 1 = m_t - 3)
        mt_post = jnp.asarray(m_t - 3, dtype)
        rowj_post = deq(rowj_bytes)
        qj = mt_post * rowj_post - sD[j] - sD
        qj = jnp.where(idx < j, qj, big)
        Qj, Pj = last_min(qj)
        Q = Q.at[j].set(jnp.where(hp, Qj, Q[j]))
        P = P.at[j].set(jnp.where(hp, jnp.where(Qj == big, 0, Pj),
                                  P[j]))
        colj = deq((colw_new >> sh) & ff)
        qcol = mt_post * colj - sD[j] - sD
        colk = valid_k & (idx > j)
        upd = colk & (qcol <= Q)
        Q = jnp.where(upd, qcol, Q)
        P = jnp.where(upd, j, P)
        mq = jnp.where(upd, qcol, big).min()
        mi_cand = jnp.where(upd.any() & (mq <= Qj),
                            jnp.where(upd & (qcol == mq), idx, -1).max(),
                            j).astype(jnp.int32)

        # popArrange: move row `last` into slot i (dnj.c:817-975)
        m_new = m_t - 1
        last = m_new
        g = hp & (i != last)
        move_bytes = _unpack_words(read_row_words(blocks, last))
        rowi_old_bytes = _unpack_words(rowi_w)
        newrow_i = jnp.where(idx == i, jnp.uint32(0), move_bytes)
        rowi_bytes = jnp.where(g, newrow_i, rowi_old_bytes)
        blocks = write_row_words(blocks, i, _pack_bytes(rowi_bytes), hp)
        iw = i // 4
        shi = (jnp.uint32(8) * (i % 4).astype(jnp.uint32))
        colwi = read_col_words(blocks, iw)
        keepi = ~(ff << shi)
        colwi_new = jnp.where(g, (colwi & keepi) | (newrow_i << shi),
                              colwi)
        blocks = write_col_words(blocks, iw, colwi_new)
        sD = sD.at[i].set(jnp.where(g, sD[last], sD[i]))
        rowi_post = deq(rowi_bytes)
        qi = mt_post * rowi_post - sD[i] - sD
        qi = jnp.where(idx < i, qi, big)
        Qi, Pi = last_min(qi)
        Q = Q.at[i].set(jnp.where(g, Qi, Q[i]))
        P = P.at[i].set(jnp.where(g, jnp.where(Qi == big, 0, Pi),
                                  P[i]))
        coli = deq((colwi_new >> shi) & ff)
        qc = mt_post * coli - sD[i] - sD
        ck = (idx > i) & (idx < last) & g
        u2 = ck & (qc <= Q)
        Q = jnp.where(u2, qc, Q)
        P = jnp.where(u2, i, P)
        mq2 = jnp.where(u2, qc, big).min()
        p2 = jnp.where(u2.any() & (mq2 <= Qi),
                       jnp.where(u2 & (qc == mq2), idx, -1).max(), i) \
            .astype(jnp.int32)
        mj_cand = jnp.where(g, p2, 0)
        Q = Q.at[last].set(big)

        seed_new = jnp.where(
            mj_cand == m_new, mi_cand,
            jnp.where(mi_cand == m_new, mj_cand,
                      jnp.where((Q[mj_cand] < Q[mi_cand])
                                | ((mi_cand < mj_cand)
                                   & (Q[mj_cand] == Q[mi_cand])),
                                mj_cand, mi_cand)))
        seed = jnp.where(hp, seed_new, 0)

        I = I.at[t].set(jnp.where(hp, i, 0))
        J = J.at[t].set(jnp.where(hp, j, 0))
        LI = LI.at[t].set(jnp.where(hp, Li, -1.0))
        LJ = LJ.at[t].set(jnp.where(hp, Lj, -1.0))
        return blocks, sD, Q, P, seed, I, J, LI, LJ

    return one_join


@functools.partial(jax.jit, static_argnames=("compute_dtype", "n"))
def _init_sd_block(block, m, bytescale, row0, n, compute_dtype):
    """Per-block initSummaD pass.  One block per XLA program: a
    non-donated buffer threaded through a while loop gets a defensive
    copy (measured: all 8 blocks copied at once in a whole-matrix init,
    8 x 1.17 GiB -> 19.2 GB, compile-time OOM at n=100352); per-block
    programs bound the transient to a single block."""
    R, W = block.shape
    dtype = jnp.dtype(compute_dtype)
    idx = jnp.arange(n)
    inv = jnp.asarray(1.0, dtype) / jnp.asarray(bytescale, dtype)
    active0 = idx < m
    CH = next(c for c in (512, 256, 128) if R % c == 0)
    nch = R // CH

    def _sd_chunk(_, c):
        rows = row0 + c * CH + jnp.arange(CH)
        Drows = _unpack_words(jax.lax.dynamic_slice(
            block, (c * CH, 0), (CH, W))).astype(dtype) * inv
        v = active0[None, :] & (rows[:, None] != idx[None, :])
        # sequential accumulation order (initSummaD, nj.c:111-180)
        return None, jnp.cumsum(jnp.where(v, Drows, 0),
                                axis=1, dtype=dtype)[:, -1]

    _, sDb = jax.lax.scan(_sd_chunk, None, jnp.arange(nch))
    return sDb.reshape(R)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "n"))
def _init_qp_block(block, sD, m, bytescale, row0, n, compute_dtype):
    """Per-block initHNJ row-cache pass (see _init_sd_block)."""
    R, W = block.shape
    dtype = jnp.dtype(compute_dtype)
    big = jnp.asarray(np.finfo(dtype).max, dtype)
    idx = jnp.arange(n)
    inv = jnp.asarray(1.0, dtype) / jnp.asarray(bytescale, dtype)
    active0 = idx < m
    CH = next(c for c in (512, 256, 128) if R % c == 0)
    nch = R // CH
    mt0 = (m - 2).astype(dtype)

    def _qp_chunk(_, c):
        rows = row0 + c * CH + jnp.arange(CH)
        Drows = _unpack_words(jax.lax.dynamic_slice(
            block, (c * CH, 0), (CH, W))).astype(dtype) * inv
        lv = (active0[rows][:, None] & active0[None, :]
              & (idx[None, :] < rows[:, None]))
        Qm = jnp.where(lv, mt0 * Drows - sD[rows][:, None]
                       - sD[None, :], big)
        Qc = Qm.min(axis=1)
        # initHNJ tie rule (hclust.c:110-116)
        cand = lv & (Qm == Qc[:, None])
        dmask = jnp.where(cand, Drows, big)
        prefmin = jax.lax.cummin(dmask, axis=1)
        sel = cand & (dmask == prefmin)
        Pc = jnp.where(sel, idx[None, :], -1).max(axis=1) \
            .astype(jnp.int32)
        return None, (Qc, jnp.maximum(Pc, 0))

    _, (Qb, Pb) = jax.lax.scan(_qp_chunk, None, jnp.arange(nch))
    return Qb.reshape(R), Pb.reshape(R)


def _packed_init(blocks, m, bytescale, compute_dtype=jnp.float32):
    """initSummaD + initHNJ + seed over packed blocked storage
    (complete matrix: N_k = m for every row).  Host-sequenced
    per-block device programs — see _init_sd_block for why."""
    nb = len(blocks)
    R, _ = blocks[0].shape
    n = nb * R
    dtype = jnp.dtype(compute_dtype)

    sD = jnp.concatenate([
        _init_sd_block(blocks[b], m, bytescale, jnp.int32(b * R), n=n,
                       compute_dtype=compute_dtype) for b in range(nb)])
    qp = [_init_qp_block(blocks[b], sD, m, bytescale, jnp.int32(b * R),
                         n=n, compute_dtype=compute_dtype)
          for b in range(nb)]
    Q = jnp.concatenate([q for q, _ in qp])
    P = jnp.concatenate([p for _, p in qp])

    @jax.jit
    def _seed(Q, P, m):
        big = jnp.asarray(np.finfo(dtype).max, dtype)
        idx = jnp.arange(n)
        active0 = idx < m
        Qa = jnp.where(active0, Q, big)
        qrows = jnp.where((idx >= 1) & active0, Qa, big)
        mn0 = qrows.min()
        seed0 = jnp.where(active0.sum() > 1,
                          jnp.where(qrows == mn0, idx, -1).max(), 0) \
            .astype(jnp.int32)
        return Qa, seed0

    Q, seed0 = _seed(Q, P, m)
    return sD, Q, P, seed0


@functools.partial(jax.jit,
                   static_argnames=("neg_limbs", "compute_dtype"),
                   donate_argnums=tuple(range(9)))
def _packed_segment(blocks, sD, Q, P, seed, I, J, LI, LJ, t0, t1, m,
                    bytescale, neg_limbs=False,
                    compute_dtype=jnp.float32):
    nb = len(blocks)
    R, W = blocks[0].shape
    one_join = _mk_one_join_packed(nb, R, W, m, bytescale,
                                   compute_dtype, neg_limbs)
    return jax.lax.fori_loop(t0, t1, one_join,
                             (blocks, sD, Q, P, seed, I, J, LI, LJ))


def _normalize_layouts(blocks):
    """Re-lay every block into the join programs' preferred layout
    (major_to_minor=(0, 1) on TPU — what XLA layout assignment picks
    for the init/segment access pattern), ONE AT A TIME so each copy's
    source is freed before the next starts.

    Producer programs (scan+reshape pipelines) can commit blocks with
    the other major_to_minor; the init/segment programs then get a
    layout-conversion copy of EVERY block at entry — 8 x 1.17 GiB
    simultaneously live at n=100352, a measured compile-time HBM OOM.
    Normalizing here bounds the transient to one block."""
    if jax.default_backend() == "cpu":
        return blocks  # CPU arrays have no tiled layouts to normalize
    try:
        from jax.experimental.layout import Format, Layout
        want_layout = Layout(major_to_minor=(0, 1))
    except Exception:
        return blocks  # layout API unavailable (older jax)
    out = []
    for b in blocks:
        fmt = getattr(b, "format", None)
        if fmt is not None and getattr(fmt, "layout", None) is not None \
                and tuple(fmt.layout.major_to_minor) != (0, 1):
            b = jax.device_put(b, Format(want_layout, fmt.sharding))
            jax.block_until_ready(b)
        out.append(b)
    return tuple(out)


def dnj_joins_packed(blocks, m, bytescale, neg_limbs=False,
                     compute_dtype=jnp.float32):
    """All m-2 DNJ joins over a u32-packed, row-blocked u8 matrix
    (host-segmented dispatch, see tree/segmenting.py).

    blocks: tuple of nb uint32 arrays, each (R, W) with nb*R == 4W ==
    npad (use `pack_blocks` / `_pad_packed`).  m: active taxa.  Returns
    (I, J, LI, LJ, d_last, blocks) — blocks are donated and returned so
    XLA aliases them in place.
    """
    nb = len(blocks)
    R, W = blocks[0].shape
    n = nb * R
    assert 4 * W == n, "blocks must tile a square byte matrix"
    dtype = jnp.dtype(compute_dtype)
    m_host = int(m)
    mj = jnp.int32(m_host)
    bsj = jnp.asarray(bytescale, dtype)
    blocks = _normalize_layouts(blocks)
    sD, Q, P, seed = _packed_init(blocks, mj, bsj,
                                  compute_dtype=compute_dtype)
    I = jnp.zeros(n, jnp.int32)
    J = jnp.zeros(n, jnp.int32)
    LI = jnp.zeros(n, dtype)
    LJ = jnp.zeros(n, dtype)
    state = (blocks, sD, Q, P, seed, I, J, LI, LJ)

    def seg_call(state, t0, t1):
        return _packed_segment(*state, jnp.int32(t0), jnp.int32(t1),
                               mj, bsj, neg_limbs=neg_limbs,
                               compute_dtype=compute_dtype)

    state = run_segmented(seg_call, state, max(m_host - 2, 0))
    blocks, sD, Q, P, seed, I, J, LI, LJ = state
    inv = jnp.asarray(1.0, dtype) / bsj
    d_last = (blocks[0][1, 0] & jnp.uint32(0xFF)).astype(dtype) * inv
    return I, J, LI, LJ, d_last, blocks


def pack_blocks(Dq_bytes: np.ndarray, nb: int):
    """(npad, npad) uint8 host matrix -> tuple of nb (R, W) uint32."""
    npad = Dq_bytes.shape[0]
    assert npad % (4 * nb) == 0 and Dq_bytes.dtype == np.uint8
    R = npad // nb
    words = Dq_bytes.reshape(npad, npad // 4, 4).view(np.uint32) \
        .reshape(npad, npad // 4)  # little-endian byte lanes
    return tuple(jnp.asarray(words[b * R:(b + 1) * R]) for b in range(nb))


def build_tree_jax_packed(flat64: np.ndarray, n: int, names: list[Name],
                          flag: int = 0, precision: int = 9,
                          bytescale: float = 1.0, nb: int = 8,
                          compute_dtype=jnp.float32) -> bytes:
    """Device DNJ over packed-u8 blocked storage; Newick bytes (no ';').

    Loads quantize like loadPhy -b (round 0.5, phy.c:473-475); complete
    matrices only (quantized storage cannot represent missing cells,
    matrix.h:23-33)."""
    npad = _pad_packed(n, nb)
    Dq = np.zeros((npad, npad), np.uint8)
    iu = np.tril_indices(n, -1)
    qv = np.floor(np.asarray(flat64, np.float64) * bytescale + 0.5)
    qv = np.clip(qv, 0, 255).astype(np.uint8)
    Dq[(iu[0], iu[1])] = qv
    Dq[(iu[1], iu[0])] = qv
    blocks = pack_blocks(Dq, nb)
    I, J, LI, LJ, d_last, _ = dnj_joins_packed(
        blocks, jnp.int32(n), jnp.asarray(bytescale, compute_dtype),
        neg_limbs=bool(flag & 2), compute_dtype=compute_dtype)
    return _records_to_newick(I, J, LI, LJ, d_last, n, names, flag,
                              precision)
