"""Deterministic synthetic integer distance matrices for scale runs.

One pure uint32 hash defines cell (i, j) of an arbitrarily large
symmetric u8 distance matrix; the host (numpy) and device (jax)
variants produce identical values, so a 20 GB Phylip file for the
reference binary and the on-device packed matrix for our engine are
guaranteed to describe the SAME matrix without ever shipping or
parsing the matrix twice.

Values are small integers (lo + h % mod, default 3..99) — tie-dense on
purpose: integer SNP-like data maximally exercises the engines' tie
rules, which is what the parity chain is for.
"""

from __future__ import annotations

import numpy as np

K1 = np.uint32(2654435761)
K2 = np.uint32(40503)
K3 = np.uint32(2246822519)


def cell_hash_np(i, j, mod=97, lo=3):
    """Symmetric u8 cell values for index arrays i, j (numpy u32
    wraparound arithmetic).  i == j gives 0 (diagonal)."""
    i = np.asarray(i, np.uint32)
    j = np.asarray(j, np.uint32)
    hi = np.maximum(i, j)
    lo_ = np.minimum(i, j)
    with np.errstate(over="ignore"):
        h = hi * K1 + lo_ * K2
        h ^= h >> np.uint32(15)
        h *= K3
        h ^= h >> np.uint32(13)
    v = (h % np.uint32(mod)).astype(np.uint32) + np.uint32(lo)
    return np.where(i == j, np.uint32(0), v).astype(np.uint8)


def cell_hash_jax(i, j, mod=97, lo=3):
    """Device twin of cell_hash_np (uint32 ops wrap identically)."""
    import jax.numpy as jnp
    i = i.astype(jnp.uint32)
    j = j.astype(jnp.uint32)
    hi = jnp.maximum(i, j)
    lo_ = jnp.minimum(i, j)
    h = hi * jnp.uint32(2654435761) + lo_ * jnp.uint32(40503)
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(2246822519)
    h = h ^ (h >> jnp.uint32(13))
    v = h % jnp.uint32(mod) + jnp.uint32(lo)
    return jnp.where(i == j, jnp.uint32(0), v)


def _coord_np(x, d):
    """0..255 coordinate hash for point index x at level d."""
    x = np.asarray(x, np.uint32)
    with np.errstate(over="ignore"):
        h = x * K1 + np.uint32(d) * K2 + K3
        h ^= h >> np.uint32(15)
        h *= K3
        h ^= h >> np.uint32(13)
    return ((h >> np.uint32(7)) & np.uint32(0xFF)).astype(np.int32)


def cell_metric_np(i, j, mod=97, lo=3):
    """Metric synthetic cells: L1 distance between 8-level
    hierarchically clustered points (coordinate d of point k depends
    on k >> d, so index-close taxa share coarse coordinates — the
    phylogeny-like regime, vs cell_hash_np's adversarial tie-dense
    one).  Triangle inequality holds by construction (L1 over a shared
    embedding).  `mod`/`lo` accepted for signature parity; values are
    0 (diagonal) or 3..255."""
    i = np.asarray(i, np.uint32)
    j = np.asarray(j, np.uint32)
    acc = np.zeros(np.broadcast(i, j).shape, np.int32)
    for d in range(8):
        acc = acc + np.abs(_coord_np(i >> np.uint32(d), d)
                           - _coord_np(j >> np.uint32(d), d))
    v = np.minimum(3 + (acc >> 3), 255).astype(np.uint8)
    return np.where(i == j, np.uint8(0), v)


def write_phy(path: str, n: int, mod=97, lo=3, progress=False):
    """Write the n-taxon synthetic matrix as lower-triangular Phylip
    text (integer cells, tab-separated — loadPhy-compatible).  Fast
    path: a 256-entry fixed-width byte LUT renders whole rows with one
    fancy-index."""
    lut = np.zeros((256, 4), np.uint8)
    for v in range(256):
        lut[v] = np.frombuffer(b"%3d\t" % v, np.uint8)
    with open(path, "wb", buffering=1 << 22) as fh:
        fh.write(b"%10d\n" % n)
        for i in range(n):
            name = b"T%07d" % i
            if i == 0:
                fh.write(name + b"\n")
                continue
            v = cell_hash_np(np.full(i, i, np.uint32),
                             np.arange(i, dtype=np.uint32), mod, lo)
            row = lut[v].reshape(-1)
            fh.write(name + b"\t" + row[:-1].tobytes() + b"\n")
            if progress and i % 20000 == 0:
                print(f"  wrote {i}/{n} rows", flush=True)


def device_words(n: int, mod=97, lo=3, group_rows=8192):
    """Build the packed-engine words buffer for the synthetic matrix
    directly on device (group programs writing into one donated
    buffer; peak HBM = matrix + one group transient)."""
    import functools
    import jax
    import jax.numpy as jnp
    from ccphylo_tpu.tree.packed_engine import _pad_packed

    npad = _pad_packed(n)
    W = npad // 4
    CH = 512

    @functools.partial(jax.jit, static_argnames=("gr",),
                       donate_argnums=(0,))
    def fill_group(words, r0, gr):
        idx = jnp.arange(npad, dtype=jnp.uint32)
        outs = []
        for k in range(gr // CH):
            rows = (r0 + k * CH + jnp.arange(CH)).astype(jnp.uint32)
            v = cell_hash_jax(rows[:, None], idx[None, :], mod, lo)
            act = (rows[:, None] < jnp.uint32(n)) \
                & (idx[None, :] < jnp.uint32(n))
            q = jnp.where(act, v, jnp.uint32(0))
            r4 = q.reshape(CH, W, 4)
            outs.append(r4[..., 0] | (r4[..., 1] << jnp.uint32(8))
                        | (r4[..., 2] << jnp.uint32(16))
                        | (r4[..., 3] << jnp.uint32(24)))
        return jax.lax.dynamic_update_slice(
            words, jnp.concatenate(outs), (r0, jnp.int32(0)))

    words = jnp.zeros((npad, W), jnp.uint32)
    r0 = 0
    while r0 < npad:
        gr = min(group_rows, npad - r0)
        words = fill_group(words, jnp.int32(r0), gr=gr)
        r0 += gr
    return words
