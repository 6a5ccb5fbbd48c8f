"""Synthetic KMA-style test data: .mat.gz count matrices and .fsa.gz
consensus fastas for a handful of samples sharing templates."""

import gzip
from pathlib import Path

import numpy as np

BASES = "ACGT"


def make_seq(rng, length):
    return rng.choice(list(BASES), length)


def mutate(rng, seq, rate, n_rate=0.02, low_rate=0.0):
    out = seq.copy()
    snps = rng.rand(len(seq)) < rate
    for i in np.flatnonzero(snps):
        out[i] = rng.choice([b for b in BASES if b != seq[i]])
    ns = rng.rand(len(seq)) < n_rate
    out[ns] = "N"
    if low_rate:
        lows = rng.rand(len(seq)) < low_rate
        for i in np.flatnonzero(lows):
            out[i] = out[i].lower()
    return out


def counts_for(rng, base, depth_mean=30):
    """Column counts peaked at the consensus base."""
    depth = max(1, int(rng.poisson(depth_mean)))
    counts = [0, 0, 0, 0, 0, 0]  # A C G T N -
    if base == "N":
        counts[4] = depth
    elif base == "-":
        counts[5] = depth
    else:
        idx = BASES.index(base)
        counts[idx] = depth
        # sprinkle noise
        for _ in range(rng.randint(0, 3)):
            counts[rng.randint(0, 6)] += 1
    return counts


def write_sample(dirpath: Path, name: str, templates, rng, rate=0.01,
                 gz=True, depth_mean=30, n_rate=0.02, low_rate=0.05,
                 drop_templates=()):
    """templates: dict template_name -> base ref sequence (np array)."""
    matlines = []
    fsalines = []
    for tname, ref in templates.items():
        if tname in drop_templates:
            continue
        seq = mutate(rng, ref, rate, n_rate, low_rate)
        matlines.append(b"#" + tname.encode())
        for rbase, sbase in zip(ref, seq):
            c = counts_for(rng, sbase.upper(), depth_mean)
            matlines.append(
                rbase.upper().encode() + b"\t"
                + b"\t".join(b"%d" % x for x in c))
        matlines.append(b"")
        fsalines.append(b">" + tname.encode())
        fsalines.append("".join(seq).encode())
    mat = b"\n".join(matlines) + b"\n"
    fsa = b"\n".join(fsalines) + b"\n"
    if gz:
        (dirpath / f"{name}.mat.gz").write_bytes(gzip.compress(mat))
        (dirpath / f"{name}.fsa.gz").write_bytes(gzip.compress(fsa))
    else:
        (dirpath / f"{name}.mat").write_bytes(mat)
        (dirpath / f"{name}.fsa").write_bytes(fsa)


def make_dataset(dirpath: Path, n_samples=6, length=400, n_templates=2,
                 seed=42, **kw):
    rng = np.random.RandomState(seed)
    templates = {f"tpl{t}": make_seq(rng, length)
                 for t in range(1, n_templates + 1)}
    names = []
    for s in range(n_samples):
        name = f"s{s:02d}"
        drop = kw.pop("drop", {})
        write_sample(dirpath, name, templates, rng,
                     drop_templates=drop.get(name, ()), **kw)
        names.append(name)
    return names, list(templates)
