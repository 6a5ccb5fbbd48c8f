"""Golden parity for methylation-motif masking (-y): dist fasta paths
and trim, vs the reference binary (methparse.c:27-286, meth motif
masking in fsacmp.c / trim.c:77-260).

Motifs cover plain (GATC), degenerate-IUPAC (CCWGG, GCNGC), capital
site positions at different offsets, and palindromic/asymmetric cases
(the parser appends reverse complements; for asymmetric motifs the RC
masks different strand positions).
"""

import subprocess
import sys
from pathlib import Path

import pytest

from .conftest import REPO
from .gen_kma_data import make_dataset

MOTIFS = b"""\
>dam
GAtc
>dcm
ccWgg
>asym
gCnGc
>leak
cNTgn
"""


@pytest.fixture(scope="module")
def kma_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kma_meth")
    # longer templates so every motif (incl. the degenerate ones and
    # their reverse complements) occurs several times
    make_dataset(d, n_samples=6, length=1600, seed=11)
    (d / "motifs.fa").write_bytes(MOTIFS)
    return d


def _run_ours(args, cwd):
    res = subprocess.run(
        [sys.executable, "-m", "ccphylo_tpu"] + args, capture_output=True,
        cwd=cwd, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin"})
    assert res.returncode == 0, res.stderr.decode(errors="replace")
    return res.stdout


def _run_oracle(oracle, args, cwd):
    res = subprocess.run([str(oracle)] + args, capture_output=True,
                         cwd=cwd, timeout=600)
    assert res.returncode == 0, res.stderr.decode(errors="replace")
    return res.stdout


DIST_ARGS = [
    ["-f", "17"],               # shared mask
    ["-f", "19"],               # pairwise masks
    ["-f", "19", "-P", "10"],   # pairwise + proximity pruning
    ["-f", "17", "-P", "10"],
    ["-f", "27"],               # insignificant-base variant
]


@pytest.mark.parametrize("extra", DIST_ARGS)
def test_dist_fsa_meth(oracle, kma_dir, tmp_path, extra):
    files = sorted(p.name for p in kma_dir.glob("*.fsa.gz"))
    args = (["dist", "-i"] + files
            + ["-r", "tpl1", "-y", "motifs.fa"] + extra)
    rphy, ophy = tmp_path / "r.phy", tmp_path / "o.phy"
    rnum, onum = tmp_path / "r.num", tmp_path / "o.num"
    _run_oracle(oracle, args + ["-o", str(rphy), "-n", str(rnum)],
                kma_dir)
    _run_ours(args + ["-o", str(ophy), "-n", str(onum)], kma_dir)
    assert ophy.read_bytes() == rphy.read_bytes()
    assert onum.read_bytes() == rnum.read_bytes()


def test_dist_fsa_meth_changes_output(oracle, kma_dir, tmp_path):
    """Guard against a vacuous test: -y must actually change the
    oracle's matrix on this dataset (the motifs occur and mask)."""
    files = sorted(p.name for p in kma_dir.glob("*.fsa.gz"))
    base = ["dist", "-i"] + files + ["-r", "tpl1", "-f", "17"]
    plain = _run_oracle(oracle, base + ["-o", "/dev/stdout"], kma_dir)
    meth = _run_oracle(
        oracle, base + ["-y", "motifs.fa", "-o", "/dev/stdout"],
        kma_dir)
    assert plain != meth


# deterministic flag combos only (see test_trim_parity.py: default
# flags hit the reference's undefined bases[16] read)
TRIM_ARGS = [
    ["-f", "1"],                # N-out masked columns
    ["-f", "1", "-P", "10"],
    ["-f", "16"],               # only-included columns
    ["-f", "17"],
]


@pytest.mark.parametrize("extra", TRIM_ARGS)
def test_trim_meth(oracle, kma_dir, extra):
    files = sorted(p.name for p in kma_dir.glob("*.fsa.gz"))
    args = (["trim", "-i"] + files
            + ["-r", "tpl1", "-y", "motifs.fa"] + extra)
    r = _run_oracle(oracle, args, kma_dir)
    o = _run_ours(args, kma_dir)
    assert o == r


def test_trim_meth_changes_output(oracle, kma_dir):
    files = sorted(p.name for p in kma_dir.glob("*.fsa.gz"))
    base = ["trim", "-i"] + files + ["-r", "tpl1", "-f", "1"]
    plain = _run_oracle(oracle, base, kma_dir)
    meth = _run_oracle(oracle, base + ["-y", "motifs.fa"], kma_dir)
    assert plain != meth
