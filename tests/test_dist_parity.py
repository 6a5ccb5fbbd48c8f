"""Golden parity for the dist subcommand on synthesized KMA data: .mat
and fasta paths, shared/pairwise masks, proximity pruning, union
streams, MSA mode, add-mode, diff-files — byte-identical .phy/.num."""

import gzip
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

from .conftest import REPO, run_oracle
from .gen_kma_data import make_dataset


@pytest.fixture(scope="module")
def kma_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("kma")
    make_dataset(d, n_samples=6, length=400)
    return d


def _files(d, ext):
    return sorted(str(p) for p in d.glob(f"*.{ext}"))


def _run_ours_cwd(args, cwd):
    res = subprocess.run(
        [sys.executable, "-m", "ccphylo_tpu"] + args, capture_output=True,
        cwd=cwd, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin"})
    assert res.returncode == 0, res.stderr.decode(errors="replace")
    return res.stdout


def _run_oracle_cwd(oracle, args, cwd):
    res = subprocess.run([str(oracle)] + args, capture_output=True,
                         cwd=cwd, timeout=600)
    assert res.returncode == 0, res.stderr.decode(errors="replace")
    return res.stdout


def _compare(oracle, kma_dir, args, tmp_path):
    rphy, ophy = tmp_path / "r.phy", tmp_path / "o.phy"
    rnum, onum = tmp_path / "r.num", tmp_path / "o.num"
    _run_oracle_cwd(oracle, args + ["-o", str(rphy), "-n", str(rnum)],
                    kma_dir)
    _run_ours_cwd(args + ["-o", str(ophy), "-n", str(onum)], kma_dir)
    assert ophy.read_bytes() == rphy.read_bytes()
    if rnum.exists():
        assert onum.read_bytes() == rnum.read_bytes()


FSA_ARGS = [
    ["-f", "17"], ["-f", "19"], ["-f", "19", "-P", "10"],
    ["-f", "17", "-P", "10"], ["-f", "51", "-P", "10"],
    ["-f", "27", "-P", "10"], ["-f", "19", "-W", "5000"],
    ["-f", "17", "-W", "100000"], ["-f", "21"], ["-f", "19", "-x", "3"],
    ["-f", "19", "-p"], ["-f", "19", "-s", "1e2"], ["-f", "19", "-b", "16"],
]

MAT_ARGS = [
    [], ["-d", "c"], ["-d", "bc"], ["-d", "chi2"], ["-d", "l1"],
    ["-d", "l2"], ["-d", "linf"], ["-d", "nl1"], ["-d", "z"],
    ["-d", "p"], ["-E", "25"], ["-C", "80"], ["-W", "100"], ["-f", "5"],
    ["-s", "1e2"], ["-b", "16"], ["-p"],
]

# -t thread-pools the host pair loop; -H streams D/N cells to disk —
# both must leave every byte unchanged.  The oracle runs WITHOUT these
# flags: its output is thread-count/storage invariant, and its
# spin-lock pool can livelock on tiny inputs.
TH_ARGS = [
    (["-d", "z"], ["-d", "z", "-t", "4"]),
    (["-d", "z"], ["-d", "z", "-H"]),
    (["-s", "1e2"], ["-t", "3", "-H", "-s", "1e2"]),
]


@pytest.mark.parametrize("base,extra", TH_ARGS)
def test_mat_matrix_threads_mmap(oracle, kma_dir, tmp_path, base, extra):
    files = [Path(f).name for f in _files(kma_dir, "mat.gz")]
    rphy, ophy = tmp_path / "r.phy", tmp_path / "o.phy"
    rnum, onum = tmp_path / "r.num", tmp_path / "o.num"
    _run_oracle_cwd(oracle, ["dist", "-i"] + files + ["-r", "tpl1"]
                    + base + ["-o", str(rphy), "-n", str(rnum)], kma_dir)
    _run_ours_cwd(["dist", "-i"] + files + ["-r", "tpl1"] + extra
                  + ["-o", str(ophy), "-n", str(onum)], kma_dir)
    assert ophy.read_bytes() == rphy.read_bytes()
    assert onum.read_bytes() == rnum.read_bytes()


@pytest.mark.parametrize("extra", FSA_ARGS)
def test_fsa_matrix(oracle, kma_dir, tmp_path, extra):
    files = [Path(f).name for f in _files(kma_dir, "fsa.gz")]
    _compare(oracle, kma_dir, ["dist", "-i"] + files + ["-r", "tpl1"]
             + extra, tmp_path)


@pytest.mark.parametrize("extra", MAT_ARGS)
def test_mat_matrix(oracle, kma_dir, tmp_path, extra):
    files = [Path(f).name for f in _files(kma_dir, "mat.gz")]
    _compare(oracle, kma_dir, ["dist", "-i"] + files + ["-r", "tpl1"]
             + extra, tmp_path)


@pytest.fixture(scope="module")
def msa_file(kma_dir):
    out = []
    for s in range(6):
        data = gzip.decompress((kma_dir / f"s{s:02d}.fsa.gz").read_bytes())
        for chunk in data.split(b">")[1:]:
            lines = chunk.split(b"\n")
            if lines[0].strip() == b"tpl1":
                out.append(b">sample%02d\n" % s + b"\n".join(lines[1:]))
    p = kma_dir / "msa.fsa"
    p.write_bytes(b"".join(out))
    return p


@pytest.mark.parametrize("extra", [["-f", "17"], ["-f", "19"],
                                   ["-f", "19", "-P", "8"]])
def test_msa(oracle, kma_dir, msa_file, tmp_path, extra):
    rout = _run_oracle_cwd(oracle, ["dist", "-i", msa_file.name] + extra
                           + ["-o", "-"], kma_dir)
    oout = _run_ours_cwd(["dist", "-i", msa_file.name] + extra
                         + ["-o", "-"], kma_dir)
    assert oout == rout


@pytest.fixture(scope="module")
def union_file(kma_dir):
    u = b"6\ts00\ts01\ts02\ts03\ts04\ts05\n"
    u += b"tpl1\t6\t0\t1\t2\t3\t4\t5\n"
    u += b"tpl2\t4\t0\t2\t3\t5\n"
    p = kma_dir / "t.union"
    p.write_bytes(u)
    return p


@pytest.mark.parametrize("extra", [[], ["-f", "5"], ["-f", "17"],
                                   ["-f", "19"]])
def test_union(oracle, kma_dir, union_file, tmp_path, extra):
    _compare(oracle, kma_dir, ["dist", "-i", union_file.name] + extra,
             tmp_path)


def test_union_device_z(oracle, kma_dir, union_file, tmp_path):
    """Union-mode .mat with the device metric table
    (CCPHYLO_TPU_DIST=device): the z metric's per-position values are
    all 0, so device sums are integer-exact and the bytes must match
    the oracle (gates included)."""
    import subprocess
    args = ["dist", "-i", union_file.name, "-d", "z"]
    rphy = tmp_path / "r.phy"
    _run_oracle_cwd(oracle, args + ["-o", str(rphy)], kma_dir)
    res = subprocess.run(
        [sys.executable, "-m", "ccphylo_tpu"] + args
        + ["-o", str(tmp_path / "o.phy")],
        capture_output=True, cwd=kma_dir, timeout=600,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu", "CCPHYLO_TPU_DIST": "device"})
    assert res.returncode == 0, res.stderr.decode(errors="replace")
    assert (tmp_path / "o.phy").read_bytes() == rphy.read_bytes()


@pytest.mark.parametrize("mode", ["mat", "fsa"])
def test_add_row(oracle, kma_dir, tmp_path, mode):
    ext = "mat.gz" if mode == "mat" else "fsa.gz"
    fl = "1" if mode == "mat" else "17"
    base = [f"s{i:02d}.{ext}" for i in range(5)]
    rphy, rnum = tmp_path / "r.phy", tmp_path / "r.num"
    _run_oracle_cwd(oracle, ["dist", "-i"] + base
                    + ["-r", "tpl1", "-f", fl, "-o", str(rphy),
                       "-n", str(rnum)], kma_dir)
    ophy, onum = tmp_path / "o.phy", tmp_path / "o.num"
    shutil.copy(rphy, ophy)
    shutil.copy(rnum, onum)
    prefix = str(kma_dir) + "/"
    _run_oracle_cwd(oracle, ["dist", "-i", prefix, "-a", f"s05.{ext}",
                             "-r", "tpl1", "-f", fl, "-o", str(rphy),
                             "-n", str(rnum)], kma_dir)
    _run_ours_cwd(["dist", "-i", prefix, "-a", f"s05.{ext}", "-r",
                   "tpl1", "-f", fl, "-o", str(ophy), "-n", str(onum)],
                  kma_dir)
    assert ophy.read_bytes() == rphy.read_bytes()
    assert onum.read_bytes() == rnum.read_bytes()


def test_diffile(oracle, kma_dir, tmp_path):
    files = [f"s{i:02d}.fsa.gz" for i in range(3)]
    rv, ov = tmp_path / "rv.txt", tmp_path / "ov.txt"
    rphy, ophy = tmp_path / "r.phy", tmp_path / "o.phy"
    _run_oracle_cwd(oracle, ["dist", "-i"] + files
                    + ["-r", "tpl1", "-f", "19", "-V", str(rv), "-o",
                       str(rphy)], kma_dir)
    _run_ours_cwd(["dist", "-i"] + files
                  + ["-r", "tpl1", "-f", "19", "-V", str(ov), "-o",
                     str(ophy)], kma_dir)
    assert ov.read_bytes() == rv.read_bytes()
    assert ophy.read_bytes() == rphy.read_bytes()


def test_dist_tree_pipeline(oracle, kma_dir, union_file):
    rphy = _run_oracle_cwd(oracle, ["dist", "-i", union_file.name,
                                    "-f", "5"], kma_dir)
    rtree = run_oracle(oracle, ["tree"], stdin=rphy)
    ophy = _run_ours_cwd(["dist", "-i", union_file.name, "-f", "5"],
                         kma_dir)
    assert ophy == rphy
    res = subprocess.run([sys.executable, "-m", "ccphylo_tpu", "tree"],
                         input=ophy, capture_output=True, cwd=REPO,
                         timeout=600)
    assert res.stdout == rtree
