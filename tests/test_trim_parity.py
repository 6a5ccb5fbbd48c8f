"""Golden parity for the trim subcommand.

The reference reads past its local bases[16] array for positions whose
insignificance marker survives getIncPos (seq N over a soft-masked
base, trim.c:50/61 with code|16) — under ASLR its own output varies
between runs there.  We emit deterministic NULs instead; the
comparison normalizes those positions.
"""

import subprocess
import sys

import pytest

from .conftest import REPO
from .gen_kma_data import make_dataset


@pytest.fixture(scope="module")
def fsa_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("trim")
    make_dataset(d, n_samples=4, length=400)
    return d


def _run(cmd, cwd):
    return subprocess.run(cmd, capture_output=True, cwd=cwd, timeout=300,
                          env={"PYTHONPATH": str(REPO),
                               "PATH": "/usr/bin:/bin"})


def _normalize(ours: bytes, ref: bytes) -> bytes:
    """Blank the reference bytes wherever we emitted the deterministic
    NUL (or its tolower twin) for the reference's undefined read."""
    if len(ours) != len(ref):
        return ref
    out = bytearray(ref)
    for i, b in enumerate(ours):
        if b == 0:
            out[i] = 0
    return bytes(out)


FILES = ["s00.fsa.gz", "s01.fsa.gz", "s02.fsa.gz", "s03.fsa.gz"]

DETERMINISTIC = [
    ["-r", "tpl1", "-f", "1"], ["-r", "tpl1", "-f", "4"],
    ["-r", "tpl1", "-f", "16"], ["-r", "tpl1", "-f", "2"],
    ["-r", "tpl1", "-f", "2", "-P", "10"], ["-r", "tpl1", "-f", "5"],
]

GARBAGE = [
    ["-r", "tpl1"], ["-r", "tpl1", "-P", "10"],
    ["-r", "tpl1", "-f", "8"], ["-r", "tpl1", "-f", "32"],
]


@pytest.mark.parametrize("extra", DETERMINISTIC)
def test_trim_deterministic(oracle, fsa_dir, extra):
    r = _run([str(oracle), "trim", "-i"] + FILES + extra, fsa_dir)
    o = _run([sys.executable, "-m", "ccphylo_tpu", "trim", "-i"]
             + FILES + extra, fsa_dir)
    assert o.stdout == r.stdout


@pytest.mark.parametrize("extra", GARBAGE)
def test_trim_modulo_undefined_bytes(oracle, fsa_dir, extra):
    r = _run([str(oracle), "trim", "-i"] + FILES + extra, fsa_dir)
    o = _run([sys.executable, "-m", "ccphylo_tpu", "trim", "-i"]
             + FILES + extra, fsa_dir)
    assert o.stdout == _normalize(o.stdout, r.stdout)


def test_trim_msa_mode(oracle, fsa_dir):
    """Single multi-record fasta, no -r."""
    import gzip
    out = []
    for s in range(4):
        data = gzip.decompress((fsa_dir / f"s{s:02d}.fsa.gz").read_bytes())
        for chunk in data.split(b">")[1:]:
            lines = chunk.split(b"\n")
            if lines[0].strip() == b"tpl1":
                out.append(b">sample%02d\n" % s + b"\n".join(lines[1:]))
    (fsa_dir / "msa.fsa").write_bytes(b"".join(out))
    for extra in (["-f", "1"], ["-f", "16"], ["-f", "17"]):
        r = _run([str(oracle), "trim", "-i", "msa.fsa"] + extra, fsa_dir)
        o = _run([sys.executable, "-m", "ccphylo_tpu", "trim", "-i",
                  "msa.fsa"] + extra, fsa_dir)
        assert o.stdout == r.stdout, extra
    for extra in ([], ["-P", "5"]):
        r = _run([str(oracle), "trim", "-i", "msa.fsa"] + extra, fsa_dir)
        o = _run([sys.executable, "-m", "ccphylo_tpu", "trim", "-i",
                  "msa.fsa"] + extra, fsa_dir)
        assert o.stdout == _normalize(o.stdout, r.stdout), extra
