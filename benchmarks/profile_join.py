#!/usr/bin/env python
"""Per-join device-time profiler for the join engines.

Runs one compile segment + one timed warm segment + one traced warm
segment on the current backend, then summarizes the trace's device-op
durations (top ops by total time).  This is how the packed engine's
scan-pass share was established in round 4 (1.16 ms/join at n=32768,
scan while-loop 75%); round 5 uses it to find the sharded engine's
~20x per-join overhead (VERDICT r4 item 4).

Usage:
  python benchmarks/profile_join.py packed  -n 32768
  python benchmarks/profile_join.py sharded -n 32768 [--ndev 1]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ccphylo_tpu.utils.jaxconfig import configure_jax

configure_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SEG = 128


def _sync(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[4])
    return x


def drive_packed(n):
    from benchmarks.synth import device_words
    from ccphylo_tpu.tree.packed_engine import (_packed_init,
                                                _packed_segment,
                                                _scan_impl)
    words = device_words(n)
    jax.block_until_ready(words)
    mj = jnp.int32(n)
    sD2, Q, P, seed = _packed_init(words, mj)
    state = (words, sD2, Q, P, seed,
             jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
             jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
             jnp.zeros(n, jnp.int32), jnp.zeros(4, jnp.int32))
    si = _scan_impl()

    def seg(state, t0):
        return _packed_segment(*state, jnp.int32(t0),
                               jnp.int32(t0 + SEG), mj, kbatch=128,
                               scan_impl=si)
    return state, seg


def drive_sharded(n, ndev):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from benchmarks.synth import cell_hash_np
    from ccphylo_tpu.parallel.sharded_dnj import (_dnj_programs,
                                                  _pad_to)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    npad = _pad_to(n, 128 * ndev)
    ii, jj = np.meshgrid(np.arange(npad, dtype=np.uint32),
                         np.arange(npad, dtype=np.uint32),
                         indexing="ij")
    Dp = cell_hash_np(ii, jj, 97).astype(np.float32)
    Dp[n:, :] = -1.0
    Dp[:, n:] = -1.0
    np.fill_diagonal(Dp[:n, :n], 0.0)
    Dd = jax.make_array_from_callback(
        Dp.shape, NamedSharding(mesh, P("d", None)),
        lambda idx: Dp[idx])
    init_fn, seg_fn = _dnj_programs(mesh, "d", npad, n, "float32",
                                    False)
    sDd, Nd, Qd, Pd, seed = init_fn(Dd)
    rep = NamedSharding(mesh, P())
    T = max(n - 2, 1)
    state = (Dd, sDd, Nd, Qd, Pd, seed,
             jax.device_put(np.zeros(T, np.int32), rep),
             jax.device_put(np.zeros(T, np.int32), rep),
             jax.device_put(np.zeros(T, np.float32), rep),
             jax.device_put(np.zeros(T, np.float32), rep))

    def seg(state, t0):
        return seg_fn(*state, jnp.int32(t0), jnp.int32(t0 + SEG))
    return state, seg


def summarize_trace(tdir, joins):
    files = sorted(glob.glob(os.path.join(
        tdir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[-1], "rt") as fh:
        tr = json.load(fh)
    evs = tr.get("traceEvents", [])
    # device lanes: pid names containing "TPU" / "/device:"
    pidname = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pidname.items()
                if "TPU" in nm or "Device" in nm or "device" in nm}
    tot = {}
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            d = float(e.get("dur", 0))
            name = e["name"].split(".")[0]
            tot[name] = tot.get(name, 0.0) + d
            total += d
    print(f"\ndevice total {total / 1e3:.2f} ms over {joins} joins "
          f"= {total / 1e3 / joins:.3f} ms/join")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d / 1e3:9.2f} ms  {100 * d / max(total, 1e-9):5.1f}%"
              f"  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("engine", choices=["packed", "sharded"])
    ap.add_argument("-n", type=int, default=32768)
    ap.add_argument("--ndev", type=int, default=1)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()} engine={args.engine} "
          f"n={args.n}", flush=True)
    if args.engine == "packed":
        state, seg = drive_packed(args.n)
    else:
        state, seg = drive_sharded(args.n, args.ndev)

    t0 = time.perf_counter()
    state = _sync(seg(state, 0))
    print(f"seg0 (incl. compile) {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    state = _sync(seg(state, SEG))
    dt = time.perf_counter() - t0
    print(f"seg1 warm: {dt:.2f}s = {1e3 * dt / SEG:.2f} ms/join",
          flush=True)
    tdir = f"/tmp/jtrace_{args.engine}_{args.n}"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        state = _sync(seg(state, 2 * SEG))
    summarize_trace(tdir, SEG)


if __name__ == "__main__":
    main()
