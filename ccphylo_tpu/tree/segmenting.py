"""Host-side segmented dispatch of device join loops.

The axon TPU runtime kills the worker when a SINGLE XLA execution runs
longer than a watchdog threshold (measured round 3: a trivial 15 s
matmul fori_loop with ~4 MB of state brings the worker down, while the
same program sized to a few seconds completes; this retroactively
explains every ">32k taxa" crash of rounds 1-2 — f32 n=32768 ran 16 s
and survived, every configuration whose monolithic join loop would run
longer died, across unrelated dtypes and buffer layouts).

The fix is structural and costs nothing: the join loop is dispatched in
host-driven segments of K joins.  All state (the distance matrix, row
sums, caches, join records) stays on device; every segment donates and
re-receives the same buffers, so XLA aliases them in place and the host
round-trip is one scalar sync per segment (~ms).  Segment sizes adapt
to a wall-clock target so any n / dtype / joins-per-second combination
stays under the watchdog.
"""

from __future__ import annotations

import os
import time

import jax


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, ""))
    except ValueError:
        return default


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, ""))
    except ValueError:
        return default


def run_segmented(seg_call, state, total: int, hooks=None,
                  start: int = 0):
    """Run `total` join steps as adaptively sized device segments.

    seg_call(state, t0, t1) -> state  — a jitted, buffer-donating
    function executing steps [t0, t1); state is an arbitrary pytree of
    device arrays.  Returns the final state.

    hooks, if given, is called as hooks(state, done, total) after every
    fenced segment (checkpointing / instrumentation); `start` resumes
    the step counter mid-run (checkpoint restore).

    Segment sizing: start at CCPHYLO_TPU_SEG (default 512) steps, then
    rescale each segment toward CCPHYLO_TPU_SEG_TARGET_S (default 4.0)
    seconds of measured device time, clamped to [128, 131072].  A fixed
    size can be forced with CCPHYLO_TPU_SEG_FIXED=1.
    """
    target_s = _env_float("CCPHYLO_TPU_SEG_TARGET_S", 4.0)
    seg = max(_env_int("CCPHYLO_TPU_SEG", 512), 1)
    fixed = os.environ.get("CCPHYLO_TPU_SEG_FIXED", "") == "1"

    def sync(state):
        # a real device->host fetch of the smallest leaf: on the axon
        # runtime block_until_ready returns before execution finishes
        # (measured round 3), so only a fetch truly fences a segment
        leaves = jax.tree_util.tree_leaves(state)
        jax.device_get(min(leaves, key=lambda x: x.size))
        return state

    done = start
    while done < total:
        k = min(seg, total - done)
        t0 = time.perf_counter()
        state = sync(seg_call(state, done, done + k))
        dt = time.perf_counter() - t0
        done += k
        if hooks is not None:
            hooks(state, done, total)
        if not fixed and done < total and k == seg:
            # steady-state rescale; the first call's dt includes
            # compile, which only ever shrinks the next segment (safe
            # direction for the watchdog)
            seg = int(max(128, min(131072, seg * target_s / max(dt, 1e-3))))
    return state
