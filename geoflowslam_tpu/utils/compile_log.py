"""Compile-event accounting (round-4 VERDICT weak #3: the perf toolchain
could not distinguish compile walls from compute, which is how a compile
storm got committed as a steady-state number).

`install()` turns on jax_log_compiles, swallows the voluminous per-op trace
logs, and returns a CompileLog whose events (wall time, seconds, message)
can be split per benchmark phase. A healthy timed window has ZERO events.
"""
from __future__ import annotations

import logging
import re
import time


class CompileLog(logging.Handler):
    """Captures "Finished XLA compilation of <name> in <t> sec" events."""

    RE = re.compile(r"in ([0-9.]+) sec")

    def __init__(self):
        super().__init__()
        self.events = []    # (wall_time, seconds, message)
        self.cache_notes = []   # persistent-cache hit/miss-explain lines

    def emit(self, record):
        msg = record.getMessage()
        if ("Persistent compilation cache" in msg
                or "PERSISTENT CACHE MISS" in msg):
            self.cache_notes.append(msg[:400])
            return
        # only actual backend compiles (tracing/lowering events are logged
        # too, thousands of them)
        if "XLA compilation" not in msg:
            return
        m = self.RE.search(msg)
        self.events.append((time.time(), float(m.group(1)) if m else 0.0,
                            msg[:120]))

    def split(self, *edges):
        """Per-phase {n, sec} for ascending wall-time boundaries `edges`
        (phase i = [edges[i], edges[i+1]); the last phase is open-ended)."""
        out = []
        for a, b in zip(edges, edges[1:] + (float("inf"),)):
            ev = [e for e in self.events if a <= e[0] < b]
            out.append({"n": len(ev), "sec": round(sum(e[1] for e in ev), 1)})
        return out

    def since(self, t0: float):
        ev = [e for e in self.events if e[0] >= t0]
        return {"n": len(ev), "sec": round(sum(e[1] for e in ev), 1)}


CACHE_DIR = "/root/.cache/jax_bench_cache"


def enable_persistent_cache(cache_dir: str = CACHE_DIR):
    """Point XLA's persistent compile cache at the shared on-disk dir.

    Every entry point (drivers, bench, tools) must call this BEFORE the
    first jit dispatch: the axon tunnel compiles big programs in 10-80 s
    but loads a cached executable in <4 s, and the cache is keyed on the
    serialized HLO (deterministic across processes — verified by running
    the full hard-mode frame_step twice in separate processes: 44/44
    hits, 79.6 s compile -> 3.5 s load). A storm on a warm cache means
    the traced program itself changed (a source edit), not a cache bug.
    """
    import os
    import jax
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist even fast compiles: at ~100 programs per cold run the traced
    # compile time dominates the budget, not the disk
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def install(explain_misses: bool = False) -> CompileLog:
    """Enable compile logging, mute the stderr spam, return the capture.
    explain_misses=True additionally captures the persistent-cache
    hit/miss-explanation lines into CompileLog.cache_notes."""
    import jax
    jax.config.update("jax_log_compiles", True)
    if explain_misses:
        jax.config.update("jax_explain_cache_misses", True)
    clog = CompileLog()
    jlog = logging.getLogger("jax")
    jlog.handlers[:] = [clog]   # replace jax's stderr handler: per-op trace
    jlog.propagate = False      # logs are voluminous at WARNING level
    return clog
