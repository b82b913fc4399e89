"""Persistent exec server for fast iterative debugging.

Polls /tmp/repl_in/*.py, execs each new file in a shared namespace with jax
pre-imported, writes stdout/stderr + traceback to /tmp/repl_out/<name>.out.
Keeps the process (and jax compilation cache) warm between snippets.
"""
import io
import os
import sys
import time
import traceback
import contextlib

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # overwrite: env ships with =axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

IN_DIR = "/tmp/repl_in"
OUT_DIR = "/tmp/repl_out"
os.makedirs(IN_DIR, exist_ok=True)
os.makedirs(OUT_DIR, exist_ok=True)

ns = {"jax": jax, "jnp": jnp, "np": np}
seen = set()
print("repl server ready", flush=True)
while True:
    for fn in sorted(os.listdir(IN_DIR)):
        if not fn.endswith(".py") or fn in seen:
            continue
        seen.add(fn)
        path = os.path.join(IN_DIR, fn)
        buf = io.StringIO()
        t0 = time.time()
        try:
            with open(path) as f:
                code = f.read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, fn, "exec"), ns)
        except Exception:
            buf.write(traceback.format_exc())
        buf.write(f"\n[done in {time.time()-t0:.1f}s]\n")
        with open(os.path.join(OUT_DIR, fn + ".out"), "w") as f:
            f.write(buf.getvalue())
    time.sleep(0.3)
