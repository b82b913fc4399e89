"""Keyframe database: BoW store + loop/reloc candidate retrieval.

TPU-native replacement for KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc): the DBoW2 inverted file
(word -> KF list) becomes a dense [K_MAX, V] BoW matrix next to the MapState;
DetectNBestCandidates / DetectRelocalizationCandidates become masked batched
L1-score reductions over that matrix (one fused pass instead of inverted-
index walks — K_MAX is small, V is a few thousand).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from geoflowslam_tpu.retrieval import vocab as V
from geoflowslam_tpu.state import map_state as M


class KFDatabase(NamedTuple):
    bow: jnp.ndarray     # [K_MAX, V] L1-normalized tf-idf vectors
    valid: jnp.ndarray   # [K_MAX]

    @staticmethod
    def create(k_max: int, n_words: int):
        return KFDatabase(bow=jnp.zeros((k_max, n_words), jnp.float32),
                          valid=jnp.zeros((k_max,), bool))


def add_keyframe(db: KFDatabase, vocab: V.Vocabulary, slot,
                 desc: jnp.ndarray, kp_valid: jnp.ndarray) -> KFDatabase:
    words = V.descend(vocab, desc, kp_valid)
    vec = V.bow_vector(vocab, words)
    return KFDatabase(bow=db.bow.at[slot].set(vec),
                      valid=db.valid.at[slot].set(True))


def erase_keyframe(db: KFDatabase, slot) -> KFDatabase:
    return db._replace(valid=db.valid.at[slot].set(False))


def detect_candidates(db: KFDatabase, ms: M.MapState, query_vec: jnp.ndarray,
                      query_kf, n_best: int = 3, exclude_window: int = 10):
    """Loop/merge candidates for `query_kf` (DetectNBestCandidates essence):
    best-scoring KFs excluding the query's covisibility neighbourhood.

    Returns (cand_idx [n_best], cand_score [n_best], cand_ok [n_best])."""
    scores = V.l1_score(db.bow, query_vec[None, :])          # [K]
    cov = M.covisibility(ms)
    connected = cov[query_kf] > 0
    mask = (db.valid & ms.kf_valid & ~connected)
    mask = mask.at[query_kf].set(False)
    # exclude temporally-adjacent KFs of the SAME map (dormant Atlas maps are
    # always eligible — that's the merge path, LoopClosing::MergeLocal)
    dt = jnp.abs(ms.kf_time - ms.kf_time[query_kf])
    same_map = ms.kf_map_id == ms.kf_map_id[query_kf]
    mask = mask & ~(same_map & (dt < 3.0))
    s = jnp.where(mask, scores, -1.0)
    vals, idx = jax.lax.top_k(s, n_best)
    return idx, vals, vals > 0.0


def detect_relocalization_candidates(db: KFDatabase, ms: M.MapState,
                                     query_vec: jnp.ndarray, n_best: int = 5):
    """Relocalization candidates: best-scoring valid KFs, no exclusions
    (DetectRelocalizationCandidates)."""
    scores = V.l1_score(db.bow, query_vec[None, :])
    s = jnp.where(db.valid & ms.kf_valid, scores, -1.0)
    vals, idx = jax.lax.top_k(s, n_best)
    return idx, vals, vals > 0.0
