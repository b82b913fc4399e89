import os
import numpy as np
import jax.numpy as jnp
import pytest

from geoflowslam_tpu.state import map_state as M
from geoflowslam_tpu.state import serialize as S
from geoflowslam_tpu.utils.timers import StageTimers


def test_atlas_roundtrip(tmp_path):
    ms = M.create(8, 64, 256)
    ms = M.insert_keyframe(
        ms, jnp.int32(2), jnp.eye(3), jnp.ones(3), jnp.zeros(3), jnp.zeros(6),
        jnp.float32(1.5), jnp.ones((64, 2)), jnp.zeros(64, jnp.int32),
        jnp.zeros(64), jnp.ones((64, 8), jnp.uint32), jnp.full((64,), 2.0),
        jnp.ones(64, bool), jnp.arange(64, dtype=jnp.int32), jnp.int32(-1))
    p = str(tmp_path / "atlas")
    S.save_atlas(p, ms, extra={"seq": "test"})
    ms2, extra = S.load_atlas(p + ".npz")
    assert extra["seq"] == "test"
    np.testing.assert_array_equal(np.asarray(ms2.kf_valid), np.asarray(ms.kf_valid))
    np.testing.assert_allclose(np.asarray(ms2.kf_t[2]), 1.0)
    np.testing.assert_array_equal(np.asarray(ms2.kf_obs_mp), np.asarray(ms.kf_obs_mp))


def test_vocab_checksum_gate(tmp_path):
    from geoflowslam_tpu.retrieval import vocab as V
    import jax

    train = np.asarray(jax.random.randint(jax.random.PRNGKey(0), (500, 8),
                                          0, 2**31 - 1, jnp.int32), np.uint32)
    v1 = V.build_vocabulary(train, k=4, levels=2, iters=2, seed=0)
    v2 = V.build_vocabulary(train, k=4, levels=2, iters=2, seed=1)
    ms = M.create(4, 16, 64)
    p = str(tmp_path / "a")
    S.save_atlas(p, ms, vocab=v1)
    S.load_atlas(p + ".npz", vocab=v1)  # same vocab: ok
    with pytest.raises(ValueError):
        S.load_atlas(p + ".npz", vocab=v2)


def test_timers_outputs(tmp_path):
    t = StageTimers()
    for i in range(5):
        t.add("Track_total", 10.0 + i)
        t.add("LBA", 5.0)
    t.write_all(str(tmp_path), {"sensor": "rgbd"})
    for fn in ["ExecTimeMean.txt", "LocalMapTimeStats.txt", "LBA_Stats.txt",
               "SessionInfo.txt", "TrackTimeCost.txt"]:
        assert os.path.exists(tmp_path / fn), fn
    content = open(tmp_path / "ExecTimeMean.txt").read()
    assert "Track_total 12.0000" in content
