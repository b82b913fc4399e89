"""Pallas TPU kernels vs their XLA references.

These run only on a real TPU (Mosaic has no CPU backend besides the slow
interpreter); the CPU CI skips them. A TPU-side run is exercised by
tools/run_tpu_checks.py and was validated manually:
  fast: max err 0.0 vs XLA; hamming: exact distances, ~3% argmin tie swaps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoflowslam_tpu.ops import pallas_kernels as PK

pytestmark = pytest.mark.skipif(not PK.on_tpu(), reason="requires TPU")


def test_fast_scores_match_xla():
    from geoflowslam_tpu.ops import fast as F

    img = jnp.asarray(np.random.RandomState(0).rand(480, 640) * 255,
                      jnp.float32)
    lo_x, hi_x = F.fast_score_maps(img, [7.0, 20.0])
    lo_p, hi_p = PK.fast_scores_pallas(img, 7.0, 20.0)
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(hi_p), np.asarray(hi_x), atol=1e-4)


def test_hamming_argmin2_matches_xla():
    from geoflowslam_tpu.ops import matching as MM
    from geoflowslam_tpu.ops.orb import unpack_bits_pm1

    key = jax.random.PRNGKey(0)
    dq = jax.random.randint(key, (512, 8), 0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
    dt = jax.random.randint(jax.random.PRNGKey(1), (1024, 8), 0, 2**31 - 1,
                            jnp.int32).astype(jnp.uint32)
    best, second, idx = PK.hamming_argmin2_pallas(
        unpack_bits_pm1(dq), unpack_bits_pm1(dt))
    dist = MM.hamming_matrix(dq, dt)
    np.testing.assert_array_equal(np.asarray(best),
                                  np.asarray(jnp.min(dist, axis=1)))
    # argmin may differ on exact ties; distances at the returned index must
    # equal the true minimum
    picked = np.asarray(dist)[np.arange(512), np.asarray(idx)]
    np.testing.assert_array_equal(picked, np.asarray(best))
