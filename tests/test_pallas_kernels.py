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


def test_fast_scores_odd_width():
    """Pyramid levels have arbitrary widths; the kernel pads to 128 lanes."""
    from geoflowslam_tpu.ops import fast as F

    for h, w in [(400, 533), (333, 444)]:
        img = jnp.asarray(np.random.RandomState(h).rand(h, w) * 255,
                          jnp.float32)
        lo_x, hi_x = F.fast_score_maps(img, [7.0, 20.0])
        lo_p, hi_p = PK.fast_scores_pallas(img, 7.0, 20.0)
        np.testing.assert_array_equal(np.asarray(lo_p), np.asarray(lo_x))
        np.testing.assert_array_equal(np.asarray(hi_p), np.asarray(hi_x))


def test_search_by_projection_pallas_matches_xla():
    """The fused gated search must reproduce the XLA mask path exactly
    (ops/matching.search_by_projection dispatches to it on TPU)."""
    from geoflowslam_tpu.ops import matching as MA
    from geoflowslam_tpu.ops.orb import unpack_bits_pm1

    rs = np.random.RandomState(1)
    n = m = 1250
    dq = jnp.asarray(rs.randint(0, 2**31, (n, 8)).astype(np.uint32))
    dt = jnp.asarray(rs.randint(0, 2**31, (m, 8)).astype(np.uint32))
    dt = dt.at[:400].set(dq[:400])
    uv_q = jnp.asarray(rs.rand(n, 2).astype(np.float32) * 640)
    uv_t = uv_q + jnp.asarray(rs.randn(m, 2).astype(np.float32) * 2)
    lvl = jnp.asarray(rs.randint(0, 8, n).astype(np.int32))
    vq = jnp.asarray(rs.rand(n) > 0.1)
    vt = jnp.asarray(rs.rand(m) > 0.1)
    radius = jnp.full((n,), 7.5, jnp.float32)

    msk = MA.spatial_mask(uv_q, uv_t, radius)
    msk = msk & MA.level_mask(lvl, lvl, -1, 1) & vq[:, None]
    ix, dx = MA.match_descriptors(dq, vq, dt, vt, max_dist=MA.TH_HIGH,
                                  ratio=0.9, mutual=False, mask=msk)
    best, second, bidx = PK.search_by_projection_pallas(
        uv_q, lvl, vq, unpack_bits_pm1(dq), uv_t, lvl, unpack_bits_pm1(dt),
        vt, radius)
    ok = (bidx >= 0) & (best <= MA.TH_HIGH) \
        & (best <= 0.9 * jnp.minimum(second, jnp.float32(MA.BIG)))
    ip = jnp.where(ok, bidx, -1)
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(ix))


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
