"""Statistical quality of the per-ray counter-hash scatter RNG
(integrator.ray_uniforms).  The PRF replaces per-ray threefry fold-ins
for TPU lane-layout reasons; these tests pin the Monte Carlo-relevant
properties: marginal uniformity, independence across ids / bounces /
columns / keys, and layout invariance."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_tpu.render.integrator import ray_uniforms


def _draw(key=0, n=20000, bounce=3, cols=12):
    ids = jnp.arange(n, dtype=jnp.int32)
    return np.asarray(ray_uniforms(jax.random.key(key), ids, bounce, cols))


def test_marginals_uniform():
    u = _draw()
    n = u.size
    # mean 1/2 +- 5 sigma, var 1/12 +- 5 sigma
    assert abs(u.mean() - 0.5) < 5 * np.sqrt(1 / 12 / n)
    assert abs(u.var() - 1 / 12) < 5 * 0.0745 / np.sqrt(n)
    assert u.min() >= 0.0 and u.max() < 1.0
    # 16-bin chi^2 on the pooled sample: statistic ~ chi2(15)
    hist, _ = np.histogram(u, bins=16, range=(0, 1))
    chi2 = ((hist - n / 16) ** 2 / (n / 16)).sum()
    assert chi2 < 50, chi2  # chi2(15) 99.99% ~ 44


def test_marginals_uniform_large_n():
    """Second sample size (25x the first): chi-square quality must hold
    as N grows, not just at one pinned N (VERDICT r3 item 8).  Also
    checks per-column uniformity so a single bad column cannot hide in
    the pooled statistic."""
    n, cols = 500_000, 4
    u = _draw(key=9, n=n, bounce=1, cols=cols)
    # pooled 64-bin chi^2: statistic ~ chi2(63); 99.99% quantile ~ 106
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    chi2 = ((hist - u.size / 64) ** 2 / (u.size / 64)).sum()
    assert chi2 < 120, chi2
    # per-column 16-bin chi^2 ~ chi2(15); 99.99% ~ 44 (4 columns -> 50)
    for c in range(cols):
        hist, _ = np.histogram(u[:, c], bins=16, range=(0, 1))
        chi2 = ((hist - n / 16) ** 2 / (n / 16)).sum()
        assert chi2 < 50, (c, chi2)
    # 2-D serial test on (u_i, u_{i+1}) pairs within a column: 16x16
    # cells ~ chi2(255); 99.99% ~ 347
    a, b = u[:-1, 0], u[1:, 0]
    h2, _, _ = np.histogram2d(a, b, bins=16, range=((0, 1), (0, 1)))
    e = a.size / 256
    chi2 = ((h2 - e) ** 2 / e).sum()
    assert chi2 < 380, chi2


def test_decorrelated_across_ids_bounces_columns():
    u = _draw()
    # adjacent ids, same column
    for c in (0, 5, 11):
        r = np.corrcoef(u[:-1, c], u[1:, c])[0, 1]
        assert abs(r) < 0.03, (c, r)
    # same id, adjacent columns
    r = np.corrcoef(u[:, 0], u[:, 1])[0, 1]
    assert abs(r) < 0.03, r
    # same ids, consecutive bounces
    v = _draw(bounce=4)
    r = np.corrcoef(u[:, 0], v[:, 0])[0, 1]
    assert abs(r) < 0.03, r
    # different keys decorrelate too
    w = np.asarray(ray_uniforms(jax.random.key(1),
                                jnp.arange(20000, dtype=jnp.int32), 3, 12))
    r = np.corrcoef(u[:, 0], w[:, 0])[0, 1]
    assert abs(r) < 0.03, r


def test_layout_invariance():
    """The defining property: a ray's uniforms depend on its id, not on
    its position in the wavefront."""
    key = jax.random.key(7)
    ids = jnp.asarray([5, 17, 3, 900], jnp.int32)
    perm = jnp.asarray([2, 0, 3, 1], jnp.int32)
    a = np.asarray(ray_uniforms(key, ids, 2, 12))
    b = np.asarray(ray_uniforms(key, ids[perm], 2, 12))
    np.testing.assert_array_equal(a[np.asarray(perm)], b)


def test_key_impl_agnostic():
    """Works for any PRNG impl's key_data width (threefry 2 words,
    rbg 4) and stays deterministic per key."""
    ids = jnp.arange(64, dtype=jnp.int32)
    for impl in ("threefry2x32", "rbg"):
        k = jax.random.key(3, impl=impl)
        a = np.asarray(ray_uniforms(k, ids, 1, 4))
        b = np.asarray(ray_uniforms(k, ids, 1, 4))
        np.testing.assert_array_equal(a, b)
        assert np.isfinite(a).all()
