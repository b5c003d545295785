"""Unit tests for the planar scatter-add kernel (ops/pallas_scatter.py):
the Pallas kernel (interpret mode on CPU), the XLA planar fallback, and
the direct texel-major scatter must all agree, including duplicate
texels and fully-masked calls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_tpu.ops.pallas_scatter import (
    ROW_CHUNK,
    from_planar,
    planar_rows,
    scatter_add_planar,
    to_planar,
)


def _direct(p, texel, contrib, mask):
    out = np.zeros((p, 3), np.float32)
    m = np.asarray(mask)
    np.add.at(out, np.asarray(texel)[m], np.asarray(contrib)[m])
    return out


def _xla_planar(gplanar, texel, contrib, mask):
    j = texel // 128
    lane = texel % 128
    c = jnp.where(mask[:, None], contrib, 0.0)
    return gplanar.at[:, j, lane].add(c.T)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("p", [257, 4096])
def test_kernel_matches_direct(seed, p):
    rng = np.random.RandomState(seed)
    n = 700  # not a ROW_CHUNK multiple: exercises padding
    texel = jnp.asarray(rng.randint(0, p, n), jnp.int32)
    contrib = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mask = jnp.asarray(rng.rand(n) < 0.5)
    g0 = jnp.zeros((3, planar_rows(p), 128), jnp.float32)

    got = from_planar(
        scatter_add_planar(g0, texel, contrib, mask, interpret=True), p
    )
    want = _direct(p, texel, contrib, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)

    got_xla = from_planar(_xla_planar(g0, texel, contrib, mask), p)
    np.testing.assert_allclose(np.asarray(got_xla), want, rtol=1e-6, atol=1e-7)


def test_duplicates_accumulate():
    p = 300
    n = ROW_CHUNK
    texel = jnp.full((n,), 42, jnp.int32)
    contrib = jnp.ones((n, 3), jnp.float32)
    mask = jnp.ones((n,), bool)
    g0 = jnp.zeros((3, planar_rows(p), 128), jnp.float32)
    got = from_planar(
        scatter_add_planar(g0, texel, contrib, mask, interpret=True), p
    )
    assert np.allclose(np.asarray(got)[42], n)
    assert np.asarray(got).sum() == pytest.approx(3 * n)


def test_all_masked_is_identity():
    p = 1000
    g0 = to_planar(jnp.asarray(np.random.RandomState(0).rand(p, 3),
                               jnp.float32))
    texel = jnp.zeros((64,), jnp.int32)
    contrib = jnp.ones((64, 3), jnp.float32)
    got = scatter_add_planar(
        g0, texel, contrib, jnp.zeros((64,), bool), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(g0))


def test_kernel_compiled_on_tpu_matches_direct():
    """Compiled (non-interpret) kernel correctness.  Interpret mode
    populates output blocks from the aliased input; REAL TPU leaves
    them undefined — this is the test that would have caught the
    uninitialized-table bug (gradient norms ~1e3).  Skips off-TPU."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (compiled Mosaic path)")
    rng = np.random.RandomState(3)
    p = 4096
    n = 3 * ROW_CHUNK + 17
    texel = jnp.asarray(rng.randint(0, p, n), jnp.int32)
    contrib = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mask = jnp.asarray(rng.rand(n) < 0.3)
    base = jnp.asarray(rng.uniform(0, 1, (p, 3)), jnp.float32)
    got = from_planar(
        scatter_add_planar(to_planar(base), texel, contrib, mask), p
    )
    want = np.asarray(base) + _direct(p, texel, contrib, mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_planar_roundtrip():
    p = 777
    x = jnp.asarray(np.random.RandomState(1).rand(p, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(from_planar(to_planar(x), p)), np.asarray(x)
    )
