import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_mp_env_tpu.ops.raycast import (
    make_tri_soup,
    ray_vs_tris,
    ray_vs_capsules,
    sphere_cast_vs_tris,
)


@pytest.fixture(scope="module")
def floor_soup():
    # unit floor at z=0 spanning [-100, 100]^2, and a wall at y=50
    tris = np.array(
        [
            [[-100, -100, 0], [100, -100, 0], [100, 100, 0]],
            [[-100, -100, 0], [100, 100, 0], [-100, 100, 0]],
            [[-100, 50, 0], [100, 50, 0], [100, 50, 100]],
            [[-100, 50, 0], [100, 50, 100], [-100, 50, 100]],
        ],
        np.float32,
    )
    return make_tri_soup(tris, pad_to=8)


def test_ray_hits_floor(floor_soup):
    o = jnp.array([0.0, 0.0, 10.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t = ray_vs_tris(o, d, floor_soup)
    assert np.isclose(float(t), 10.0, atol=1e-4)


def test_ray_miss(floor_soup):
    o = jnp.array([0.0, 0.0, 10.0])
    d = jnp.array([0.0, 0.0, 1.0])
    t = ray_vs_tris(o, d, floor_soup)
    assert np.isinf(float(t))


def test_ray_hits_wall(floor_soup):
    o = jnp.array([0.0, 0.0, 10.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_vs_tris(o, d, floor_soup)
    assert np.isclose(float(t), 50.0, atol=1e-4)


def test_ray_batch_shape(floor_soup):
    o = jnp.zeros((5, 7, 3)) + jnp.array([0.0, 0.0, 10.0])
    d = jnp.zeros((5, 7, 3)) + jnp.array([0.0, 0.0, -1.0])
    t = ray_vs_tris(o, d, floor_soup)
    assert t.shape == (5, 7)
    assert np.allclose(np.asarray(t), 10.0, atol=1e-4)


def test_sphere_cast_face(floor_soup):
    o = jnp.array([0.0, 0.0, 20.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, n = sphere_cast_vs_tris(o, d, 5.0, floor_soup)
    # sphere of radius 5 touches floor when center is at z=5 -> t=15
    assert np.isclose(float(t), 15.0, atol=1e-3)
    assert np.allclose(np.asarray(n), [0, 0, 1], atol=1e-4)


def test_sphere_cast_start_overlap(floor_soup):
    o = jnp.array([0.0, 0.0, 3.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t, n = sphere_cast_vs_tris(o, d, 5.0, floor_soup)
    assert float(t) == 0.0
    assert float(n[2]) > 0.9  # depenetration points up


def test_sphere_cast_edge():
    # single triangle; sweep a sphere past its edge
    tris = np.array(
        [[[0, 0, 0], [10, 0, 0], [0, 10, 0]]], np.float32
    )
    soup = make_tri_soup(tris, pad_to=8)
    # sphere moving down, offset from the triangle in x so only the edge
    # at x=0..10,y=0 can be hit
    o = jnp.array([5.0, -3.0, 20.0])
    d = jnp.array([0.0, 0.0, -1.0])
    t, n = sphere_cast_vs_tris(o, d, 5.0, soup)
    # hits edge capsule: center at height sqrt(r^2 - 3^2) = 4 above edge
    assert np.isclose(float(t), 16.0, atol=1e-3)


def test_ray_vs_capsules():
    base = jnp.array([[0.0, 100.0, 0.0], [50.0, 0.0, 0.0]])
    mask = jnp.array([True, True])
    o = jnp.array([0.0, 0.0, 30.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_vs_capsules(o, d, base, 15.0, 35.0, mask)
    assert t.shape == (2,)
    # capsule 0: axis at y=100, radius 15 -> hit at y=85
    assert np.isclose(float(t[0]), 85.0, atol=1e-3)
    # capsule 1 at x=50: ray along +y at x=0 misses
    assert np.isinf(float(t[1]))


def test_capsule_masked():
    base = jnp.array([[0.0, 100.0, 0.0]])
    o = jnp.array([0.0, 0.0, 30.0])
    d = jnp.array([0.0, 1.0, 0.0])
    t = ray_vs_capsules(o, d, base, 15.0, 35.0, jnp.array([False]))
    assert np.isinf(float(t[0]))


def test_brute_force_reference_consistency(floor_soup):
    """Random rays: jit vs non-jit identical."""
    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (64, 3), minval=-50, maxval=50) + jnp.array(
        [0.0, 0.0, 30.0]
    )
    d = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t1 = ray_vs_tris(o, d, floor_soup)
    t2 = jax.jit(lambda o, d: ray_vs_tris(o, d, floor_soup))(o, d)
    assert np.array_equal(np.asarray(t1), np.asarray(t2), equal_nan=True)
