import jax.numpy as jnp
import numpy as np

from softmac_tpu.engine.sdf import (
    bake_mesh_sdf, sample_sdf_local, sample_sdf_normal_local,
    sample_sdf_normal_world, sdf_params_from_bake,
)


def unit_cube():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 dtype=np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2],   # x=0
        [4, 7, 5], [4, 6, 7],   # x=1
        [0, 4, 5], [0, 5, 1],   # y=0
        [2, 3, 7], [2, 7, 6],   # y=1
        [0, 2, 6], [0, 6, 4],   # z=0
        [1, 5, 7], [1, 7, 3],   # z=1
    ], dtype=np.int32)
    return v, f


def test_bake_cube_sdf():
    v, f = unit_cube()
    bake = bake_mesh_sdf(v, f, margin=0.1, dx=0.05)
    prim = sdf_params_from_bake(bake, jnp.float64)

    pts = np.array([
        [0.5, 0.5, 0.5],    # center: inside, dist -0.5
        [0.5, 0.5, 1.05],   # outside: +0.05
        [0.5, 0.5, 0.9],    # inside near face: -0.1
    ])
    p = tuple(jnp.asarray(pts[:, d]) for d in range(3))
    d = np.asarray(sample_sdf_local(prim, p))
    np.testing.assert_allclose(d, [-0.5, 0.05, -0.1], atol=0.03)
    # beyond the table box: BIG (the reference's detail=False semantics)
    p_far = tuple(jnp.asarray(np.array([v])) for v in (0.5, 0.5, 2.0))
    assert float(sample_sdf_local(prim, p_far)[0]) > 1e9


def test_neighborhood_sampler_matches_stencil():
    """The single-row-gather sampler must equal the 8-gather sampler."""
    v, f = unit_cube()
    bake = bake_mesh_sdf(v, f, margin=0.1, dx=0.07)
    prim = sdf_params_from_bake(bake, jnp.float64)

    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3) * 1.3 - 0.15
    p = tuple(jnp.asarray(pts[:, d]) for d in range(3))

    d_fast, n_fast = sample_sdf_normal_local(prim, p)
    d_ref = sample_sdf_local(prim, p)
    np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_ref), atol=1e-12)
    # normals unit length (or the out-of-box fallback)
    nl = np.sqrt(sum(np.asarray(c) ** 2 for c in n_fast))
    np.testing.assert_allclose(nl, 1.0, atol=1e-6)


def test_world_frame_query_rotation():
    v, f = unit_cube()
    bake = bake_mesh_sdf(v, f, margin=0.1, dx=0.05)
    prim = sdf_params_from_bake(bake, jnp.float64)

    # body rotated 90 deg about z, at position (2, 0, 0)
    from softmac_tpu.engine import quat as Q
    q = np.asarray(Q.w2quat(jnp.asarray([0.0, 0.0, np.pi / 2])))
    bp = (jnp.asarray(2.0), jnp.asarray(0.0), jnp.asarray(0.0))
    bq = tuple(jnp.asarray(x) for x in q)

    # world point at body-local cube center
    local_center = np.array([0.5, 0.5, 0.5])
    Rm = np.asarray(Q.quat2mat(jnp.asarray(q)))
    world = Rm @ local_center + np.array([2.0, 0.0, 0.0])
    p = tuple(jnp.asarray(np.array([w])) for w in world)
    d, n = sample_sdf_normal_world(prim, bp, bq, p)
    np.testing.assert_allclose(np.asarray(d), [-0.5], atol=0.03)


def test_ray_aabb_and_sdf_ray():
    """ray_aabb_intersection: slab-method parity cases (hit, miss, axis-
    parallel inside/outside, behind). sdf_ray: BIG/200 miss, tnear+8e-3
    from outside, table SDF from inside (reference mesh.py:120-134)."""
    from softmac_tpu.engine.sdf import (
        BIG, ray_aabb_intersection, sdf_ray_local, sdf_ray_world)

    v, f = unit_cube()
    bake = bake_mesh_sdf(v, f, margin=0.1, dx=0.05)
    prim = sdf_params_from_bake(bake, jnp.float64)

    lo, hi = float(prim.lower[0]), float(prim.upper[0])  # box incl. margin
    o = tuple(jnp.asarray([v], jnp.float64) for v in (-1.0, 0.5, 0.5))
    d = tuple(jnp.asarray([v], jnp.float64) for v in (1.0, 0.0, 0.0))
    hit, tn, tf = ray_aabb_intersection(prim.lower, prim.upper, o, d)
    assert bool(hit[0]) and np.isclose(float(tn[0]), lo + 1.0) \
        and np.isclose(float(tf[0]), hi + 1.0)

    # axis-parallel ray outside a slab -> reject
    o2 = tuple(jnp.asarray([v], jnp.float64) for v in (-1.0, 5.0, 0.5))
    hit2, _, _ = ray_aabb_intersection(prim.lower, prim.upper, o2, d)
    assert not bool(hit2[0])

    # box behind the origin -> miss sentinel
    o3 = tuple(jnp.asarray([v], jnp.float64) for v in (3.0, 0.5, 0.5))
    assert float(sdf_ray_local(prim, o3, d)[0]) == BIG / 200

    # origin outside, ray entering: conservative advance tnear + 8e-3
    assert np.isclose(float(sdf_ray_local(prim, o, d)[0]), lo + 1.0 + 8e-3)

    # origin inside the box: falls back to the table SDF at o
    o4 = tuple(jnp.asarray([v], jnp.float64) for v in (0.5, 0.5, 0.5))
    got = float(sdf_ray_local(prim, o4, d)[0])
    ref = float(sample_sdf_local(prim, o4)[0])
    assert np.isclose(got, ref)

    # world-frame: identity pose matches local
    bp = tuple(jnp.zeros((), jnp.float64) for _ in range(3))
    bq = (jnp.ones((), jnp.float64),) + tuple(
        jnp.zeros((), jnp.float64) for _ in range(3))
    got_w = float(sdf_ray_world(prim, bp, bq, o, d)[0])
    assert np.isclose(got_w, lo + 1.0 + 8e-3)
