import numpy as np
import jax.numpy as jnp

from noetic_slam_tpu.config.params import TsdfConfig
from noetic_slam_tpu.io.meshing import extract_mesh
from noetic_slam_tpu.io.export import write_ply_mesh
from noetic_slam_tpu.models import tsdf


def _integrate_sphere(cfg, st, radius=2.0, n=20000, rng=None):
    """Scan a sphere surface from its center."""
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = (v * radius).astype(np.float32)
    return tsdf.integrate(cfg, st, jnp.asarray(pts), jnp.ones((n,), bool),
                          jnp.zeros(3))


def test_mesh_sphere(tmp_path, rng):
    cfg = TsdfConfig(voxel_size=0.1, truncation=0.3, max_blocks=4096,
                     space_carving=False)
    st = tsdf.init_tsdf(cfg)
    for _ in range(4):
        st = _integrate_sphere(cfg, st, rng=rng)

    verts, faces = extract_mesh(cfg, st)
    assert len(verts) > 200
    assert len(faces) > 200
    # vertices lie near the sphere surface
    r = np.linalg.norm(verts, axis=-1)
    assert np.percentile(np.abs(r - 2.0), 90) < 0.15, r.mean()
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # every face non-degenerate
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    assert (area > 0).mean() > 0.95

    n = write_ply_mesh(str(tmp_path / "sphere.ply"), verts, faces)
    assert n == len(faces)


def test_mesh_empty_state():
    cfg = TsdfConfig(max_blocks=16)
    st = tsdf.init_tsdf(cfg)
    verts, faces = extract_mesh(cfg, st)
    assert len(verts) == 0 and len(faces) == 0
