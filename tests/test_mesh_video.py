"""Mesh extraction and video generation tests."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nerf_projects_tpu.pipeline.mesh import (
    extract_mesh_from_field,
    marching_tetrahedra,
    save_obj,
)
from nerf_projects_tpu.pipeline.video import render_video


class TestMarchingTets:
    def test_sphere_surface(self):
        n = 32
        xs = np.linspace(-1, 1, n)
        gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
        field = 1.0 - np.sqrt(gx**2 + gy**2 + gz**2)  # iso 0.5 -> r=0.5
        verts, tris = marching_tetrahedra(field, 0.5)
        assert len(verts) > 100
        assert len(tris) > 100
        # vertices lie near the r=0.5 sphere (in world units)
        world = verts * (2 / (n - 1)) - 1
        r = np.linalg.norm(world, axis=1)
        assert abs(r.mean() - 0.5) < 0.05
        assert r.std() < 0.05
        assert tris.max() < len(verts)

    def test_empty_field(self):
        verts, tris = marching_tetrahedra(np.zeros((8, 8, 8)), 0.5)
        assert len(verts) == 0 and len(tris) == 0

    def test_full_field_no_surface(self):
        verts, tris = marching_tetrahedra(np.ones((8, 8, 8)), 0.5)
        assert len(tris) == 0

    def test_extract_from_field_fn(self, tmp_path):
        def sigma_fn(pts):
            return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.6, 100.0, 0.0)

        verts, tris = extract_mesh_from_field(
            sigma_fn, reso=24, radius=1.0, iso=25.0, chunk=4096
        )
        assert len(verts) > 50
        r = np.linalg.norm(verts, axis=1)
        assert abs(r.mean() - 0.6) < 0.12
        p = str(tmp_path / "mesh.obj")
        save_obj(p, verts, tris)
        lines = open(p).read().splitlines()
        assert sum(1 for l in lines if l.startswith("v ")) == len(verts)
        assert sum(1 for l in lines if l.startswith("f ")) == len(tris)


class TestVideo:
    def test_render_video_writes_animation(self, tmp_path):
        H = W = 16

        def render(pose):
            img = np.zeros((H, W, 3))
            img[:, :, 0] = float(pose[0, 3]) % 1.0
            return img

        poses = [np.eye(4) * (i + 1) for i in range(4)]
        frames, anim = render_video(
            render, poses, str(tmp_path), fps=10, basename="test"
        )
        assert len(frames) == 4
        assert os.path.exists(anim)
        assert anim.endswith((".mp4", ".gif"))
