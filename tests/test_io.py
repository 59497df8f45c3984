import numpy as np
import pytest

from regen3d_tpu.utils.glb import MeshData, SceneData, load_glb, save_glb
from regen3d_tpu.utils.ply import load_ply, save_ply


def _cube():
    v = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ], dtype=np.float32)
    f = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
    ], dtype=np.int32)
    return v, f


class TestPly:
    @pytest.mark.parametrize("ascii_format", [False, True])
    def test_points_roundtrip(self, tmp_path, rng, ascii_format):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        colors = rng.integers(0, 255, size=(100, 3)).astype(np.uint8)
        normals = rng.normal(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "pc.ply")
        save_ply(p, pts, colors=colors, normals=normals, ascii_format=ascii_format)
        data = load_ply(p)
        np.testing.assert_allclose(data.vertices, pts, atol=1e-5)
        np.testing.assert_array_equal(data.colors, colors)
        np.testing.assert_allclose(data.normals, normals, atol=1e-5)
        assert data.faces is None

    @pytest.mark.parametrize("ascii_format", [False, True])
    def test_mesh_roundtrip(self, tmp_path, ascii_format):
        v, f = _cube()
        p = str(tmp_path / "mesh.ply")
        save_ply(p, v, faces=f, ascii_format=ascii_format)
        data = load_ply(p)
        np.testing.assert_allclose(data.vertices, v, atol=1e-6)
        np.testing.assert_array_equal(data.faces, f)


class TestGlb:
    def test_mesh_roundtrip(self, tmp_path, rng):
        v, f = _cube()
        uvs = rng.uniform(size=(8, 2)).astype(np.float32)
        normals = rng.normal(size=(8, 3)).astype(np.float32)
        mesh = MeshData(
            name="chair__(100, 200)", vertices=v, faces=f, uvs=uvs,
            normals=normals, base_color=np.asarray([0.8, 0.2, 0.1, 1.0]),
            metallic=0.2, roughness=0.5,
        )
        p = str(tmp_path / "m.glb")
        save_glb(p, SceneData(meshes=[mesh]))
        scene = load_glb(p)
        assert len(scene.meshes) == 1
        m = scene.meshes[0]
        assert m.name == "chair__(100, 200)"
        np.testing.assert_allclose(m.vertices, v, atol=1e-6)
        np.testing.assert_array_equal(m.faces, f)
        np.testing.assert_allclose(m.uvs, uvs, atol=1e-6)
        np.testing.assert_allclose(m.base_color, [0.8, 0.2, 0.1, 1.0], atol=1e-6)
        assert m.metallic == pytest.approx(0.2)
        assert m.roughness == pytest.approx(0.5)

    def test_multi_mesh_scene(self, tmp_path):
        v, f = _cube()
        scene = SceneData(meshes=[
            MeshData(name="a", vertices=v, faces=f),
            MeshData(name="b", vertices=v + 5.0, faces=f),
        ])
        p = str(tmp_path / "s.glb")
        save_glb(p, scene)
        loaded = load_glb(p)
        assert sorted(m.name for m in loaded.meshes) == ["a", "b"]

    def test_texture_embedding(self, tmp_path):
        import io
        from PIL import Image
        img = Image.new("RGB", (4, 4), (255, 0, 0))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        v, f = _cube()
        mesh = MeshData(name="tex", vertices=v, faces=f,
                        uvs=np.zeros((8, 2), np.float32), texture_png=buf.getvalue())
        p = str(tmp_path / "t.glb")
        save_glb(p, SceneData(meshes=[mesh]))
        loaded = load_glb(p)
        assert loaded.meshes[0].texture_png is not None
        img2 = Image.open(io.BytesIO(loaded.meshes[0].texture_png))
        assert img2.size == (4, 4)

    def test_transformed(self):
        v, f = _cube()
        M = np.eye(4)
        M[:3, 3] = [1, 2, 3]
        m = MeshData(name="x", vertices=v, faces=f).transformed(M)
        np.testing.assert_allclose(m.vertices, v + [1, 2, 3], atol=1e-6)


class TestArtifacts:
    def test_finding_stem_codec(self):
        from regen3d_tpu.artifacts import finding_stem, parse_finding_stem
        stem = finding_stem("plant in pot", (860, 264))
        assert stem == "plant in pot__(860, 264)"
        parsed = parse_finding_stem(stem)
        assert parsed == ("plant in pot", (860, 264))
        assert parse_finding_stem("empty_room") is None

    def test_layout(self, tmp_path):
        from regen3d_tpu.artifacts import Artifacts
        from regen3d_tpu.config import default_config
        out = str(tmp_path / "output")
        a = Artifacts(default_config(out))
        assert a.findings_fullsize == f"{out}/findings/fullSize"
        assert a.camera_npz == f"{out}/pre_3D/camera.npz"
        assert a.combined_scene_glb == f"{out}/glb/scene/combined_scene.glb"
        assert a.asset_glb("chair__(1, 2)") == f"{out}/3D/chair__(1, 2)/chair__(1, 2).glb"

    def test_reference_config_loads(self):
        from regen3d_tpu.config import load_config
        cfg = load_config("/root/reference/src/config.yaml")
        assert cfg["seed"] == 1234567
        assert cfg["use_5DOF"] is True
        assert cfg["sigma"] == pytest.approx(5e-7)
        assert cfg.path("output").endswith("/reference/output")


class TestGlbNodeTransforms:
    def test_node_trs_applied_on_load(self, tmp_path):
        """A GLB whose node carries a TRS transform loads with world-space
        vertices (the reference's assets use node transforms)."""
        import json
        import struct
        v, f = _cube()
        # build a minimal GLB by hand with a translated+scaled node
        vbytes = v.astype("<f4").tobytes()
        ibytes = f.astype("<u4").tobytes()
        binchunk = vbytes + ibytes
        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0, "translation": [1, 2, 3],
                       "scale": [2, 2, 2], "name": "obj"}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1, "mode": 4}]}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 8,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5125,
                 "count": int(f.size), "type": "SCALAR"},
            ],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(vbytes)},
                {"buffer": 0, "byteOffset": len(vbytes),
                 "byteLength": len(ibytes)},
            ],
            "buffers": [{"byteLength": len(binchunk)}],
        }
        jbytes = json.dumps(gltf).encode()
        jbytes += b" " * ((4 - len(jbytes) % 4) % 4)
        binchunk += b"\x00" * ((4 - len(binchunk) % 4) % 4)
        total = 12 + 8 + len(jbytes) + 8 + len(binchunk)
        p = str(tmp_path / "trs.glb")
        with open(p, "wb") as fh:
            fh.write(struct.pack("<III", 0x46546C67, 2, total))
            fh.write(struct.pack("<II", len(jbytes), 0x4E4F534A))
            fh.write(jbytes)
            fh.write(struct.pack("<II", len(binchunk), 0x004E4942))
            fh.write(binchunk)
        scene = load_glb(p)
        assert len(scene.meshes) == 1
        np.testing.assert_allclose(scene.meshes[0].vertices,
                                   v * 2.0 + [1, 2, 3], atol=1e-5)
