"""Asset loader tests against synthetic in-memory files (no game data)."""
import struct

import numpy as np

from merian_quake_tpu.models import materials
from merian_quake_tpu.models.bsp import load_bsp, parse_entities, parse_worldspawn_sun, texture_flags
from merian_quake_tpu.models.extract import scene_from_bsp
from merian_quake_tpu.models.mdl import load_mdl, write_mdl
from merian_quake_tpu.models.pak import PakFile, write_pak
from merian_quake_tpu.models import palette as pal


def _build_bsp(entities=b'{ "classname" "worldspawn" "_sunlight" "150" }'):
    """A miniature BSP29: one square face (two walls would need planes).

    Face: quad in the z=0 plane, texture 'floor1'.
    """
    verts = np.asarray(
        [[0, 0, 0], [64, 0, 0], [64, 64, 0], [0, 64, 0]], "<f4"
    )
    # plane z=0, normal +z, type 2
    planes = struct.pack("<4fi", 0, 0, 1, 0, 2)
    # texture: 16x16 indexed
    tex_pix = np.arange(256, dtype=np.uint8).reshape(16, 16)
    mip = b"floor1".ljust(16, b"\0") + struct.pack("<ii", 16, 16)
    mip += struct.pack("<4i", 40, 40 + 256, 40 + 256 + 64, 40 + 256 + 64 + 16)
    mip += tex_pix.tobytes() + b"\0" * (64 + 16 + 4)
    textures = struct.pack("<ii", 1, 8) + mip
    texinfo = struct.pack("<8f2i", 1 / 4, 0, 0, 0, 0, 1 / 4, 0, 0, 0, 0)
    edges = np.asarray([[0, 0], [0, 1], [1, 2], [2, 3], [3, 0]], "<u2")
    surfedges = np.asarray([1, 2, 3, 4], "<i4")
    face = struct.pack("<HHiHH4Bi", 0, 0, 0, 4, 0, 0, 0, 0, 0, -1)
    model = struct.pack("<9f7i", 0, 0, 0, 64, 64, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)

    lumps = {
        0: entities + b"\0",
        1: planes,
        2: textures,
        3: verts.tobytes(),
        6: texinfo,
        7: face,
        12: edges.tobytes(),
        13: surfedges.tobytes(),
        14: model,
    }
    header_size = 4 + 15 * 8
    body = b""
    offsets = {}
    pos = header_size
    for i in range(15):
        data = lumps.get(i, b"")
        offsets[i] = (pos, len(data))
        body += data
        pos += len(data)
    header = struct.pack("<i", 29)
    for i in range(15):
        header += struct.pack("<ii", *offsets[i])
    return header + body


def test_pak_roundtrip(tmp_path):
    p = str(tmp_path / "test.pak")
    files = {"maps/test.bsp": b"hello bsp", "gfx/palette.lmp": bytes(768)}
    write_pak(p, files)
    pak = PakFile(p)
    assert "maps/test.bsp" in pak
    assert pak.read("MAPS/TEST.BSP") == b"hello bsp"
    assert len(pak.read("gfx/palette.lmp")) == 768


def test_entities_parser():
    ents = parse_entities(
        '{ "classname" "worldspawn" "message" "Test Map" }\n'
        '{ "classname" "light" "origin" "1 2 3" }'
    )
    assert len(ents) == 2
    assert ents[0]["message"] == "Test Map"
    assert ents[1]["origin"] == "1 2 3"


def test_texture_flags():
    assert texture_flags("*lava1") == materials.MAT_FLAGS_LAVA
    assert texture_flags("*slime0") == materials.MAT_FLAGS_SLIME
    assert texture_flags("*teleport") == materials.MAT_FLAGS_TELE
    assert texture_flags("*water2") == materials.MAT_FLAGS_WATER
    assert texture_flags("sky4") == materials.MAT_FLAGS_SKY
    assert texture_flags("wall3") == materials.MAT_FLAGS_NONE


def test_bsp_load_and_extract():
    data = _build_bsp()
    bsp = load_bsp(data)
    assert len(bsp.faces) == 1
    assert bsp.faces[0].vertices.shape == (4, 3)
    assert bsp.textures[0].name == "floor1"
    assert bsp.textures[0].pixels.shape == (16, 16)
    sun_dir, sun_color = parse_worldspawn_sun(bsp.entities)
    assert sun_color.max() > 0  # _sunlight 150 → enabled
    assert sun_dir[2] > 0  # default mangle points sun upward in sky

    bundle = scene_from_bsp(bsp)
    scene = bundle.scene
    n_valid = int(np.asarray(scene.valid).sum())
    assert n_valid == 2  # quad → 2 triangles
    # winding: normals must match the face plane (+z)
    v0 = np.asarray(scene.v0)[:n_valid]
    v1 = np.asarray(scene.v1)[:n_valid]
    v2 = np.asarray(scene.v2)[:n_valid]
    n = np.cross(v2 - v0, v1 - v0)
    assert (n[:, 2] > 0).all()
    # UV: texinfo s/t = x/4, y/4 over 16px → corner (64,64) → uv (1,1)
    st = np.asarray(scene.st)[:n_valid]
    assert st.max() <= 1.01 and st.min() >= -0.01


def test_mdl_roundtrip():
    skin = np.arange(64, dtype=np.uint8).reshape(8, 8)
    uv_s = np.asarray([0, 7, 3])
    uv_t = np.asarray([0, 0, 7])
    onseam = np.asarray([0, 0, 0])
    tris = np.asarray([[0, 1, 2]])
    faces_front = np.asarray([1])
    frames = np.asarray(
        [
            [[0, 0, 0], [16, 0, 0], [0, 16, 0]],
            [[0, 0, 8], [16, 0, 8], [0, 16, 8]],
        ],
        np.float32,
    )
    scale = np.asarray([0.1, 0.1, 0.1], np.float32)
    translate = np.asarray([0.0, 0.0, 0.0], np.float32)
    blob = write_mdl(
        [skin], uv_s, uv_t, onseam, tris, faces_front, frames, scale, translate
    )
    m = load_mdl(blob, "test")
    assert m.skin_width == 8 and m.skin_height == 8
    assert m.frames.shape == (2, 3, 3)
    np.testing.assert_allclose(m.frames[0], frames[0], atol=0.11)
    np.testing.assert_allclose(m.frames[1][:, 2], 8.0, atol=0.11)
    assert m.uv.shape == (1, 3, 2)
    np.testing.assert_allclose(m.uv[0, 1, 0], (7 + 0.5) / 8, atol=1e-6)


def test_palette_conventions():
    p = pal.default_palette()
    assert p.shape == (256, 3)
    pix = np.asarray([[10, 230], [255, 240]], np.uint8)
    rgba = pal.indexed_to_rgba(pix, p, fence=True)
    assert rgba[1, 0, 3] == 0  # index 255 transparent on fence
    assert rgba[0, 0, 3] == 255
    fb = pal.fullbright_mask(pix)
    assert fb.tolist() == [[False, True], [False, True]]


def test_worldspawn_sun_reference_conventions():
    """quake_node.cpp:231-313 semantics: brightest of sunlight/2/3 by
    luminance at intensity/4000, sun_mangle yaw-flip, the ad_tears
    patch table, and the hue-preserving MAX_SUN_COLOR clamp."""
    import numpy as np

    # brightest-by-luminance wins; colors scale by intensity/4000
    ents = [{
        "classname": "worldspawn",
        "_sunlight": "100",
        "_sunlight2": "400",
        "_sunlight2_color": "1 0.5 0.25",
    }]
    d, col = parse_worldspawn_sun(ents)
    np.testing.assert_allclose(
        col, np.asarray([1, 0.5, 0.25]) * 400 / 4000.0, rtol=1e-6
    )
    # default direction (no mangle) = normalized (1,1,1)
    np.testing.assert_allclose(d, np.ones(3) / np.sqrt(3), rtol=1e-6)

    # sun_mangle: first = yaw (flipped 180), second = pitch
    ents = [{"classname": "worldspawn", "_sun_mangle": "0 -90 0"}]
    d, _ = parse_worldspawn_sun(ents)
    np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)  # straight up
    ents = [{"classname": "worldspawn", "_sun_mangle": "0 0 0"}]
    d, _ = parse_worldspawn_sun(ents)
    np.testing.assert_allclose(d, [-1, 0, 0], atol=1e-6)  # yaw flip

    # ad_tears patch (sky prefix match)
    ents = [{"classname": "worldspawn", "sky": "stormydays_",
             "_sunlight": "100"}]
    d, col = parse_worldspawn_sun(ents)
    np.testing.assert_allclose(d, np.asarray([1, -1, 1]) / np.sqrt(3),
                               rtol=1e-6)
    np.testing.assert_allclose(col, [6.6, 6.0, 5.4], rtol=1e-6)

    # fp16 overflow clamp preserves hue
    from merian_quake_tpu.models import materials

    ents = [{"classname": "worldspawn", "_sunlight": "400000",
             "_sunlight_color": "1 0.5 0.25"}]
    _, col = parse_worldspawn_sun(ents)
    assert abs(col.max() - materials.MAX_SUN_COLOR) < 1e-4
    np.testing.assert_allclose(col / col[0], [1, 0.5, 0.25], rtol=1e-5)
