"""Game-state bridge tests: animated entities, camera paths, HUD."""
import numpy as np
import jax.numpy as jnp

from merian_quake_tpu.accel.build import build_accel
from merian_quake_tpu.game.hud import HudState, apply_hud
from merian_quake_tpu.game.state import Entity, GameState, orbit_camera
from merian_quake_tpu.models.mdl import load_mdl, write_mdl
from merian_quake_tpu.models.procedural import cornell_box
from merian_quake_tpu.models.types import RenderConfig
from merian_quake_tpu.renderer import init_state, render_frame


def _mini_mdl():
    skin = np.full((8, 8), 100, np.uint8)
    frames = np.asarray(
        [
            [[0, 0, 0], [30, 0, 0], [0, 30, 0], [0, 0, 30]],
            [[0, 0, 10], [30, 0, 10], [0, 30, 10], [0, 0, 40]],
        ],
        np.float32,
    )
    blob = write_mdl(
        [skin],
        np.asarray([0, 7, 3, 1]),
        np.asarray([0, 0, 7, 3]),
        np.zeros(4, np.int64),
        np.asarray([[0, 1, 2], [0, 2, 3]]),
        np.asarray([1, 1]),
        frames,
        np.asarray([0.2, 0.2, 0.2], np.float32),
        np.asarray([0.0, 0.0, 0.0], np.float32),
    )
    return load_mdl(blob, "mini")


def test_game_state_dynamic_geometry_and_mv():
    gs = GameState(cornell_box(), dynamic_capacity=128)
    m = _mini_mdl()
    ent = gs.add_alias_entity(m, origin=np.asarray([250.0, 250.0, 40.0], np.float32))
    gs.rebuild_atlas()
    scene1, u1 = gs.step(1.0 / 10.0)
    scene2, u2 = gs.step(1.0 / 10.0)
    assert scene1.num_tris == scene2.num_tris  # static shapes
    n_static = gs.static_bundle.scene.num_tris
    v_now = np.asarray(scene2.v0)[n_static : n_static + 2]
    v_prev = np.asarray(scene2.pv0)[n_static : n_static + 2]
    # animated frames → current != previous positions (motion vectors)
    assert np.abs(v_now - v_prev).max() > 0.01
    assert float(u2.cl_time) > float(u1.cl_time)


def test_game_renders_with_entity():
    gs = GameState(cornell_box(), dynamic_capacity=128)
    m = _mini_mdl()
    gs.add_alias_entity(m, origin=np.asarray([280.0, 256.0, 20.0], np.float32))
    gs.rebuild_atlas()
    gs.camera_path = orbit_camera((256, 256, 0), 200, 130, look_at=(256, 256, 60))
    cfg = RenderConfig(width=48, height=32, spp=1)
    state = init_state(cfg)
    for _ in range(2):
        scene, uniforms = gs.step(1.0 / 30.0)
        accel = build_accel(scene, gs.static_bundle.atlas)
        state, out = render_frame(
            accel, gs.static_bundle.atlas, uniforms, cfg, state
        )
    ldr = np.asarray(out["ldr"])
    assert np.isfinite(ldr).all()
    assert ldr.mean() > 0.01
    # moving camera → nonzero motion vectors
    assert np.abs(np.asarray(out["gbuffer"].mv)).max() > 0.1


def test_freeze_time_reproducible():
    gs = GameState(cornell_box(), freeze_time=True)
    s1, u1 = gs.step()
    s2, u2 = gs.step()
    assert float(u1.cl_time) == float(u2.cl_time)
    np.testing.assert_array_equal(np.asarray(s1.v0), np.asarray(s2.v0))


def test_hud_overlay():
    H, W = 64, 96
    img = jnp.full((H, W, 3), 0.5)
    z = jnp.full((H, W), 200.0)
    out = np.asarray(
        apply_hud(img, z, HudState(health=50.0, armor=30.0, liquid=1))
    )
    assert out.shape == (H, W, 3)
    # liquid tint shifts color towards blue
    assert out[5, 5, 2] > out[5, 5, 0]
    # crosshair inverts the center pixel
    c = out[H // 2, W // 2]
    assert abs(float(c[0]) - (1.0 - float(out[5, 5, 0]))) < 0.35
    # health bar area differs from background
    assert np.abs(out[H - 5] - out[5]).max() > 0.05


def test_sprites_and_particles_extraction():
    from merian_quake_tpu.models.spr import load_spr, write_spr
    from merian_quake_tpu.models import materials

    gs = GameState(cornell_box(), dynamic_capacity=256)
    spr_img = np.full((8, 8), 230, np.uint8)  # fullbright
    sprite = load_spr(write_spr([spr_img]), "flame")
    gs.add_sprite_entity(sprite, (250.0, 250.0, 100.0))
    gs.rebuild_atlas()
    # bright + dark particles
    gs.set_particles(
        np.asarray([[200.0, 200.0, 50.0], [220.0, 200.0, 50.0]], np.float32),
        np.asarray([250, 40], np.uint8),
    )
    scene, uniforms = gs.step()
    n_static = gs.static_bundle.scene.num_tris
    flags = np.asarray(scene.flags)[n_static:]
    valid = np.asarray(scene.valid)[n_static:]
    assert (flags[valid] == materials.MAT_FLAGS_SPRITE).sum() == 4
    assert (flags[valid] == materials.MAT_FLAGS_SOLID).sum() == 8  # 2 tets
    emm = np.asarray(scene.solid_emission)[n_static:][valid]
    assert emm.max() > 0  # bright particle emits
    # reproducible: same geometry across re-extracts at frozen time
    gs2 = GameState(cornell_box(), dynamic_capacity=256, freeze_time=True)
    gs2.set_particles(
        np.asarray([[200.0, 200.0, 50.0]], np.float32),
        np.asarray([250], np.uint8),
    )
    s1, _ = gs2.step()
    s2, _ = gs2.step()
    np.testing.assert_array_equal(np.asarray(s1.v0), np.asarray(s2.v0))
