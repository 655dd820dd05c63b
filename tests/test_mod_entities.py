"""Arena-mod entity chains that mirror real progs.dat builtin usage
(VERDICT r2 missing #5): func_door pusher movement, monster combat AI
(chase + melee), and trigger_changelevel."""
import numpy as np

from merian_quake_tpu.game.mod import DOOR_MDL, WALKER_MDL, make_arena


def _edict_by_model(live, name):
    names = live.host.model_names
    mi = names.index(name)
    snap = live.host.snapshot(max_out=256)
    for i in range(len(snap.origins)):
        if int(snap.modelindex[i]) == mi:
            return int(snap.edict_ids[i]), snap.origins[i]
    raise AssertionError(f"{name} not found")


def test_door_opens_waits_and_returns():
    live = make_arena(dynamic_capacity=256)
    live.step(1.0 / 30.0)
    eid, o0 = _edict_by_model(live, DOOR_MDL)
    z0 = float(o0[2])
    # walk into the door trigger zone at (420, 80)
    dx, dy = 420.0 - 64.0, 80.0 - 256.0
    yaw = float(np.degrees(np.arctan2(dy, dx)))
    z_max = z0
    for _ in range(200):
        live.step(1.0 / 30.0, forward=320.0, yaw=yaw)
        z = live.host.get_field(eid, "origin", vector=True)[2]
        z_max = max(z_max, float(z))
        if z_max > z0 + 90.0:
            break
    assert z_max > z0 + 90.0, f"door never rose (z_max={z_max}, z0={z0})"
    # stop walking; the door waits then returns to the bottom
    for _ in range(180):
        live.step(1.0 / 30.0, forward=-200.0, yaw=yaw)
    z_end = float(live.host.get_field(eid, "origin", vector=True)[2])
    assert z_end < z0 + 8.0, f"door never returned (z={z_end}, z0={z0})"
    # door state cycled back to closed
    assert live.host.get_field(eid, "state") == 0.0


def test_walker_chases_and_bites():
    live = make_arena(dynamic_capacity=256)
    live.step(1.0 / 30.0)
    # walk toward the walker at (256, 380) to get within sight range
    dx, dy = 256.0 - 64.0, 380.0 - 256.0
    yaw = float(np.degrees(np.arctan2(dy, dx)))
    bit = False
    sounds = []
    for i in range(260):
        fwd = 320.0 if i < 70 else 0.0  # approach, then stand still
        live.step(1.0 / 30.0, forward=fwd, yaw=yaw)
        sounds += [e[2] for e in live.host.frame_sound_events()]
        if live.host.player_state().health < 100.0:
            bit = True
            break
    assert bit, "walker never bit the player"
    assert any("bite" in s for s in sounds), sounds
    # enemy/goalentity fields were driven (combat AI used the builtins)
    eid, _ = _edict_by_model(live, WALKER_MDL)
    assert live.host.get_field_int(eid, "enemy") == live.host.player


def test_exit_zone_requests_changelevel():
    live = make_arena(dynamic_capacity=256)
    assert live.host.changelevel_target == ""
    dx, dy = 64.0 - 64.0, 64.0 - 256.0
    yaw = float(np.degrees(np.arctan2(dy, dx)))
    for _ in range(160):
        live.step(1.0 / 30.0, forward=320.0, yaw=yaw)
        if live.host.changelevel_target:
            break
    assert live.host.changelevel_target == "arena2"
