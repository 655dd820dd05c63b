"""Game-host checkpoint/resume (native save.cc + host.py bindings).

The reference checkpoints game state via Quake's own savegame system
(SURVEY.md §5 checkpoint/resume row); this validates the clean-room
equivalent: a restored host must continue the simulation EXACTLY like
the original (same entity trajectories, same time, same RNG stream).
"""
import numpy as np
import pytest

from merian_quake_tpu.game.mod import make_arena


def _snapshot_tuple(live):
    s = live.host.snapshot()
    ps = live.host.player_state()
    return (
        np.asarray(s.origins).copy(),
        np.asarray(s.angles).copy(),
        np.asarray(s.frames).copy(),
        live.host.time,
        np.asarray(ps.origin).copy(),
        ps.health,
    )


def test_save_restore_roundtrip_determinism(tmp_path):
    live = make_arena(dynamic_capacity=256)
    for _ in range(30):
        live.step(1.0 / 30.0, forward=120.0, yaw=15.0)
    blob = live.host.save_state()
    assert len(blob) > 1000

    # branch A: continue the original 20 more frames
    for _ in range(20):
        live.step(1.0 / 30.0, forward=60.0, yaw=40.0)
    ref = _snapshot_tuple(live)

    # branch B: fresh host, restore, replay the same inputs
    live2 = make_arena(dynamic_capacity=256)
    live2.host.restore_state(blob)
    for _ in range(20):
        live2.step(1.0 / 30.0, forward=60.0, yaw=40.0)
    got = _snapshot_tuple(live2)

    np.testing.assert_array_equal(got[0], ref[0])  # origins
    np.testing.assert_array_equal(got[1], ref[1])  # angles
    np.testing.assert_array_equal(got[2], ref[2])  # anim frames
    assert got[3] == ref[3]  # server time
    np.testing.assert_array_equal(got[4], ref[4])  # player origin
    assert got[5] == ref[5]  # health


def test_save_file_roundtrip(tmp_path):
    live = make_arena(dynamic_capacity=256)
    for _ in range(10):
        live.step(1.0 / 30.0)
    path = str(tmp_path / "quick.sav")
    live.host.save(path)
    t_saved = live.host.time

    live2 = make_arena(dynamic_capacity=256)
    live2.host.load(path)
    assert live2.host.time == t_saved
    # restored world keeps simulating without faults
    for _ in range(5):
        live2.step(1.0 / 30.0)
    assert live2.host.time > t_saved


def test_restore_rejects_garbage():
    live = make_arena(dynamic_capacity=256)
    with pytest.raises(RuntimeError):
        live.host.restore_state(b"not a savegame at all")
