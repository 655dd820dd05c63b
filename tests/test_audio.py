"""Audio mixer tests (the reference's SNDDMA_* seam, headless).

The reference supplies quakespasm's audio backend itself
(snd_extern:true, /root/reference/meson.build:24-27); the rebuild mixes
the captured QC sound events into a WAV (game/audio.py).
"""
import wave

import numpy as np

from merian_quake_tpu.game.audio import (
    AudioMixer, load_wav_bytes, synth_sample,
)


def test_synth_deterministic_and_family_shapes():
    a = synth_sample("weapons/shotgn.wav", 22050)
    b = synth_sample("weapons/shotgn.wav", 22050)
    np.testing.assert_array_equal(a, b)
    assert len(a) > 1000 and np.abs(a).max() > 0.05
    # different names → different waveforms
    c = synth_sample("items/health.wav", 22050)
    assert len(c) != len(a) or float(np.abs(c - a[: len(c)]).max()) > 1e-3


def test_spatialize_rolloff_and_pan():
    listener = np.zeros(3)
    right = np.asarray([0.0, 1.0, 0.0])
    # closer → louder
    ln, rn = AudioMixer.spatialize([100, 0, 0], listener, right, 1.0, 1.0)
    lf, rf = AudioMixer.spatialize([900, 0, 0], listener, right, 1.0, 1.0)
    assert ln + rn > lf + rf
    # beyond clip distance → silent
    lz, rz = AudioMixer.spatialize([2000, 0, 0], listener, right, 1.0, 1.0)
    assert lz == 0.0 and rz == 0.0
    # source on the right → right channel louder
    lr, rr = AudioMixer.spatialize([0, 200, 0], listener, right, 1.0, 1.0)
    assert rr > lr
    # attenuation 0 (full-volume everywhere, no pan)
    l0, r0 = AudioMixer.spatialize([5000, 0, 0], listener, right, 0.7, 0.0)
    assert abs(l0 - 0.7) < 1e-6 and abs(r0 - 0.7) < 1e-6


def test_mixer_event_timing_and_wav(tmp_path):
    m = AudioMixer(rate=11025)
    listener = np.zeros(3)
    right = np.asarray([0.0, 1.0, 0.0])
    m.frame(0.5, [(1, 1, "misc/secret.wav", 1.0, 1.0, [50, 0, 0])],
            listener, right)
    mix = m.render(duration=1.2)
    rms = lambda seg: float(np.sqrt(np.mean(seg**2)))
    assert rms(mix[: int(0.45 * 11025)]) == 0.0  # silent before
    assert rms(mix[int(0.5 * 11025) : int(0.7 * 11025)]) > 1e-3

    path = str(tmp_path / "out.wav")
    n = m.write_wav(path, duration=1.2)
    with wave.open(path, "rb") as w:
        assert w.getnchannels() == 2
        assert w.getframerate() == 11025
        assert w.getnframes() == n == int(1.2 * 11025)


def test_channel_override_truncates():
    m = AudioMixer(rate=11025)
    listener = np.zeros(3)
    right = np.asarray([0.0, 1.0, 0.0])
    ev = lambda t: m.frame(
        t, [(7, 2, "doors/drclos4.wav", 1.0, 0.5, [10, 0, 0])],
        listener, right,
    )
    ev(0.0)
    n_full = len(m._voices[0].sample)
    ev(0.1)  # same (ent, chan): truncates the first voice at 0.1 s
    assert len(m._voices) == 2
    assert len(m._voices[0].sample) == int(0.1 * 11025) < n_full


def test_wav_loader_roundtrip():
    # synthesize a wav via the writer, parse it back with the loader
    rate = 11025
    t = np.arange(rate) / rate
    x = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
    import io
    import wave as wv

    buf = io.BytesIO()
    with wv.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    r2, y = load_wav_bytes(buf.getvalue())
    assert r2 == rate
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_live_game_secret_sound_reaches_wav(tmp_path):
    """End-to-end: the arena mod's secret trigger plays
    misc/secret.wav; the mixer must capture it at the right time with
    nonzero samples (VERDICT r2 #7 'done' criterion)."""
    from merian_quake_tpu.game.live import angle_vectors
    from merian_quake_tpu.game.mod import make_arena

    live = make_arena(dynamic_capacity=512)
    m = AudioMixer(rate=11025)
    dx, dy = 256.0 - 64.0, 140.0 - 256.0
    yaw = float(np.degrees(np.arctan2(dy, dx)))
    event_t = None
    for _ in range(220):
        live.step(1.0 / 30.0, forward=320.0, yaw=yaw)
        ps = live.host.player_state()
        _, right, _ = angle_vectors(ps.view_angles)
        events = live.host.frame_sound_events()
        m.frame(live.host.time, events, ps.origin + ps.view_ofs, right)
        if event_t is None and any(
            "secret" in e[2] for e in events
        ):
            event_t = live.host.time
        if event_t is not None:
            break
    assert event_t is not None, "secret sound never fired"
    path = str(tmp_path / "run.wav")
    m.write_wav(path, duration=event_t + 0.5)
    with wave.open(path, "rb") as w:
        pcm = np.frombuffer(
            w.readframes(w.getnframes()), "<i2"
        ).reshape(-1, 2)
    i0 = int(event_t * 11025)
    win = pcm[i0 : i0 + 11025 // 4]
    assert np.abs(win).max() > 100, "no audible samples at the event time"
