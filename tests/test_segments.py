"""ops/segments.py vs naive per-cell reference."""
import jax.numpy as jnp
import numpy as np

from merian_quake_tpu.ops import segments


def test_sort_segments_structure(rng):
    m, s = 4096, 37
    cells = rng.integers(0, s, m).astype(np.int32)
    vals = rng.normal(size=m).astype(np.float32)
    segs, (v,) = segments.sort_segments(jnp.asarray(cells), [jnp.asarray(vals)])
    cs = np.asarray(segs.cell)
    assert (np.diff(cs) >= 0).all()
    # sorted values follow their cell
    order = np.argsort(cells, kind="stable")
    np.testing.assert_allclose(
        np.sort(np.asarray(v)[cs == 5]), np.sort(vals[cells == 5])
    )
    # boundaries
    is_start = np.asarray(segs.is_start)
    is_end = np.asarray(segs.is_end)
    assert is_start[0] and is_end[-1]
    assert (is_start[1:] == (cs[1:] != cs[:-1])).all()
    assert (is_end[:-1] == (cs[:-1] != cs[1:])).all()
    # start_idx/end_idx bracket each row's segment
    si = np.asarray(segs.start_idx)
    ei = np.asarray(segs.end_idx)
    i = np.arange(m)
    assert (si <= i).all() and (ei >= i).all()
    assert (cs[si] == cs).all() and (cs[ei] == cs).all()
    assert is_start[si].all() and is_end[ei].all()


def test_tiebreak_winner_at_end(rng):
    m, s = 2048, 11
    cells = rng.integers(0, s, m).astype(np.int32)
    race = rng.random(m).astype(np.float32)
    payload = np.arange(m, dtype=np.int32)
    segs, (p,) = segments.sort_segments(
        jnp.asarray(cells), [jnp.asarray(payload)], tiebreak=jnp.asarray(-race)
    )
    p = np.asarray(p)
    ei = np.asarray(segs.end_idx)
    for c in range(s):
        want = payload[cells == c][np.argmin(race[cells == c])]
        rows = np.asarray(segs.cell) == c
        got = p[ei[rows][0]]
        assert got == want, c


def test_seg_sum_matches_bincount(rng):
    m, s = 8192, 97
    cells = rng.integers(0, s, m).astype(np.int32)
    vals = rng.normal(size=(m, 3)).astype(np.float32)
    segs, cols = segments.sort_segments(
        jnp.asarray(cells), [jnp.asarray(vals[:, i]) for i in range(3)]
    )
    tot = segments.seg_sum(segs, jnp.stack(cols, axis=1))
    tot = np.asarray(tot)
    cs = np.asarray(segs.cell)
    for c in [0, 3, 50, 96]:
        want = vals[cells == c].sum(axis=0)
        got = tot[cs == c]
        np.testing.assert_allclose(got, np.broadcast_to(want, got.shape), rtol=2e-4, atol=1e-4)


def test_broadcast_and_compact(rng):
    m, s = 1024, 19
    cells = rng.integers(0, s, m).astype(np.int32)
    vals = rng.normal(size=m).astype(np.float32)
    segs, (v,) = segments.sort_segments(jnp.asarray(cells), [jnp.asarray(vals)])
    bc = segments.broadcast_from_end(segs, v)
    v = np.asarray(v)
    np.testing.assert_allclose(np.asarray(bc), v[np.asarray(segs.end_idx)])
    cap = 32
    packed = segments.compact_ends(segs, jnp.stack([v, v * 2], axis=1), cap)
    packed = np.asarray(packed)
    cs = np.asarray(segs.cell)
    uniq = np.unique(cs)
    for k, c in enumerate(uniq):
        last = v[cs == c][-1]
        np.testing.assert_allclose(packed[k], [last, 2 * last], rtol=1e-6)
    assert (packed[len(uniq):] == 0).all()


def test_sentinel_rows_sort_last(rng):
    m, s = 512, 7
    cells = rng.integers(0, s, m).astype(np.int32)
    mask = rng.random(m) < 0.3
    cells_m = np.where(mask, cells, s)
    segs, _ = segments.sort_segments(jnp.asarray(cells_m), [])
    cs = np.asarray(segs.cell)
    assert (cs[: mask.sum()] < s).all()
    assert (cs[mask.sum():] == s).all()
