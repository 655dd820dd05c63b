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
    np.testing.assert_allclose(
        np.sort(np.asarray(v)[cs == 5]), np.sort(vals[cells == 5])
    )
    # boundaries
    is_start = np.asarray(segs.is_start)
    is_end = np.asarray(segs.is_end)
    assert is_start[0] and is_end[-1]
    assert (is_start[1:] == (cs[1:] != cs[:-1])).all()
    assert (is_end[:-1] == (cs[:-1] != cs[1:])).all()


def test_compact_indices_are_end_rows_in_cell_order(rng):
    m, s = 2048, 23
    cells = rng.integers(0, s, m).astype(np.int32)
    segs, _ = segments.sort_segments(jnp.asarray(cells), [])
    cap = 64
    comp = segments.compact_indices(segs, cap)
    idx = np.asarray(comp.idx)
    valid = np.asarray(comp.valid)
    uniq = np.unique(cells)
    assert valid.sum() == len(uniq)
    cs = np.asarray(segs.cell)
    got_cells = cs[idx[valid]]
    np.testing.assert_array_equal(got_cells, uniq)
    assert np.asarray(segs.is_end)[idx[valid]].all()
    # cell readback via take_compact
    cc = segments.take_compact(comp, segs.cell, fill=s)
    np.testing.assert_array_equal(np.asarray(cc)[valid], uniq)


def test_tiebreak_winner_at_compact_rows(rng):
    m, s = 2048, 11
    cells = rng.integers(0, s, m).astype(np.int32)
    race = rng.random(m).astype(np.float32)
    payload = np.arange(m, dtype=np.int32)
    segs, (p,) = segments.sort_segments(
        jnp.asarray(cells), [jnp.asarray(payload)], tiebreak=jnp.asarray(-race)
    )
    comp = segments.compact_indices(segs, s)
    win = np.asarray(segments.take_compact(comp, p))
    for k, c in enumerate(np.unique(cells)):
        want = payload[cells == c][np.argmin(race[cells == c])]
        assert win[k] == want, c


def test_compact_sums_match_bincount(rng):
    m, s = 8192, 97
    cells = rng.integers(0, s, m).astype(np.int32)
    vals = rng.normal(size=(m, 3)).astype(np.float32)
    segs, cols = segments.sort_segments(
        jnp.asarray(cells), [jnp.asarray(vals[:, i]) for i in range(3)]
    )
    cap = 128
    comp = segments.compact_indices(segs, cap)
    tot = np.asarray(segments.compact_sums(comp, jnp.stack(cols, axis=1)))
    for k, c in enumerate(np.unique(cells)):
        want = vals[cells == c].sum(axis=0)
        np.testing.assert_allclose(tot[k], want, rtol=2e-4, atol=1e-4)


def test_compact_capacity_drops_overflow(rng):
    m, s = 1024, 50
    cells = rng.integers(0, s, m).astype(np.int32)
    segs, _ = segments.sort_segments(jnp.asarray(cells), [])
    cap = 8
    comp = segments.compact_indices(segs, cap)
    assert comp.idx.shape == (cap,)
    # the kept segments are the cap smallest cells
    cc = np.asarray(segments.take_compact(comp, segs.cell, fill=s))
    np.testing.assert_array_equal(cc, np.unique(cells)[:cap])
    # sums only over kept segments, in order
    vals = np.ones(m, np.float32)
    segs2, (v,) = segments.sort_segments(jnp.asarray(cells), [jnp.asarray(vals)])
    tot = np.asarray(segments.compact_sums(comp, v))
    for k, c in enumerate(np.unique(cells)[:cap]):
        assert tot[k] == (cells == c).sum()


def test_scatter_table_roundtrip(rng):
    m, s = 1024, 19
    cells = rng.integers(0, s, m).astype(np.int32)
    vals = rng.normal(size=m).astype(np.float32)
    segs, (v,) = segments.sort_segments(jnp.asarray(cells), [jnp.asarray(vals)])
    comp = segments.compact_indices(segs, s + 1)
    cell_c = segments.take_compact(comp, segs.cell, fill=s)
    ends = segments.take_compact(comp, v)
    tab = segments.scatter_table(comp, cell_c, ends[:, None], s + 1)
    # per-row broadcast: every row reads its segment's end value
    back = np.asarray(jnp.take(tab[:, 0], segs.cell))
    cs = np.asarray(segs.cell)
    v = np.asarray(v)
    for c in np.unique(cells):
        np.testing.assert_allclose(back[cs == c], v[cs == c][-1])


def test_sentinel_rows_sort_last(rng):
    m, s = 512, 7
    cells = rng.integers(0, s, m).astype(np.int32)
    mask = rng.random(m) < 0.3
    cells_m = np.where(mask, cells, s)
    segs, _ = segments.sort_segments(jnp.asarray(cells_m), [])
    cs = np.asarray(segs.cell)
    assert (cs[: mask.sum()] < s).all()
    assert (cs[mask.sum():] == s).all()


def test_padded_capacity_beyond_m(rng):
    m, s = 64, 7
    cells = rng.integers(0, s, m).astype(np.int32)
    segs, _ = segments.sort_segments(jnp.asarray(cells), [])
    comp = segments.compact_indices(segs, 256)
    assert comp.idx.shape == (256,)
    assert np.asarray(comp.valid).sum() == len(np.unique(cells))
    x = segments.take_compact(comp, segs.cell.astype(jnp.float32), fill=-1.0)
    assert (np.asarray(x)[len(np.unique(cells)):] == -1.0).all()
