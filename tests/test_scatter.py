"""Direct oracles for the sort-based scatter engine (ops/scatter.py) —
the TPU replacement for the reference's CUDA atomics."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.scatter import (
    fold_clip,
    fold_scattered,
    home_ids_extended,
    segment_min_sorted,
    segment_sum_sorted,
    sort_by_segment,
)


def test_segment_sum_matches_bincount():
    rng = np.random.default_rng(0)
    k, m = 1000, 50
    ids = rng.integers(0, m, k).astype(np.int32)
    vals = rng.standard_normal((k, 3)).astype(np.float32)
    sid, sval = sort_by_segment(jnp.asarray(ids), jnp.asarray(vals))
    got = np.asarray(segment_sum_sorted(sval, sid, m))
    want = np.zeros((m, 3), np.float32)
    np.add.at(want, ids, vals)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_segment_sum_empty_segments_zero():
    ids = jnp.asarray([2, 2, 5], jnp.int32)
    vals = jnp.asarray([1.0, 2.0, 4.0])
    got = np.asarray(segment_sum_sorted(vals, ids, 8))
    np.testing.assert_allclose(got, [0, 0, 3, 0, 0, 4, 0, 0])


def test_segment_min_matches_oracle():
    rng = np.random.default_rng(1)
    k, m = 800, 40
    ids = np.sort(rng.integers(0, m, k).astype(np.int32))
    vals = rng.standard_normal((k, 5)).astype(np.float32)
    got = np.asarray(
        segment_min_sorted(jnp.asarray(vals), jnp.asarray(ids), m, 99.0)
    )
    want = np.full((m, 5), 99.0, np.float32)
    for s in range(m):
        sel = vals[ids == s]
        if len(sel):
            want[s] = sel.min(axis=0)
    np.testing.assert_allclose(got, want)


def test_fold_clip_add_oracle():
    rng = np.random.default_rng(2)
    src = rng.standard_normal((7, 6, 5)).astype(np.float32)
    for shifts in [(-1, 0, 1), (2, -2, 0), (0, 0, 0)]:
        out_shape = (5, 6, 5)
        got = np.asarray(
            fold_clip(jnp.asarray(src), shifts, out_shape, "add", 0.0)
        )
        want = np.zeros(out_shape, np.float32)
        for i in range(src.shape[0]):
            for j in range(src.shape[1]):
                for kk in range(src.shape[2]):
                    t = (
                        min(max(i + shifts[0], 0), out_shape[0] - 1),
                        min(max(j + shifts[1], 0), out_shape[1] - 1),
                        min(max(kk + shifts[2], 0), out_shape[2] - 1),
                    )
                    want[t] += src[i, j, kk]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fold_clip_min_oracle():
    rng = np.random.default_rng(3)
    src = rng.standard_normal((6, 6)).astype(np.float32)
    got = np.asarray(fold_clip(jnp.asarray(src), (-2, 1), (6, 6), "min", 9.0))
    want = np.full((6, 6), 9.0, np.float32)
    for i in range(6):
        for j in range(6):
            t = (min(max(i - 2, 0), 5), min(max(j + 1, 0), 5))
            want[t] = min(want[t], src[i, j])
    np.testing.assert_allclose(got, want)


def test_fold_scattered_equals_per_corner_folds():
    rng = np.random.default_rng(4)
    src = rng.standard_normal((4, 6, 6, 6)).astype(np.float32)
    shifts = [(0, 0, 0), (1, 0, 0), (0, -1, 0), (1, 1, -1)]
    out_shape = (6, 6, 6)
    got = np.asarray(
        fold_scattered(jnp.asarray(src), shifts, out_shape, "add", 0.0)
    )
    want = np.zeros(out_shape, np.float32)
    for kk, sh in enumerate(shifts):
        want += np.asarray(
            fold_clip(jnp.asarray(src[kk]), sh, out_shape, "add", 0.0)
        )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_home_ids_extended_covers_out_of_range():
    gi = jnp.asarray([[-1, 0, 3], [2, 3, -1], [3, 3, 3]], jnp.int32)
    ids, ext = home_ids_extended(gi, (3, 3, 3))
    assert ext == (5, 5, 5)
    got = np.asarray(ids)
    # manual: (gi+1) clipped to [0, 4] then row-major over (5,5,5)
    want = []
    for row in np.asarray(gi):
        g = np.clip(row + 1, 0, 4)
        want.append((g[0] * 5 + g[1]) * 5 + g[2])
    np.testing.assert_array_equal(got, want)


def test_fold_scattered_sep_matches_dense():
    """The separable block fold (engine path: sum(|s_a|) pieces) equals
    the per-channel fold for Cartesian-product shift sets, for both
    combiners and with a non-trivial fill."""
    import itertools

    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered,
        fold_scattered_sep,
    )

    rng = np.random.default_rng(5)
    cases = [
        ([(-2, -1, 0, 1, 2)] * 3, (6, 7, 5), "min", 3.0),
        ([(-2, -1, 0), (-2, -1, 0), (-1, 0)], (6, 7, 5), "add", 0.0),
        ([(-1, 0), (-1,), (-1, 0)], (7, 6, 5), "add", 0.0),
    ]
    for axis_shifts, out_shape, comb, fill in cases:
        shifts = list(itertools.product(*axis_shifts))
        ext = (8, 9, 7)
        seg = jnp.asarray(
            rng.standard_normal((len(shifts),) + ext).astype(np.float32)
        )
        dense = fold_scattered(seg, shifts, out_shape, comb, fill)
        sep = fold_scattered_sep(seg, axis_shifts, out_shape, comb, fill)
        np.testing.assert_allclose(
            np.asarray(sep), np.asarray(dense), rtol=1e-5, atol=1e-6
        )


def test_segment_broadcast_sorted_matches_take():
    """segment_broadcast_sorted == table[ids] for sorted ids, including
    empty segments and a segment at the fill bound (the engine default
    window is 2^6 = 64/cell — scatter._SEG_LOG2; this test pins the
    bound explicitly)."""
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted,
    )

    rng = np.random.default_rng(7)
    m, c = 64, 5
    table = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    ids = np.sort(
        np.concatenate(
            [
                np.full(64, 3, np.int32),  # exactly at the default bound
                rng.integers(4, m, 300).astype(np.int32),
                np.zeros(1, np.int32),
            ]
        )
    )
    out = segment_broadcast_sorted(table, jnp.asarray(ids))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[ids]
    )


def test_pallas_fold_matches_xla_fold():
    """fold_scattered_sep_pallas (interpret mode) == the XLA fold, for
    every shift family the engine uses, add and min, both ext flavours
    (E = N+2 cell-extended and E = N+1 parity-class outputs)."""
    from python_fluid_simulation_tpu.ops.pallas_fold import (
        fold_pallas_available,
        fold_scattered_sep_pallas,
    )
    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered_sep,
    )

    rng = np.random.default_rng(3)
    cases = [
        # (out_shape, axis_shifts, combine, fill)   engine users:
        ((9, 10, 11), [(-1, 0)] * 3, "add", 0.0),          # p2g own axis
        ((9, 10, 11), [(-1, 0), (-2, -1, 0), (-2, -1, 0)],
         "add", 0.0),                                      # p2g x-axis
        ((9, 10, 11), [(-2, -1, 0)] * 3, "add", 0.0),      # density
        ((9, 10, 11), [(-2, -1, 0, 1, 2)] * 3, "min", 3.0),  # levelset
        ((10, 10, 11), [(-1, 0)] * 3, "add", 0.0),         # class N+1
    ]
    for out_shape, axis_shifts, combine, fill in cases:
        n_ch = 1
        for s in axis_shifts:
            n_ch *= len(s)
        for ext_off in (2, 1):
            ext = tuple(n + ext_off for n in out_shape)
            seg = jnp.asarray(
                rng.standard_normal((n_ch,) + ext).astype(np.float32)
            )
            assert fold_pallas_available(
                seg.shape, out_shape, axis_shifts, interpret=True
            ), (out_shape, axis_shifts, ext_off)
            want = fold_scattered_sep(
                seg, axis_shifts, out_shape, combine, fill
            )
            got = fold_scattered_sep_pallas(
                seg, axis_shifts, out_shape, combine, fill,
                interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6,
                err_msg=str((out_shape, axis_shifts, combine, ext_off)),
            )


def test_pallas_segscan_matches_oracle():
    """seg_scan_sorted (interpret mode) == a NumPy per-segment inclusive
    scan, for add and min, across block boundaries, with a segment
    longer than the kernel block (exercises the cross-block carry) and a
    non-block-multiple row count (exercises the padding tail)."""
    from python_fluid_simulation_tpu.ops import pallas_segscan as ps
    from python_fluid_simulation_tpu.ops.pallas_segscan import (
        seg_scan_sorted,
    )

    rng = np.random.default_rng(7)
    k = 2 * ps._BLOCK + 513
    # sorted ids with wildly uneven segments: one run longer than _BLOCK
    seg_lens = [1, 3, ps._BLOCK + 700, 2, 1]
    while sum(seg_lens) < k:
        seg_lens.append(int(rng.integers(1, 9)))
    seg_lens[-1] -= sum(seg_lens) - k
    ids = np.repeat(np.arange(len(seg_lens)), seg_lens)[:k]
    same = np.concatenate([[False], ids[1:] == ids[:-1]])

    for c in (3, 54, 127):
        vals = rng.standard_normal((k, c)).astype(np.float32)
        for op, np_op in (("add", np.add), ("min", np.minimum)):
            got = np.asarray(
                seg_scan_sorted(
                    jnp.asarray(vals), jnp.asarray(same), op,
                    interpret=True,
                )
            )
            want = vals.copy()
            for i in range(1, k):
                if same[i]:
                    want[i] = np_op(want[i], want[i - 1])
            # add: the doubling tree associates fp32 sums differently
            # from the sequential oracle fold — rounding-level only
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=2e-3, err_msg=f"{op} c={c}"
            )


def test_segment_ops_pallas_paths_match_xla():
    """The three scatter-engine segment ops give identical results with
    the Pallas scan substituted (interpret mode) — covers the
    place-at-last rewiring of segment_min."""
    import unittest.mock as mock

    from python_fluid_simulation_tpu.ops import scatter as sc
    from python_fluid_simulation_tpu.ops.pallas_segscan import (
        seg_scan_sorted,
    )

    rng = np.random.default_rng(3)
    k, m, c = 5000, 300, 12
    ids = jnp.asarray(np.sort(rng.integers(0, m, size=k)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def fake_scan(v, first, op):
        return seg_scan_sorted(v, ~first, op, interpret=True)

    with mock.patch.object(sc, "_seg_scan_fwd", fake_scan):
        got_sum = sc.segment_sum_sorted(vals, ids, m)
        got_min = sc.segment_min_sorted(vals, ids, m, 9.0)
        got_bc = sc.segment_broadcast_sorted(table, ids)
    want_sum = sc.segment_sum_sorted(vals, ids, m)
    want_min = sc.segment_min_sorted(vals, ids, m, 9.0)
    want_bc = sc.segment_broadcast_sorted(table, ids)
    np.testing.assert_allclose(
        np.asarray(got_sum), np.asarray(want_sum), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(np.asarray(got_min), np.asarray(want_min))
    np.testing.assert_array_equal(np.asarray(got_bc), np.asarray(want_bc))
