"""Pin HILBERT_LUT_2BIT against the reference xy2d recurrence.

The LUT (functions/spatial.py) was derived offline from the standard
Hilbert convert-(x,y)-to-d recurrence; these tests re-derive it from
``hilbert_xy2d_py`` and check the 5-block composed 10-bit index against
the recurrence, so any edit to either representation fails loudly.
"""

from noaa_ais_glue_lakehouse_spark.functions.spatial import (
    HILBERT_LUT_2BIT,
    hilbert_xy2d_py,
)


def _lut_dict():
    return {(s, bx, by): (dd, ns) for s, bx, by, dd, ns in HILBERT_LUT_2BIT}


def _compose(x: int, y: int) -> int:
    lut = _lut_dict()
    st, d = 0, 0
    for blk in range(5):
        sh = 8 - 2 * blk
        dd, st = lut[(st, (x >> sh) & 3, (y >> sh) & 3)]
        d = (d << 4) | dd
    return d


def test_lut_shape():
    assert len(HILBERT_LUT_2BIT) == 64
    states = {s for s, *_ in HILBERT_LUT_2BIT}
    assert states == {0, 1, 2, 3}
    # each (state, bx, by) appears exactly once and its 16 d-digits
    # within a state are a permutation of 0..15 (a space-filling curve
    # visits each sub-quadrant exactly once)
    lut = _lut_dict()
    assert len(lut) == 64
    for s in states:
        digits = sorted(lut[(s, bx, by)][0] for bx in range(4) for by in range(4))
        assert digits == list(range(16)), f"state {s} digits {digits}"


def test_lut_rederives_from_recurrence():
    """Empirical re-derivation: the automaton discovered from the
    recurrence at n=64 must be isomorphic to (and under the same state
    numbering, identical to) the shipped LUT."""

    def sig(px, py, rem):
        lowshift = rem - 2
        return tuple(
            (hilbert_xy2d_py(64, (px << rem) | (bx << lowshift),
                             (py << rem) | (by << lowshift))
             >> (2 * lowshift)) & 15
            for bx in range(4)
            for by in range(4)
        )

    from collections import deque

    states: dict[tuple, int] = {}

    def state_id(s):
        if s not in states:
            states[s] = len(states)
        return states[s]

    reps = {}
    trans = {}
    root = sig(0, 0, 6)
    reps[root] = (0, 0, 6)
    state_id(root)
    q = deque([root])
    visited = {root}
    while q:
        s = q.popleft()
        px, py, rem = reps[s]
        if rem < 4:
            continue
        for bx in range(4):
            for by in range(4):
                child = sig((px << 2) | bx, (py << 2) | by, rem - 2)
                if child not in reps:
                    reps[child] = ((px << 2) | bx, (py << 2) | by, rem - 2)
                if child not in visited:
                    visited.add(child)
                    q.append(child)
                trans[(state_id(s), bx, by)] = (s[bx * 4 + by], child)
    derived = {
        (sid, bx, by): (dd, state_id(c))
        for (sid, bx, by), (dd, c) in trans.items()
    }
    assert derived == _lut_dict()


def test_composed_index_matches_recurrence_exhaustively():
    for x in range(0, 1024, 3):
        for y in range(0, 1024, 7):
            assert _compose(x, y) == hilbert_xy2d_py(1024, x, y)
    # corners and boundaries exactly
    for x in (0, 1, 511, 512, 1022, 1023):
        for y in (0, 1, 511, 512, 1022, 1023):
            assert _compose(x, y) == hilbert_xy2d_py(1024, x, y)
