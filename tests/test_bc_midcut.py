"""Mid-cut quality regression for the device BC merge engine (VERDICT r2
item #7): at matched probability thresholds, the device superstep order's
monotonized threshold cuts must track the host serial classifier-in-the-
loop order's VI (the BC analogue of the pb-policy threshold-cut parity).
Full-scale (512^2) numbers are recorded in docs/RESULTS.md via
tools/bench_bc_midcut.py; this bounds the delta at suite scale."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_bc_device_midcut_vi_parity():
    from bench_bc_midcut import bc_midcut_compare

    rows = bc_midcut_compare(side=128, n_cells=60, n_trees=40,
                             taus=(0.9, 0.7, 0.5))
    dvis = [abs(r["dvi"]) for r in rows]
    # every operating point within a small VI band of the serial order
    assert max(dvis) <= 0.08, rows
    # and not systematically worse across the sweep
    assert sum(r["dvi"] for r in rows) <= 0.06, rows
