"""Golden-fixture regression test (SURVEY §7 Phase 0).

Pins the full mapping pipeline's numerics against the committed
tests/goldens/mapping_golden.npz.  A legitimate numerics change must
regenerate the golden (tools/make_goldens.py) and justify the diff in the
commit message; anything else failing here is unintended drift.
"""
import os

import numpy as np

from tools.make_goldens import build

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "mapping_golden.npz")


def test_mapping_pipeline_matches_golden():
    got = build()
    want = np.load(GOLDEN)
    np.testing.assert_array_equal(got["actions"], want["actions"])
    np.testing.assert_allclose(got["coverage"], want["coverage"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(got["rewards"], want["rewards"],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(got["prob_grid"], want["prob_grid"],
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(got["obs"], want["obs"], rtol=0, atol=1e-4)
