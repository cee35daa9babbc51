"""Golden end-to-end run (SURVEY §5.3): seeded fit on the blob fixture →
archive fitness and chosen centers compared to committed goldens.

On the well-separated blobs every candidate clustering keeps blob-mates
together, so Conn is the constant N·Σ1/r = 685.0 — the front is
effectively one-dimensional and the archive fills to capacity via
crowding truncation. Regenerate with tools in the test if the engine's
seeded trajectory intentionally changes.
"""

import numpy as np
import pytest

from mopso_engine import MopsoConfig, MopsoEngine

GOLDEN_FRONT = [
    [254.222972, 685.0], [269.925164, 685.0], [287.855486, 685.0],
    [292.419342, 685.0], [309.707478, 685.0], [318.354494, 685.0],
    [343.395534, 685.0], [359.42207, 685.0], [373.758821, 685.0],
    [387.103651, 685.0], [416.571102, 685.0], [428.676796, 685.0],
    [473.872396, 685.0], [490.849382, 685.0], [536.099928, 685.0],
]

GOLDEN_BEST = [
    [-3.594458, 7.481292, -10.119304, 6.277825],
    [2.469002, 7.463849, 5.954934, -6.217465],
    [6.136836, -0.965746, -4.481259, -4.449253],
]


def test_golden_seeded_fit(blobs_df):
    cfg = MopsoConfig(n_particles=8, iter_max=3, knn_l=5, seed=42, init_sample_size=300)
    res = MopsoEngine(cfg).fit(blobs_df)
    front = sorted(map(tuple, np.round(res.archive_fitness, 6).tolist()))
    np.testing.assert_allclose(front, GOLDEN_FRONT, rtol=1e-6)
    np.testing.assert_allclose(np.round(res.best_position, 6), GOLDEN_BEST, rtol=1e-6)


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.01"), reason="driver testdata absent"
)
def test_fit_oracle_data_is_fresh(spark):
    """The recorded archive positions (tools/fit_oracle_data.json) must be
    what the seeded fits actually produce — catches an engine change that
    moved the PSO trajectory without a rerun of tools/gen_fit_oracle.py."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as em

    if not __import__("os").path.exists(em._FIT_ORACLE_PATH):
        pytest.skip("fit oracle data not generated")
    with open(em._FIT_ORACLE_PATH) as f:
        data = json.load(f)
    res_e, _ = em._fit_embeddings(spark, data["sf_dir"])
    got = [p.tolist() for p in res_e.archive_positions]
    assert len(got) == len(data["mopso_fit"]["positions"])
    np.testing.assert_allclose(got, data["mopso_fit"]["positions"], rtol=1e-12)
