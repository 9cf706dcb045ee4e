"""StreamSet facade and checkpoint reorder/roundtrip behavior."""

import numpy as np
import pytest

from tiger_tpu import checkpoint as ckpt
from tiger_tpu.streams import StreamSet


def test_streamset_from_reference_csv():
    if not __import__("pathlib").Path("/root/reference/data/small_test.csv").exists():
        pytest.skip("reference mount absent")
    ss = StreamSet.from_csv("/root/reference/data/small_test.csv", (0.01, 3.0, 0.0, 5.0, 0.2))
    assert len(ss) == 10
    assert ss.y0.shape == (10, 5)
    np.testing.assert_allclose(ss.y0[3], [0.01, 3.0, 0.0, 5.0, 0.2])
    assert set(ss.model_params()) >= {"Hu", "n_mann", "alpha3"}
    # Topology resolves (links may drain outside the 10-link sample).
    topo = ss.topology
    assert topo.next_idx.shape == (10,)
    sub = ss.subset([0, 2, 4])
    assert len(sub) == 3
    np.testing.assert_array_equal(sub.ids, ss.ids[[0, 2, 4]])


def test_checkpoint_reorder_and_missing(tmp_path):
    path = str(tmp_path / "state.nc")
    y = np.arange(12, dtype=np.float64).reshape(4, 3)
    ids = np.array([40, 10, 30, 20])
    ckpt.save_state(path, y, ids, 777.0)

    # Permuted subset: rows must follow the requested id order.
    y2, ids2, t = ckpt.load_state(path, link_ids=np.array([20, 40]))
    assert t == 777.0
    np.testing.assert_array_equal(ids2, [20, 40])
    np.testing.assert_array_equal(y2, y[[3, 0]])

    with pytest.raises(KeyError, match="missing links"):
        ckpt.load_state(path, link_ids=np.array([99]))

    # Full load without reorder returns file order.
    y3, ids3, _ = ckpt.load_state(path)
    np.testing.assert_array_equal(ids3, ids)
    np.testing.assert_array_equal(y3, y)


def test_cold_state_broadcast():
    y = ckpt.cold_state((1.0, 2.0), 5)
    assert y.shape == (5, 2)
    np.testing.assert_array_equal(y[4], [1.0, 2.0])


def test_resume_requires_checkpoint_time_attr(tmp_path):
    """A plain final-state file (no sim_time_minutes) must be rejected as a
    crash-resume point instead of silently restarting from t=0."""
    import pytest

    from tiger_tpu import checkpoint as ckpt
    from tiger_tpu.io.output import write_final_netcdf

    path = str(tmp_path / "final.nc")
    write_final_netcdf(path, np.zeros((3, 5)), np.arange(1, 4))
    y, ids, t = ckpt.load_state(path)  # plain hot start: allowed, t=0
    assert t == 0.0
    with pytest.raises(ValueError, match="not a resumable checkpoint"):
        ckpt.load_state(path, require_time=True)
