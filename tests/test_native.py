"""Native C++ data path: CSV parser + remap gather vs numpy ground truth."""

import numpy as np
import pytest

native = pytest.importorskip("tiger_tpu.native")


def test_csv_parse_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    n = 500
    header = "stream,next_stream,i2,hu,res_ss"
    data = np.column_stack(
        [
            rng.integers(1, 10**9, n),
            rng.integers(-1, 10**9, n),
            rng.uniform(0, 10, n),
            rng.uniform(0, 1, n),
            rng.uniform(0, 9, n),
        ]
    )
    path = tmp_path / "p.csv"
    with open(path, "w") as f:
        f.write(header + "\n")
        np.savetxt(f, data, delimiter=",", fmt="%.10g")
    cols = native.load_csv_columns(str(path), header.split(","))
    for i, name in enumerate(header.split(",")):
        np.testing.assert_allclose(cols[name], data[:, i], rtol=1e-9)


def test_csv_parse_any_column_order_and_extras(tmp_path):
    path = tmp_path / "p.csv"
    path.write_text("b,a,junk,c\n1,2,x,3\n4,5,y,6\n")
    cols = native.load_csv_columns(str(path), ["a", "c"])
    np.testing.assert_array_equal(cols["a"], [2.0, 5.0])
    np.testing.assert_array_equal(cols["c"], [3.0, 6.0])


def test_csv_missing_column_raises(tmp_path):
    path = tmp_path / "p.csv"
    path.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="Missing"):
        native.load_csv_columns(str(path), ["a", "nope"])


def test_csv_crlf_and_trailing_newlines(tmp_path):
    path = tmp_path / "p.csv"
    path.write_bytes(b"a,b\r\n1,2\r\n3,4\r\n\n")
    cols = native.load_csv_columns(str(path), ["b"])
    np.testing.assert_array_equal(cols["b"], [2.0, 4.0])


def test_remap_gather_matches_numpy():
    rng = np.random.default_rng(2)
    grid = rng.uniform(size=(7, 11, 13)).astype(np.float32)
    idx = rng.integers(0, 11 * 13, 29)
    out = native.remap_gather(grid, idx)
    np.testing.assert_array_equal(out, grid.reshape(7, -1)[:, idx])


def test_params_loader_uses_native_and_agrees():
    from tiger_tpu import params as pm

    p_native = pm.load_spatial_params("/root/reference/data/small_test.csv")
    cols = pm._load_csv_numpy("/root/reference/data/small_test.csv")
    p_numpy = pm.from_columns(cols)
    for k in p_native:
        np.testing.assert_allclose(p_native[k], p_numpy[k], rtol=1e-12)


def test_csv_non_numeric_field_raises(tmp_path):
    path = tmp_path / "p.csv"
    path.write_text("a,b\n1,2\n3,oops\n")
    with pytest.raises(ValueError, match="Non-numeric"):
        native.load_csv_columns(str(path), ["a", "b"])


def test_csv_empty_field_raises(tmp_path):
    path = tmp_path / "p.csv"
    path.write_text("a,b\n1,\n")
    with pytest.raises(ValueError, match="Non-numeric"):
        native.load_csv_columns(str(path), ["a", "b"])


def test_native_rejects_empty_last_field(tmp_path):
    """'1,2,\\n' must error (strtod would otherwise swallow the newline and
    silently parse the NEXT line's first number into the wrong row)."""
    import pytest

    from tiger_tpu import native

    p = tmp_path / "bad.csv"
    p.write_text("a,b,c\n1,2,\n4,5,6\n")
    try:
        native._load()
    except ImportError:
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError):
        native.load_csv_columns(str(p), ("a", "b", "c"))
