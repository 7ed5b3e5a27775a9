"""Native C++ bulk parser vs the pure-python parsers."""

import numpy as np
import pytest

from similaritysearchbyrdf_tpu.native import loader as native_loader
from similaritysearchbyrdf_tpu import vectors as V


@pytest.fixture(scope="module")
def built():
    if native_loader._get_lib() is None:
        pytest.skip("no C++ toolchain available")
    return True


def test_dense_native_matches_python(tmp_path, built):
    rng = np.random.default_rng(0)
    n, d = 500, 24
    x = rng.normal(size=(n, d))
    lines = [f"[{i},[{','.join(repr(float(v)) for v in x[i])}]]" for i in range(n)]
    p = tmp_path / "dense.txt"
    p.write_text("\n".join(lines))

    out = native_loader.load_dense_file(str(p))
    assert out is not None
    ids, values = out
    py = V.load_dense_file(str(p), use_native=False)
    # native parses multithreaded chunks: order may interleave chunks, so
    # compare by id
    order_n = np.argsort(ids)
    order_p = np.argsort(py.ids)
    np.testing.assert_array_equal(ids[order_n], py.ids[order_p])
    np.testing.assert_allclose(
        values[order_n], py.values[order_p], rtol=1e-6, atol=1e-6
    )


def test_dense_native_via_front_door(tmp_path, built):
    p = tmp_path / "d.txt"
    p.write_text("[0,[1.5,2.5]]\n[1,[3.5,4.5]]\n")
    batch = V.load_dense_file(str(p))  # uses native automatically
    order = np.argsort(batch.ids)
    np.testing.assert_allclose(
        batch.values[order], [[1.5, 2.5], [3.5, 4.5]]
    )


def test_sparse_native_matches_python(tmp_path, built):
    lines = [
        "(0,8,[0,2,5],[1.0,2.0,3.0])",
        "(1,8,[1],[4.0])",
        "(2,8,[3,4],[5.5,6.5])",
    ]
    p = tmp_path / "s.txt"
    p.write_text("\n".join(lines))
    out = native_loader.load_sparse_file(str(p))
    assert out is not None
    ids, size, idx, val, lengths = out
    assert size == 8
    assert list(ids) == [0, 1, 2]
    assert list(lengths) == [3, 1, 2]
    assert list(idx[0, :3]) == [0, 2, 5]
    np.testing.assert_allclose(val[2, :2], [5.5, 6.5])


def test_native_missing_file(built):
    assert native_loader.load_dense_file("/nonexistent/x.txt") is None
