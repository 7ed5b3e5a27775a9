"""Dataset text parser parity — mirrors the reference's `VectorSuite.scala`."""

import numpy as np
import pytest

from similaritysearchbyrdf_tpu import vectors as V


def test_from_string():
    vid, size, idx, vals = V.from_string("(3,3,[0,1,2],[1.0,2.0,3.0])")
    assert (vid, size) == (3, 3)
    assert list(idx) == [0, 1, 2]
    assert list(vals) == [1.0, 2.0, 3.0]


def test_from_string_empty_indices():
    vid, size, idx, vals = V.from_string("(1,5,[],[])")
    assert (vid, size) == (1, 5)
    assert len(idx) == 0 and len(vals) == 0


def test_from_string_invalid():
    with pytest.raises(ValueError):
        V.from_string("not a vector")


def test_from_python_string():
    vid, size, idx, vals = V.from_python_string("[1, 3, [1, 2], [1.0, 2.5]]")
    assert (vid, size) == (1, 3)
    assert list(idx) == [1, 2]
    assert list(vals) == [1.0, 2.5]


def test_parse_dense():
    vid, vals = V.parse_dense("[1,[0.1,0.2,0.4,0.9]]")
    assert vid == 1
    np.testing.assert_allclose(vals, [0.1, 0.2, 0.4, 0.9])


def test_from_string_dense():
    np.testing.assert_allclose(V.from_string_dense("1,2,3"), [1.0, 2.0, 3.0])


def test_whole_new_gt():
    assert V.whole_new_gt_from_python("1 1_1_Y E") == (1, "1_1_Y")


def test_es_from_python():
    total, e, s, ep, sp = V.es_from_python("5#2#3#[1, 2]#[3, 4, 5]")
    assert (total, e, s) == (5, 2, 3)
    assert list(ep) == [1, 2] and list(sp) == [3, 4, 5]


def test_knn_parsers():
    np.testing.assert_allclose(
        V.knn_from_python(3, "[0, 0.22, 0.3, 0.4]"), [0.0, 0.22, 0.3]
    )
    assert list(V.analysis_knn("[1, 30, 19, 230]", 2)) == [1, 30]


def test_parse_numeric_dispatch():
    kind, parsed = V.parse_numeric("(3,3,[0,1],[1.0,2.0])")
    assert kind == "sparse"
    kind, parsed = V.parse_numeric("1.5,2.5")
    assert kind == "dense"


def test_dense_file_roundtrip(tmp_path):
    p = tmp_path / "dense.txt"
    p.write_text("[0,[0.1,0.2]]\n[1,[0.3,0.4]]\n")
    batch = V.load_dense_file(str(p))
    assert batch.n == 2 and batch.dim == 2
    np.testing.assert_allclose(batch.values, [[0.1, 0.2], [0.3, 0.4]], rtol=1e-6)
    assert list(batch.ids) == [0, 1]


def test_sparse_file_roundtrip(tmp_path):
    p = tmp_path / "sparse.txt"
    p.write_text("(0,4,[0,2],[1.0,2.0])\n(1,4,[1,3],[3.0,4.0])\n")
    batch = V.load_sparse_file(str(p))
    assert batch.n == 2 and batch.size == 4
    dense = batch.densify()
    np.testing.assert_allclose(
        dense.values, [[1, 0, 2, 0], [0, 3, 0, 4]], rtol=1e-6
    )


def test_ground_truth_loader(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("[1, 2, 3]\n[4, 5, 6]\n")
    gt = V.load_ground_truth(str(p), 2)
    np.testing.assert_array_equal(gt, [[1, 2], [4, 5]])


def test_sparse_batch_padding():
    b = V.sparse_batch_from_rows(
        [0, 1], 10, [([1, 2, 3], [1.0, 2.0, 3.0]), ([5], [9.0])]
    )
    assert b.nnz_pad == 3
    assert list(b.lengths) == [3, 1]
    assert b.values[1, 1] == 0.0  # padding contributes nothing


def test_fvecs_roundtrip(tmp_path):
    p = tmp_path / "x.fvecs"
    arr = np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32)
    with open(p, "wb") as f:
        for row in arr:
            np.int32(8).tofile(f)
            row.tofile(f)
    got = V.read_fvecs(str(p))
    np.testing.assert_array_equal(got, arr)
    got2 = V.read_fvecs(str(p), limit=3)
    np.testing.assert_array_equal(got2, arr[:3])
