"""TreeVec container tests (reference pcs/utils.ts / test coverage)."""
from tstwo_tpu.pcs.utils import TreeVec, concat_cols


def test_map_zip_flatten():
    tv = TreeVec([[1, 2], [3]])
    assert tv.flatten() == [1, 2, 3]
    assert tv.map(len) == [2, 1]
    tv2 = TreeVec([[10, 20], [30]])
    zipped = tv.zip_cols(tv2)
    assert zipped == [[[1, 10], [2, 20]], [[3, 30]]]
    assert TreeVec([[[1, 2]], [[3]]]).flatten_cols() == [1, 2, 3]


def test_concat_cols():
    a = TreeVec([[1], [2, 3]])
    b = TreeVec([[4], [5]])
    assert concat_cols([a, b]) == [[1, 4], [2, 3, 5]]


def test_map_cols():
    tv = TreeVec([[[1, 2], [3]], [[4]]])
    assert tv.map_cols(sum) == [[3, 3], [4]]
