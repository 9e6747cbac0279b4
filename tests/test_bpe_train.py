"""BPE merge training (textpipe.bpe_train_merges): hand-computable merges,
driver/distributed path equality, determinism of the tie-break."""

import pyarrow as pa

import ray.data as rd

from raycontract.pipelines.textpipe import _bpe_train_driver, bpe_train_merges


def test_driver_merges_hand_computed():
    # one word "abab" ×3: pairs ab:2×3, ba:1×3 → merge (a,b); then
    # ["ab","ab"] gives (ab,ab):1×3 → merge (ab,ab)
    merges = _bpe_train_driver([list("abab")], [3], 3)
    assert merges[0] == ("a", "b", 6)
    assert merges[1] == ("ab", "ab", 3)
    assert len(merges) == 2  # single symbol left — no more pairs


def test_tiebreak_pair_ascending():
    # "ab" and "cd" both appear once → counts tie → (a,b) < (c,d) wins
    merges = _bpe_train_driver([list("ab"), list("cd")], [1, 1], 1)
    assert merges[0] == ("a", "b", 1)


def test_distributed_equals_driver(ray_session):
    t = pa.table({"text": [
        "low low lower lowest", "new newer newest low",
        "wide wider widest new", "low lower newer wide",
    ]})
    ds = rd.from_arrow(t)
    a = bpe_train_merges(ds, num_merges=8, force="driver")
    b = bpe_train_merges(ds, num_merges=8, force="distributed")
    assert a.equals(b)
    assert a.num_rows == 8
    assert a["count"][0].as_py() >= a["count"][7].as_py()
