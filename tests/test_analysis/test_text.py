

def test_pii_batch_counts_and_redaction():
    import pyarrow as pa

    from hydra_ray.stages.text import pii_batch

    t = pa.table({"text": [
        "two mails a@x.org b.c@y.co one phone 06 12 34 56 78",
        "dots 01.22.33.44.55 and dashes 07-11-22-33-44 ip 8.8.8.8",
        "nothing here",
        "ip-like 1.2.3.4.5 still matches a 4-octet prefix",
    ]})
    out = pii_batch(t)
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_phone"].to_pylist() == [1, 2, 0, 0]
    assert out["n_ipv4"].to_pylist() == [0, 1, 0, 1]
    texts = out["text"].to_pylist()
    assert texts[0] == "two mails [EMAIL] [EMAIL] one phone [PHONE]"
    assert texts[1] == "dots [PHONE] and dashes [PHONE] ip [IP]"
    assert texts[2] == "nothing here"
    # counts-only mode leaves the text column untouched
    keep = pii_batch(t, redact=False)
    assert keep["text"].to_pylist() == t["text"].to_pylist()
    assert keep["n_phone"].to_pylist() == [1, 2, 0, 0]


def test_hashed_linear_scorer_contract():
    import numpy as np
    import pyarrow as pa

    from hydra_ray.stages.text import HashedLinearScorer, _token_fp_hashes

    s = HashedLinearScorer(n_buckets=64, threshold=5)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["alpha beta alpha", "   ", "beta"],
    })
    out = s(t)
    h = _token_fp_hashes(["alpha", "beta"])
    w = s.weights[(h % np.uint64(64)).astype(np.int64)]
    assert out["score"].to_pylist() == [int(2 * w[0] + w[1]), 0, int(w[1])]
    assert out["keep"].to_pylist() == [v > 5 for v in out["score"].to_pylist()]
    # weights are a pure function of the bucket id: two actors agree
    assert (HashedLinearScorer(n_buckets=64).weights == s.weights).all()
