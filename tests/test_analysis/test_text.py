

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
