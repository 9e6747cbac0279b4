"""Corpus-curation operators: PII scan/redact, deterministic split,
decontamination (r2)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "reach me at alice@example.org or 555-123-4567",
            "server at 192.168.1.10 and ssn 123-45-6789",
            "perfectly clean text with no sensitive content",
            None,
        ]),
    }))


def test_pii_scan_flags(ray_session):
    from raycontract.pipelines.curation import pii_scan

    out = {r["doc_id"]: r for r in pii_scan(_docs()).take_all()}
    assert out[1]["has_email"] and out[1]["has_phone"] and out[1]["has_pii"]
    assert out[2]["has_ipv4"] and out[2]["has_ssn"]
    assert not out[2]["has_email"]
    assert not out[3]["has_pii"]
    assert not out[4]["has_pii"]  # null text → clean


def test_pii_redact(ray_session):
    from raycontract.pipelines.curation import pii_redact

    out = {r["doc_id"]: r["text_redacted"] for r in pii_redact(_docs()).take_all()}
    assert out[1] == "reach me at [EMAIL] or [PHONE]"
    assert "[IPV4]" in out[2] and "[SSN]" in out[2]
    assert "alice" not in out[1] and "555" not in out[1]
    assert out[3].startswith("perfectly clean")


def test_hash_split_deterministic_and_proportional(ray_session):
    from raycontract.pipelines.curation import hash_split

    n = 20000
    ds = rd.from_arrow(pa.table({"id": pa.array(list(range(n)), type=pa.int64())}))
    out = hash_split(ds, "id", [0.8, 0.1, 0.1], ["train", "val", "test"])
    rows = out.take_all()
    counts = {}
    first = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        first[r["id"]] = r["split"]
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.01
    assert abs(counts["test"] / n - 0.1) < 0.01
    # deterministic: a second run assigns identically
    again = {r["id"]: r["split"] for r in
             hash_split(ds, "id", [0.8, 0.1, 0.1], ["train", "val", "test"]).take_all()}
    assert again == first


def test_decontaminate_flags(ray_session):
    from raycontract.pipelines.curation import decontaminate_flags

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the quick brown fox", "an unrelated document",
                          "contains the quick brown fox verbatim"]),
    }))
    out = {r["doc_id"]: r["contaminated"] for r in
           decontaminate_flags(docs, ["quick brown fox", "benchmark xyz"]).take_all()}
    assert out[1] and out[3] and not out[2]


def test_aho_corasick_matches_naive():
    import random

    from raycontract.pipelines.curation import AhoCorasick

    rng = random.Random(99)
    alphabet = "abcde"
    patterns = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
                for _ in range(200)]
    ac = AhoCorasick(patterns)
    for _ in range(300):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        naive = any(p in text for p in patterns if p)
        assert ac.contains_any(text) == naive, (text,)


def test_decontaminate_automaton_path(ray_session):
    """>threshold phrases → Aho-Corasick path; same flags as the naive path."""
    from raycontract.pipelines.curation import decontaminate_flags

    phrases = [f"benchmark phrase number {i}" for i in range(100)] + ["quick brown fox"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the quick brown fox jumps", "clean document",
                          "contains benchmark phrase number 42 inline"]),
    }))
    out = {r["doc_id"]: r["contaminated"] for r in
           decontaminate_flags(docs, phrases).take_all()}
    assert out[1] and out[3] and not out[2]
    # naive path (small list) agrees
    out2 = {r["doc_id"]: r["contaminated"] for r in
            decontaminate_flags(docs, ["quick brown fox",
                                       "benchmark phrase number 42"]).take_all()}
    assert out2 == out
