"""Exact repeated-substring dedup: span semantics, python twin, strip."""

from __future__ import annotations

from pyspark.sql import functions as F

from myaku_spark.operators.dedup import (
    repeated_substring_spans,
    strip_repeated_substrings,
)


def _twin_spans(texts: dict[int, str], l: int) -> set[tuple[int, int, int]]:
    """Brute-force reference: covered positions by corpus-wide L-gram
    counts, merged into maximal [p, p+L) intervals."""
    from collections import Counter

    counts = Counter(
        t[p : p + l]
        for t in texts.values()
        for p in range(len(t) - l + 1)
    )
    out = set()
    for doc_id, t in texts.items():
        cov = [
            p for p in range(len(t) - l + 1) if counts[t[p : p + l]] >= 2
        ]
        spans = []
        for p in cov:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + l)
            else:
                spans.append([p, p + l])
        out.update((doc_id, s, e) for s, e in spans)
    return out


def _docs_df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )


def _got_spans(spark, texts, l):
    df = repeated_substring_spans(_docs_df(spark, texts), min_len=l)
    return {(r.doc_id, r.span_start, r.span_end) for r in df.collect()}


def test_cross_doc_repeat_found(spark):
    texts = {
        1: "unique-prefix-one " + "SHARED-BOILERPLATE-BLOCK" + " tail-a",
        2: "different-lead-in " + "SHARED-BOILERPLATE-BLOCK" + " tail-b",
        3: "no duplication anywhere in this one at all, honest",
    }
    got = _got_spans(spark, texts, l=10)
    assert got == _twin_spans(texts, 10)
    assert any(d == 1 for d, _, _ in got)
    assert any(d == 2 for d, _, _ in got)
    assert not any(d == 3 for d, _, _ in got)


def test_within_doc_repeat_and_merge(spark):
    # "abcdefghij" twice inside one doc: both occurrences covered;
    # the run of covered positions in the middle must merge.
    texts = {7: "abcdefghijXYZabcdefghijQQQ", 8: "zzzzzzzz"}
    l = 10
    got = _got_spans(spark, texts, l)
    assert got == _twin_spans(texts, l)
    assert any(d == 7 for d, _, _ in got)


def test_overlapping_self_similarity(spark):
    # Periodic text: every L-gram repeats shifted by the period, so the
    # whole doc is one span — the island merge must chain overlaps.
    texts = {1: "ab" * 40, 2: "unrelated words here entirely"}
    l = 8
    got = _got_spans(spark, texts, l)
    assert got == _twin_spans(texts, l)
    assert (1, 0, 80) in got


def test_twin_sweep_deterministic_corpus(spark):
    # Small alphabet + varied lengths: lots of accidental repeats,
    # docs shorter than L, empty doc.
    import hashlib

    def word(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:4]

    texts = {}
    for d in range(12):
        words = [word((d * 7 + j) % 9) for j in range(d * 3)]
        texts[d] = " ".join(words)
    for l in (6, 12):
        assert _got_spans(spark, texts, l) == _twin_spans(texts, l), l


def test_strip_rebuilds_text(spark):
    texts = {
        1: "keepA" + "DUPLICATED-CHUNK-HERE!" + "keepB",
        2: "prefix" + "DUPLICATED-CHUNK-HERE!" + "suffix",
        3: "totally original content with no twin",
    }
    l = 12
    spans = _twin_spans(texts, l)
    out = {
        r.doc_id: (r.clean_text, r.n_dup_spans)
        for r in strip_repeated_substrings(
            _docs_df(spark, texts), min_len=l
        ).collect()
    }
    for d, t in texts.items():
        d_spans = sorted((s, e) for dd, s, e in spans if dd == d)
        expect = ""
        cur = 0
        for s, e in d_spans:
            expect += t[cur:s]
            cur = e
        expect += t[cur:]
        assert out[d] == (expect, len(d_spans)), d
    assert out[3] == (texts[3], 0)


def test_gram_key_hash_equals_raw(spark):
    # r5 verdict #2: 'hash' groups/joins on xxhash64(gram) — 8 shuffle
    # bytes per gram instead of L chars — and must produce identical
    # spans to 'raw' (collisions are ~2^-64 per pair; none on any real
    # corpus this size). Sweep the twin corpus at two L values.
    import hashlib

    def word(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:4]

    texts = {}
    for d in range(12):
        words = [word((d * 7 + j) % 9) for j in range(d * 3)]
        texts[d] = " ".join(words)
    texts[50] = "x" + "SHARED-RUN-OF-BOILERPLATE" * 3
    texts[51] = "y" + "SHARED-RUN-OF-BOILERPLATE" * 3
    df = _docs_df(spark, texts)
    for l in (6, 12):
        raw = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_substring_spans(
                df, min_len=l, gram_key="raw"
            ).collect()
        }
        hashed = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_substring_spans(
                df, min_len=l, gram_key="hash"
            ).collect()
        }
        assert raw == hashed and raw == _twin_spans(texts, l), l


def test_gram_key_auto_threshold(spark, tmp_path, monkeypatch):
    # 'auto' flips to hash past the plan-size estimate threshold — a
    # statistics probe, no job. Parquet-backed input has a real file
    # size estimate; a fresh local relation has UNKNOWN stats
    # (Long.MaxValue) and must resolve to hash (can't bound the input
    # → take the shuffle-safe key).
    import myaku_spark.operators.dedup as dd

    texts = {1: "abcdefghij" * 4 + "TAIL", 2: "abcdefghij" * 4 + "LIAT"}
    local = _docs_df(spark, texts)
    local.write.mode("overwrite").parquet(str(tmp_path / "docs"))
    df = spark.read.parquet(str(tmp_path / "docs"))

    def key_type(out):
        # hash mode groups on a LongType gram; raw on StringType
        plan = out._jdf.queryExecution().analyzed().toString()
        return "xxhash64" in plan

    monkeypatch.setattr(dd, "SUBSTRING_HASH_GRAM_BYTES", 1)
    assert key_type(repeated_substring_spans(df, min_len=10))
    monkeypatch.setattr(dd, "SUBSTRING_HASH_GRAM_BYTES", 1 << 60)
    assert not key_type(repeated_substring_spans(df, min_len=10))
    # unknown-stats local relation → hash even under a huge threshold
    assert key_type(repeated_substring_spans(local, min_len=10))
    # and both produce the twin's spans
    for mode in ("raw", "hash"):
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_substring_spans(
                df, min_len=10, gram_key=mode
            ).collect()
        }
        assert got == _twin_spans(texts, 10), mode
