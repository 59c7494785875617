"""Codec roundtrip tests (property-based + edge cases)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from myaku_spark.operators.codec import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=100, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


def test_varint_edge_values():
    vals = [0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
    )
)
@settings(max_examples=60, deadline=None)
def test_delta_roundtrip(ids):
    s = np.array(sorted(set(ids)), dtype=np.uint64)
    assert delta_decode(delta_encode(s)).tolist() == s.tolist()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),  # doc_id
            st.integers(min_value=1, max_value=200),  # tf
            st.integers(min_value=-5000, max_value=5000),  # score
        ),
        min_size=0,
        max_size=80,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_block_roundtrip(postings):
    postings.sort()
    doc_ids = np.array([p[0] for p in postings], dtype=np.uint64)
    tfs = np.array([p[1] for p in postings], dtype=np.uint64)
    scores = np.array([p[2] for p in postings], dtype=np.int64)
    blob = encode_block(doc_ids, tfs, scores)
    out = decode_block(blob)
    assert out["doc_ids"].tolist() == doc_ids.tolist()
    assert out["tfs"].tolist() == tfs.tolist()
    assert out["scores"].tolist() == scores.tolist()


def test_block_with_positions():
    doc_ids = np.array([3, 10, 55], dtype=np.uint64)
    tfs = np.array([2, 1, 3], dtype=np.uint64)
    positions = [
        [(0, 2), (17, 4)],
        [(5, 1)],
        [(2, 2), (9, 3), (100, 1)],
    ]
    blob = encode_block(doc_ids, tfs, positions=positions)
    out = decode_block(blob)
    assert out["doc_ids"].tolist() == [3, 10, 55]
    assert out["positions"] == positions
    assert "scores" not in out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=60000),
                    st.integers(min_value=1, max_value=255),
                ),
                min_size=1,
                max_size=8,
            ),
            st.integers(min_value=-5000, max_value=5000),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_encode_block_arrays_matches_encode_block(postings):
    from myaku_spark.operators.codec import encode_block_arrays

    postings.sort()
    doc_ids = np.array([p[0] for p in postings], dtype=np.uint64)
    positions = [sorted(p[1]) for p in postings]
    tfs = np.array([len(pl) for pl in positions], dtype=np.uint64)
    scores = np.array([p[2] for p in postings], dtype=np.int64)
    a = encode_block(doc_ids, tfs, scores, positions)
    flat_starts = np.array(
        [s for pl in positions for s, _ in pl], dtype=np.int64
    )
    flat_lens = np.array(
        [ln for pl in positions for _, ln in pl], dtype=np.int64
    )
    b = encode_block_arrays(doc_ids, tfs, scores, flat_starts, flat_lens)
    assert a == b  # byte-identical encodings
    out = decode_block(b)
    assert out["positions"] == positions


def test_compression_actually_compresses():
    # Dense sequential ids → deltas of 1 → tiny blob.
    n = 10_000
    doc_ids = np.arange(n, dtype=np.uint64)
    tfs = np.ones(n, dtype=np.uint64)
    blob = encode_block(doc_ids, tfs)
    assert len(blob) < n  # far smaller than 8 bytes/posting


def test_encode_blocks_batch_matches_per_block():
    """The r7 batch encoder must be byte-identical to per-block
    encode_block_arrays (same varint stream, same zlib framing) and
    report the same per-block metadata."""
    from myaku_spark.operators.codec import (
        encode_block_arrays,
        encode_blocks_batch,
    )

    rng = np.random.default_rng(7)
    B = 200
    doc_l, tf_l, pay_l, st_l, ln_l = [], [], [], [], []
    for _ in range(B):
        n = int(rng.integers(1, 50))
        doc_l.append(
            np.sort(
                rng.choice(5_000_000, size=n, replace=False)
            ).astype(np.uint64)
        )
        tfs = rng.integers(1, 5, size=n).astype(np.uint64)
        tf_l.append(tfs)
        pay_l.append(rng.integers(-50, 9_000_000, size=n).astype(np.int64))
        m = int(tfs.sum())
        st_l.append(np.sort(rng.integers(0, 60_000, size=m)).astype(np.int64))
        ln_l.append(rng.integers(1, 9, size=m).astype(np.int64))
    doc_off = np.concatenate(([0], np.cumsum([len(d) for d in doc_l])))
    pos_off = np.concatenate(([0], np.cumsum([len(s) for s in st_l])))

    # with positions
    ref = [
        encode_block_arrays(d, t, p, s, ln)
        for d, t, p, s, ln in zip(doc_l, tf_l, pay_l, st_l, ln_l)
    ]
    blobs, meta = encode_blocks_batch(
        doc_off,
        np.concatenate(doc_l),
        np.concatenate(tf_l),
        np.concatenate(pay_l),
        pos_off,
        np.concatenate(st_l),
        np.concatenate(ln_l),
    )
    assert blobs == ref
    # without positions
    ref2 = [
        encode_block_arrays(d, t, p, None, None)
        for d, t, p in zip(doc_l, tf_l, pay_l)
    ]
    blobs2, _ = encode_blocks_batch(
        doc_off,
        np.concatenate(doc_l),
        np.concatenate(tf_l),
        np.concatenate(pay_l),
    )
    assert blobs2 == ref2
    # metadata parity + roundtrip
    for i in (0, 13, B - 1):
        assert meta["n_postings"][i] == len(doc_l[i])
        assert meta["min_doc"][i] == int(doc_l[i][0])
        assert meta["max_doc"][i] == int(doc_l[i][-1])
        assert meta["max_tf"][i] == int(tf_l[i].max())
        assert meta["max_score"][i] == int(pay_l[i].max())
        assert meta["sum_tf"][i] == int(tf_l[i].sum())
        dec = decode_block(blobs[i])
        assert np.array_equal(dec["doc_ids"], doc_l[i])
        assert np.array_equal(dec["scores"], pay_l[i])

    # empty batch
    blobs3, meta3 = encode_blocks_batch(
        np.array([0]), np.array([]), np.array([]), np.array([])
    )
    assert blobs3 == [] and meta3["n_postings"].size == 0


def test_decode_blocks_batch_matches_per_block():
    """The r7 batch decoder must reproduce per-block decode_block
    output exactly across blocks with/without positions and scores."""
    from myaku_spark.operators.codec import (
        decode_blocks_batch,
        encode_block_arrays,
    )

    rng = np.random.default_rng(11)
    blobs = []
    for i in range(150):
        n = int(rng.integers(1, 60))
        docs = np.sort(
            rng.choice(9_000_000, size=n, replace=False)
        ).astype(np.uint64)
        tfs = rng.integers(1, 6, size=n).astype(np.uint64)
        if i % 3 == 0:  # no positions
            blobs.append(encode_block(docs, tfs))
        else:
            pays = rng.integers(-100, 5_000_000, size=n).astype(np.int64)
            m = int(tfs.sum())
            starts = np.sort(
                rng.integers(0, 50_000, size=m)
            ).astype(np.int64)
            lens = rng.integers(1, 10, size=m).astype(np.int64)
            blobs.append(encode_block_arrays(docs, tfs, pays, starts, lens))
    out = decode_blocks_batch(blobs)
    for i, blob in enumerate(blobs):
        ref = decode_block(blob, pos_flat=True)
        lo, hi = out["doc_off"][i], out["doc_off"][i + 1]
        assert np.array_equal(
            out["doc_ids"][lo:hi], ref["doc_ids"].astype(np.int64)
        )
        assert np.array_equal(out["tfs"][lo:hi], ref["tfs"])
        if "scores" in ref:
            assert np.array_equal(out["scores"][lo:hi], ref["scores"])
        else:
            assert (out["scores"][lo:hi] == 0).all()
        plo, phi = out["pos_off"][i], out["pos_off"][i + 1]
        if "pos_starts_flat" in ref:
            assert np.array_equal(
                out["pos_starts"][plo:phi], ref["pos_starts_flat"]
            )
            assert np.array_equal(
                out["pos_lens"][plo:phi], ref["pos_lens_flat"]
            )
        else:
            assert phi == plo
    empty = decode_blocks_batch([])
    assert empty["n_per"].size == 0
