"""BPE training + application (stages/bpe.py): hand-computed merges on the
classic Sennrich word set, reconstruction invariant, distributed
word-frequency identity, and encode determinism."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from elasticsearch_data_import_handler_ray.stages.bpe import (
    END,
    apply_bpe,
    encode_word,
    train_bpe,
    word_frequencies,
)


def test_train_bpe_hand_example():
    """The Sennrich paper's word set: first merges are hand-checkable."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, vocab_size=30, min_pair_freq=2)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t',END) 9, ('l','o') 7,
    # ('o','w') 7, ... → tie on 9 broken lexicographically: ('e','s') first,
    # then ('es','t') 9, then ('est', END) 9, then ('l','o') 7, ('lo','w') 7
    assert merges[:5] == [
        ("e", "s"), ("es", "t"), ("est", END), ("l", "o"), ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    # full training (vocab 30 covers everything): words become single tokens
    for w in freqs:
        enc = encode_word(w, ranks)
        assert "".join(enc) == w + END  # reconstruction invariant
    assert encode_word("newest", ranks) == ["newest" + END]
    # an unseen word still encodes (falls back to learned subwords + chars)
    enc = encode_word("lowest", ranks)
    assert "".join(enc) == "lowest" + END
    assert "est" + END in enc  # shares the learned suffix unit


def test_word_frequencies_distributed_identity():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(300)]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    got = word_frequencies(ray.data.from_pandas(df), max_words=100).to_pandas()
    want = pd.Series(" ".join(texts).split()).value_counts()
    got_map = dict(zip(got["word"], got["freq"]))
    assert got_map == want.to_dict()
    # sorted by (freq desc, word asc)
    assert got["freq"].is_monotonic_decreasing


def test_apply_bpe_end_to_end():
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "text": ["low lower newest", "widest newest newest", ""],
        }
    )
    ds = ray.data.from_pandas(df)
    wf = word_frequencies(ds, max_words=100)
    merges = train_bpe(wf, vocab_size=40)
    out = apply_bpe(ds, merges).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_words"].tolist() == [3, 3, 0]
    ranks = {p: i for i, p in enumerate(merges)}
    for _, row in out.iterrows():
        toks = list(row["bpe_tokens"])
        assert row["n_bpe_tokens"] == len(toks)
        # tokens reconstruct the document's words exactly, in order
        words = df.loc[df.doc_id == row["doc_id"], "text"].iloc[0].lower().split()
        want = [t for w in words for t in encode_word(w, ranks)]
        assert toks == want
    # determinism across runs
    out2 = apply_bpe(ds, merges).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
