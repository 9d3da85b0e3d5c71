"""BPE tokenizer training (plans/tokenizer_ops.py) vs a pure-Python
reference implementation: the merge TABLE (which pairs, in which
order, with which counts) must match exactly, including the greedy
non-overlapping merge semantics on same-symbol runs ("aaaa")."""

from __future__ import annotations

from collections import Counter

from datapipelinedemo_spark.plans.tokenizer_ops import (
    MAX_WORD_CHARS,
    apply_merge,
    train_bpe,
)


# ---------------------------------------------------------------------------
# Pure-Python reference BPE (Sennrich et al. 2016, greedy
# left-to-right non-overlapping merge application)
# ---------------------------------------------------------------------------
def _py_histogram(texts: list[str]) -> dict[tuple[str, ...], int]:
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1
    return {tuple(w) + ("</w>",): c for w, c in words.items()}


def _py_apply(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _py_train2(texts: list[str], n: int):
    hist = _py_histogram(texts)
    merges = []
    for step in range(1, n + 1):
        pc = Counter()
        for syms, c in hist.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, a + b, cnt))
        nxt = Counter()
        for syms, c in hist.items():
            nxt[_py_apply(syms, a, b)] += c
        hist = dict(nxt)
    return merges


def _spark_words(spark, texts: list[str]):
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.functions.text import tokenize
    from datapipelinedemo_spark.plans.tokenizer_ops import _SYMS_EXPR

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .filter(F.length("word") <= MAX_WORD_CHARS)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .withColumn("syms", F.expr(_SYMS_EXPR))
    )


def test_train_matches_python_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest low lower",
        "the quick brown fox the the",
    ]
    got = train_bpe(spark, _spark_words(spark, texts), 6)
    assert got == _py_train2(texts, 6)


def test_same_symbol_run_merges_greedily(spark):
    # "aaaa" with top pair (a, a): greedy non-overlap → (aa)(aa), so
    # after one merge the word is ['aa', 'aa', '</w>'] — NOT
    # ['aa', 'a', 'a', '</w>'] (merge-at-every-match) and NOT a
    # rescanned ['aaaa', '</w>'].
    texts = ["aaaa aaaa aaaa"]
    words = _spark_words(spark, texts)
    merged = apply_merge(words, "a", "a").collect()
    assert merged[0].syms == ["aa", "aa", "</w>"]
    got = train_bpe(spark, _spark_words(spark, texts), 3)
    assert got == _py_train2(texts, 3)


def test_odd_run_leaves_tail_symbol(spark):
    # "aaa": merges at offsets 0 → (aa) a
    words = _spark_words(spark, ["aaa"])
    assert apply_merge(words, "a", "a").collect()[0].syms == [
        "aa",
        "a",
        "</w>",
    ]


def test_merge_consumes_marker_pairs(spark):
    # merging (o, '</w>') must produce the multi-char 'o</w>' symbol
    words = _spark_words(spark, ["lo lo go"])
    out = {
        r.word: r.syms
        for r in apply_merge(words, "o", "</w>").collect()
    }
    assert out["lo"] == ["l", "o</w>"]
    assert out["go"] == ["g", "o</w>"]


def test_tie_break_is_binary_string_order(spark):
    # two pairs with equal counts: the (lhs, rhs) binary-ascending
    # pair must win deterministically in both engines
    texts = ["ab cd ab cd"]
    got = train_bpe(spark, _spark_words(spark, texts), 1)
    assert got == _py_train2(texts, 1)
    assert (got[0][1], got[0][2]) == min(
        [("a", "b"), ("c", "d"), ("b", "</w>"), ("d", "</w>")]
    )


def test_encode_token_counts_match_python_reference(spark, tmp_path):
    # end-to-end train→apply on a tiny corpus written as a real
    # sf-dir documents table, vs the pure-Python pipeline
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        N_MERGES,
        bpe_encode_token_counts,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest low lower",
        "the quick brown fox the the",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["src0"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe_encode_token_counts(spark, str(tmp_path)).collect()
    }

    merges = _py_train2(texts, N_MERGES)
    want = {}
    for i, t in enumerate(texts):
        words = [
            tuple(w) + ("</w>",)
            for w in t.lower().split()
            if w and len(w) <= MAX_WORD_CHARS
        ]
        for _, a, b, _, _ in merges:
            words = [_py_apply(s, a, b) for s in words]
        want[i] = (len(words), sum(len(s) for s in words))
    assert got == want


def test_batch_merge_application_equals_stepwise_fold(spark):
    # the lazy string-replace path (encode/vocab) must agree with the
    # per-step fold on multi-char symbols and same-symbol runs
    from datapipelinedemo_spark.plans.tokenizer_ops import (
        apply_merges_batch,
    )

    texts = ["aaaa aab abab low lower the the banana bananas"]
    words = _spark_words(spark, texts)
    merges = train_bpe(spark, _spark_words(spark, texts), 5)

    stepped = words
    for _s, a, b, _m, _c in merges:
        stepped = apply_merge(stepped, a, b)
    # materialize each step so the fold chain stays tractable
    want = {r.word: r.syms for r in stepped.collect()}
    got = {
        r.word: r.syms
        for r in apply_merges_batch(words, merges).collect()
    }
    assert got == want
    # and both agree with the pure-Python reference application
    for w, syms in got.items():
        ref = tuple(w) + ("</w>",)
        for _s, a, b, _m, _c in merges:
            ref = _py_apply(ref, a, b)
        assert tuple(syms) == ref, w


def test_single_symbol_words_do_not_crash_pair_counts(spark):
    # regression (r9): after an ('a', '</w>') merge the word 'a'
    # collapses to the single symbol 'a</w>'; an unguarded
    # sequence(1, size-1) counts DOWN to [1, 0] and the next step's
    # element_at(syms, 0) throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT.
    # The guarded _PAIRS_EXPR must instead contribute zero pairs,
    # matching the oracle's empty list_slice.
    texts = ["a a a a a a b"]
    got = train_bpe(spark, _spark_words(spark, texts), 3)
    assert got == _py_train2(texts, 3)
    # and the fully-collapsed histogram still pair-counts cleanly
    from datapipelinedemo_spark.plans.tokenizer_ops import _pair_counts

    words = _spark_words(spark, texts)
    collapsed = apply_merge(apply_merge(words, "a", "</w>"), "b", "</w>")
    assert _pair_counts(collapsed).collect() == []


def _rich_corpus() -> list[str]:
    # deterministic pseudo-corpus with enough pair diversity to
    # sustain 64+ productive merges (Zipf-ish word frequencies)
    stems = [
        "tokenize", "partition", "shuffle", "broadcast", "checkpoint",
        "histogram", "frequency", "pipeline", "gradient", "attention",
        "embedding", "alignment", "sampling", "training", "language",
    ]
    suffixes = ["", "s", "ed", "ing", "er"]
    words = []
    for i, st in enumerate(stems):
        for j, su in enumerate(suffixes):
            words.extend([st + su] * ((i + 2) * (j + 1) % 7 + 1))
    # chunk into lines of 9 words
    return [
        " ".join(words[k : k + 9]) for k in range(0, len(words), 9)
    ]


def test_train_64_merges_matches_python_reference(spark):
    # exercises the real-scale path: 64 merges crosses the
    # CHECKPOINT_EVERY=16 lineage-truncation boundary four times, and
    # the lazy replace-chain pair counting between checkpoints
    from datapipelinedemo_spark.plans.tokenizer_ops import (
        CHECKPOINT_EVERY,
    )

    assert CHECKPOINT_EVERY < 64
    texts = _rich_corpus()
    got = train_bpe(spark, _spark_words(spark, texts), 64)
    want = _py_train2(texts, 64)
    assert len(want) == 64, "corpus must sustain 64 productive merges"
    assert got == want


def test_batched_selection_equals_sequential(spark):
    # r9: probe_k>1 must be BIT-identical to the sequential loop on
    # every corpus — incl. tie-heavy and overlap-heavy ones designed
    # to stress the strictly-dominant disjoint-prefix rule
    corpora = [
        _rich_corpus(),
        ["low lower lowest low low", "new newer newest new news"],
        ["ab ab ab cd cd cd ef ef ef"],          # all-tied counts
        ["abc bcd cde abc bcd cde abc"],          # chained overlaps
        ["aaaa aab abab banana bananas the the"],  # runs + markers
        ["a a a a a a b"],                         # collapse corpus
    ]
    for texts in corpora:
        want = _py_train2(texts, 40)
        for k in (4, 16, 64):
            got = train_bpe(spark, _spark_words(spark, texts), 40, probe_k=k)
            assert got == want, (texts[0][:30], k)


def test_safe_merge_batch_rules():
    from collections import namedtuple

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        _safe_merge_batch,
    )

    R = namedtuple("R", "lhs rhs pair_count")
    # overlap stops the prefix: (x,a) shares 'a' with (a,b)
    top = [R("a", "b", 100), R("x", "a", 95), R("c", "d", 60)]
    assert _safe_merge_batch(top) == [top[0]]
    # disjoint but TIED with the excluded pair -> trimmed to leader
    top = [R("a", "b", 100), R("c", "d", 95), R("x", "a", 95)]
    assert _safe_merge_batch(top) == [top[0]]
    # disjoint and strictly dominant -> both taken
    top = [R("a", "b", 100), R("c", "d", 96), R("x", "a", 95)]
    assert _safe_merge_batch(top) == [top[0], top[1]]
    # a pair naming an earlier MERGED symbol conflicts ((x, ab) after
    # (a,b): applying (a,b) creates new ab occurrences)
    top = [R("a", "b", 100), R("x", "ab", 96), R("c", "d", 90)]
    assert _safe_merge_batch(top) == [top[0]]
    # probe exhausted without conflict: last row is the bound, dropped
    top = [R("a", "b", 100), R("c", "d", 96)]
    assert _safe_merge_batch(top) == [top[0]]
    assert _safe_merge_batch([top[0]]) == [top[0]]

    # --- symbol-string aliasing (ADVICE r9) ---
    # a member whose concatenation equals an EXISTING symbol (prior
    # merge path) is kept but ends the batch: pre-existing (x, cd)
    # counts break the m_excl bound for members after it
    top = [R("a", "b", 100), R("c", "d", 98), R("e", "f", 96), R("g", "h", 90)]
    assert _safe_merge_batch(top, frozenset({"cd"})) == [top[0], top[1]]
    # aliasing on the FIRST member: later members lose the bound too
    assert _safe_merge_batch(top, frozenset({"ab"})) == [top[0]]
    # within-batch aliasing: two disjoint decompositions of the same
    # string ('a'+'bc' vs 'ab'+'c') — second one ends the batch
    top = [R("a", "bc", 100), R("ab", "c", 98), R("d", "e", 96), R("f", "g", 90)]
    assert _safe_merge_batch(top) == [top[0], top[1]]
    # no aliasing -> unchanged behavior
    top = [R("a", "b", 100), R("c", "d", 98), R("e", "f", 96), R("g", "h", 90)]
    assert _safe_merge_batch(top, frozenset({"</w>"})) == [
        top[0], top[1], top[2],
    ]


def test_wordpiece_greedy_matches_python_reference(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from collections import Counter

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        WP_MAX_PIECE,
        WP_VOCAB,
        wordpiece_token_counts,
    )

    texts = [
        "internationalization international nation nationalize",
        "the theory theatre the them theme",
        "a ab abc abcd abcde the",
        "tokenize tokenizer tokenized tokens token",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    # pure-Python twin: vocab = top-V substrings by weighted count
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for s0 in range(len(w)):
            for ln in range(2, min(WP_MAX_PIECE, len(w) - s0) + 1):
                subs[w[s0 : s0 + ln]] += c
    vocab = {
        p
        for p, _ in sorted(subs.items(), key=lambda kv: (-kv[1], kv[0]))[
            :WP_VOCAB
        ]
    }

    def greedy(w):
        i, n = 0, 0
        while i < len(w):
            ln = 1
            for trial in range(min(WP_MAX_PIECE, len(w) - i), 1, -1):
                if w[i : i + trial] in vocab:
                    ln = trial
                    break
            n += 1
            i += ln
        return n

    want = {}
    for d, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        want[d] = (len(ws), sum(greedy(w) for w in ws))
    got = {
        r.doc_id: (r.n_words, r.n_wp_tokens)
        for r in wordpiece_token_counts(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_unigram_viterbi_matches_python_reference(spark, tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from collections import Counter

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        UV_VOCAB,
        WP_MAX_PIECE,
        unigram_viterbi_token_counts,
    )

    texts = [
        "internationalization international nation nationalize",
        "the theory theatre the them theme",
        "a ab abc abcd abcde the",
        "banana bananas ban anna nab",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for s0 in range(len(w)):
            for ln in range(1, min(WP_MAX_PIECE, len(w) - s0) + 1):
                subs[w[s0 : s0 + ln]] += c
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UV_VOCAB]
    inv = dict(multi) | {p: c for p, c in subs.items() if len(p) == 1}
    t = sum(inv.values())
    nll = {
        p: math.floor(-math.log(c / t) * 1e6 + 0.5) for p, c in inv.items()
    }

    def viterbi(w):
        best = [(0, 0)] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for ln in range(1, min(WP_MAX_PIECE, i) + 1):
                piece = w[i - ln : i]
                if piece in nll:
                    c0, n0 = best[i - ln]
                    cands.append((c0 + nll[piece], n0 + 1))
            best[i] = min(cands)
        return best[len(w)]

    want = {}
    for d, t_ in enumerate(texts):
        ws = [w for w in t_.lower().split() if w]
        bests = [viterbi(w) for w in ws]
        want[d] = (
            len(ws),
            sum(b[1] for b in bests),
            sum(b[0] for b in bests),
        )
    got = {
        r.doc_id: (r.n_words, r.n_unigram_tokens, r.total_nll6)
        for r in unigram_viterbi_token_counts(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_tokenizer_families_random_corpora(spark, tmp_path):
    # seeded random-corpus sweep: all three tokenizer families vs
    # their pure-Python references on corpora none of the fixed tests
    # chose (guards the span/DP expressions against shape surprises)
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from collections import Counter

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        UV_VOCAB,
        WP_MAX_PIECE,
        WP_VOCAB,
        unigram_viterbi_token_counts,
        wordpiece_token_counts,
    )

    rng = random.Random(424242)
    alphabet = "abcdef"
    stems = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
        for _ in range(30)
    ]
    texts = [
        " ".join(rng.choice(stems) for _ in range(12)) for _ in range(8)
    ]
    d = str(tmp_path / "rand")
    import os

    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1

    def sub_counts(min_len):
        subs = Counter()
        for w, c in words.items():
            for s0 in range(len(w)):
                for ln in range(
                    min_len, min(WP_MAX_PIECE, len(w) - s0) + 1
                ):
                    subs[w[s0 : s0 + ln]] += c
        return subs

    # --- wordpiece ---
    subs2 = sub_counts(2)
    wp_vocab = {
        p
        for p, _ in sorted(subs2.items(), key=lambda kv: (-kv[1], kv[0]))[
            :WP_VOCAB
        ]
    }

    def greedy(w):
        i, n = 0, 0
        while i < len(w):
            ln = 1
            for trial in range(min(WP_MAX_PIECE, len(w) - i), 1, -1):
                if w[i : i + trial] in wp_vocab:
                    ln = trial
                    break
            n += 1
            i += ln
        return n

    want_wp = {}
    for di, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        want_wp[di] = (len(ws), sum(greedy(w) for w in ws))
    got_wp = {
        r.doc_id: (r.n_words, r.n_wp_tokens)
        for r in wordpiece_token_counts(spark, d).collect()
    }
    assert got_wp == want_wp

    # --- unigram viterbi ---
    subs1 = sub_counts(1)
    multi = sorted(
        ((p, c) for p, c in subs1.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UV_VOCAB]
    inv = dict(multi) | {p: c for p, c in subs1.items() if len(p) == 1}
    tot = sum(inv.values())
    nll = {
        p: math.floor(-math.log(c / tot) * 1e6 + 0.5)
        for p, c in inv.items()
    }

    def viterbi(w):
        best = [(0, 0)] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for ln in range(1, min(WP_MAX_PIECE, i) + 1):
                piece = w[i - ln : i]
                if piece in nll:
                    c0, n0 = best[i - ln]
                    cands.append((c0 + nll[piece], n0 + 1))
            best[i] = min(cands)
        return best[len(w)]

    want_uv = {}
    for di, t in enumerate(texts):
        ws = [w for w in t.lower().split() if w]
        bests = [viterbi(w) for w in ws]
        want_uv[di] = (
            len(ws),
            sum(b[1] for b in bests),
            sum(b[0] for b in bests),
        )
    got_uv = {
        r.doc_id: (r.n_words, r.n_unigram_tokens, r.total_nll6)
        for r in unigram_viterbi_token_counts(spark, d).collect()
    }
    assert got_uv == want_uv

    # --- bpe (training, batched) ---
    want_bpe = _py_train2(texts, 24)
    got_bpe = train_bpe(spark, _spark_words(spark, texts), 24, probe_k=32)
    assert got_bpe == want_bpe


def test_unigram_hard_em_matches_python_reference(spark, tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from collections import Counter

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        UV_VOCAB,
        WP_MAX_PIECE,
        unigram_em_piece_usage,
    )

    texts = [
        "internationalization international nation nationalize",
        "the theory theatre the them theme customer customers",
        "banana bananas ban anna nab custom er",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for s0 in range(len(w)):
            for ln in range(1, min(WP_MAX_PIECE, len(w) - s0) + 1):
                subs[w[s0 : s0 + ln]] += c
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UV_VOCAB]
    inv = dict(multi) | {p: c for p, c in subs.items() if len(p) == 1}
    tot = sum(inv.values())
    nll = {
        p: math.floor(-math.log(c / tot) * 1e6 + 0.5)
        for p, c in inv.items()
    }

    def viterbi_path(w):
        best = [(0, 0, 0)] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for ln in range(1, min(WP_MAX_PIECE, i) + 1):
                piece = w[i - ln : i]
                if piece in nll:
                    c0, n0, _ = best[i - ln]
                    cands.append((c0 + nll[piece], n0 + 1, ln))
            best[i] = min(cands)
        pieces, pos = [], len(w)
        while pos > 0:
            ln = best[pos][2]
            pieces.append(w[pos - ln : pos])
            pos -= ln
        return pieces

    usage = Counter()
    for w, c in words.items():
        for p in viterbi_path(w):
            usage[p] += c
    t2 = sum(usage.values())
    want = {
        p: (u, math.floor(-math.log(u / t2) * 1e6 + 0.5))
        for p, u in usage.items()
    }
    got = {
        r.piece: (r.usage, r.new_nll6)
        for r in unigram_em_piece_usage(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_unigram_training_loop_matches_python_reference(spark, tmp_path):
    """The FULL prune-and-re-estimate loop (train_unigram) vs a pure
    Python mirror, with a seed budget small enough that pruning BITES
    every round (16 -> 12 -> 9 -> 6 multi-char pieces) and rounds >= 3
    so the per-round eager-checkpoint cadence is crossed repeatedly."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        WP_MAX_PIECE,
        _uv_base,
        train_unigram,
    )

    texts = [
        "internationalization international nation nationalize",
        "the theory theatre the them theme customer customers",
        "banana bananas ban anna nab custom er",
        "station nation ration elation libation",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1

    # seed inventory: top-16 multi-char substrings + all single chars
    subs = Counter()
    for w, c in words.items():
        for s0 in range(len(w)):
            for ln in range(1, min(WP_MAX_PIECE, len(w) - s0) + 1):
                subs[w[s0 : s0 + ln]] += c
    budget = 16
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:budget]
    inv = dict(multi) | {p: c for p, c in subs.items() if len(p) == 1}
    tot = sum(inv.values())
    nll = {
        p: math.floor(-math.log(c / tot) * 1e6 + 0.5)
        for p, c in inv.items()
    }

    def viterbi_path(w, nll):
        best = [(0, 0, 0)] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for ln in range(1, min(WP_MAX_PIECE, i) + 1):
                piece = w[i - ln : i]
                if piece in nll:
                    c0, n0, _ = best[i - ln]
                    cands.append((c0 + nll[piece], n0 + 1, ln))
            best[i] = min(cands)
        pieces, pos = [], len(w)
        while pos > 0:
            ln = best[pos][2]
            pieces.append(w[pos - ln : pos])
            pos -= ln
        return pieces

    def em_round(nll, keep_b):
        usage = Counter()
        for w, c in words.items():
            for p in viterbi_path(w, nll):
                usage[p] += c
        kept = dict(
            sorted(
                ((p, u) for p, u in usage.items() if len(p) >= 2),
                key=lambda kv: (-kv[1], kv[0]),
            )[:keep_b]
        ) | {p: max(usage.get(p, 0), 1) for p in nll if len(p) == 1}
        t = sum(kept.values())
        return kept, {
            p: math.floor(-math.log(u / t) * 1e6 + 0.5)
            for p, u in kept.items()
        }

    b, rounds = budget, 3
    for _ in range(rounds):
        b = (b * 3) // 4
        kept, nll = em_round(nll, b)
    want = {p: (kept[p], nll[p]) for p in kept}

    w_, a_, s_ = _uv_base(spark, str(tmp_path), multi_budget=budget)
    final = train_unigram(spark, w_, a_, s_, rounds=rounds, budget=budget)
    got = {r.piece: (r.usage, r.nll6) for r in final.collect()}
    assert got == want
    # pruning actually bit: more multi pieces existed than survived
    n_multi = sum(1 for p in got if len(p) >= 2)
    assert n_multi == 6 < len(multi)


def _py_train_wp(texts: list[str], n: int):
    """Pure-Python WordPiece trainer: likelihood score
    count(ab) / (count(a) * count(b)) with the SAME float64 operation
    order as both engines (cast counts to double, one product, one
    division), ties broken (lhs, rhs) ascending."""
    hist = _py_histogram(texts)
    merges = []
    for step in range(1, n + 1):
        pc, sc = Counter(), Counter()
        for syms, c in hist.items():
            for s in syms:
                sc[s] += c
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(),
            key=lambda kv: (
                -(float(kv[1]) / (float(sc[kv[0][0]]) * float(sc[kv[0][1]]))),
                kv[0],
            ),
        )
        merges.append((step, a, b, a + b, cnt))
        nxt = Counter()
        for syms, c in hist.items():
            nxt[_py_apply(syms, a, b)] += c
        hist = dict(nxt)
    return merges


def test_wordpiece_training_matches_python_reference(spark):
    from datapipelinedemo_spark.plans.tokenizer_ops import train_wordpiece

    corpora = [
        [
            "low lower lowest low low",
            "new newer newest new news",
            "wide wider widest low lower",
            "the quick brown fox the the",
        ],
        ["ab ab ab cd cd cd ef ef ef"],      # tied raw counts
        ["aaaa aab abab banana bananas the the"],
        ["abc bcd cde abc bcd cde abc"],      # chained overlaps
    ]
    for texts in corpora:
        got = train_wordpiece(spark, _spark_words(spark, texts), 18)
        want = _py_train_wp(texts, 18)
        assert got == want, texts[0][:30]


def test_wordpiece_vs_bpe_selection_differs(spark):
    # sanity: on a corpus where a frequent pair has very frequent
    # units, the likelihood score must pick a DIFFERENT first merge
    # than raw frequency — 'th' is the most frequent pair, but its
    # units are ubiquitous; 'qu' has rarer units.
    from datapipelinedemo_spark.plans.tokenizer_ops import train_wordpiece

    texts = ["the the the the than that quit quiz"] * 2
    bpe = _py_train2(texts, 1)[0]
    wp = _py_train_wp(texts, 1)[0]
    assert (bpe[1], bpe[2]) != (wp[1], wp[2])
    got = train_wordpiece(spark, _spark_words(spark, texts), 1)
    assert got == _py_train_wp(texts, 1)


def _py_train_unigram(texts, budget, rounds, keep_num=3, keep_den=4):
    """Pure-Python mirror of train_unigram (seed scores from top
    substring counts, hard-EM rounds with pruning, singles floored at
    usage 1)."""
    import math

    from datapipelinedemo_spark.plans.tokenizer_ops import WP_MAX_PIECE

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= MAX_WORD_CHARS:
                words[w] += 1
    subs = Counter()
    for w, c in words.items():
        for s0 in range(len(w)):
            for ln in range(1, min(WP_MAX_PIECE, len(w) - s0) + 1):
                subs[w[s0 : s0 + ln]] += c
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:budget]
    inv = dict(multi) | {p: c for p, c in subs.items() if len(p) == 1}
    tot = sum(inv.values())
    nll = {
        p: math.floor(-math.log(c / tot) * 1e6 + 0.5)
        for p, c in inv.items()
    }

    def viterbi_path(w, nll):
        best = [(0, 0, 0)] + [None] * len(w)
        for i in range(1, len(w) + 1):
            cands = []
            for ln in range(1, min(WP_MAX_PIECE, i) + 1):
                piece = w[i - ln : i]
                if piece in nll:
                    c0, n0, _ = best[i - ln]
                    cands.append((c0 + nll[piece], n0 + 1, ln))
            best[i] = min(cands)
        pieces, pos = [], len(w)
        while pos > 0:
            ln = best[pos][2]
            pieces.append(w[pos - ln : pos])
            pos -= ln
        return pieces

    b = budget
    kept = None
    for _ in range(rounds):
        usage = Counter()
        for w, c in words.items():
            for p in viterbi_path(w, nll):
                usage[p] += c
        b = (b * keep_num) // keep_den
        kept = dict(
            sorted(
                ((p, u) for p, u in usage.items() if len(p) >= 2),
                key=lambda kv: (-kv[1], kv[0]),
            )[:b]
        ) | {p: max(usage.get(p, 0), 1) for p in nll if len(p) == 1}
        t = sum(kept.values())
        nll = {
            p: math.floor(-math.log(u / t) * 1e6 + 0.5)
            for p, u in kept.items()
        }
    return {p: (kept[p], nll[p]) for p in kept}


def test_trainers_random_corpora(spark, tmp_path):
    """Seeded random-corpus sweep for BOTH new trainers — random
    corpora hit tie-break and pruning edges the handpicked tests
    don't (same guard the inference families already have)."""
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        _uv_base,
        train_unigram,
        train_wordpiece,
    )

    rng = random.Random(31337)
    alphabet = "abcd"
    for trial in range(3):
        stems = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(20)
        ]
        texts = [
            " ".join(rng.choice(stems) for _ in range(10))
            for _ in range(6)
        ]
        # wordpiece: merge table equality at 12 likelihood-scored steps
        got_wp = train_wordpiece(spark, _spark_words(spark, texts), 12)
        assert got_wp == _py_train_wp(texts, 12), (trial, texts[0][:30])

        # unigram: final inventory equality at 3 pruning rounds
        d = str(tmp_path / f"rand{trial}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(len(texts))),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["s"] * len(texts),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        budget = 12
        w_, a_, s_ = _uv_base(spark, d, multi_budget=budget)
        final = train_unigram(spark, w_, a_, s_, rounds=3, budget=budget)
        got_uv = {r.piece: (r.usage, r.nll6) for r in final.collect()}
        assert got_uv == _py_train_unigram(texts, budget, 3), trial


def test_byte_fallback_matches_pure_python_dp(spark, sf_dir):
    """VERDICT r10 #7: byte-fallback Viterbi under the trained,
    coverage-capped unigram vocab — a pure-Python replica of the
    lattice (covered spans + per-position byte edges at the penalty
    score) must agree with the Spark fold per distinct word, the
    dropped characters must be the corpus-rarest, and the fallback
    path must actually fire on this corpus."""
    from collections import Counter

    from pyspark.sql import functions as F

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        MAX_WORD_CHARS,
        UV_BF_DROP,
        UV_BF_NLL6,
        tokenize,
        uv_bf_dropped_chars,
        uv_bf_scores,
        uv_bf_word_segments,
    )
    from datapipelinedemo_spark.tables import table

    dropped = uv_bf_dropped_chars(spark, sf_dir)
    assert len(dropped) == UV_BF_DROP

    # corpus-rarest check, recomputed independently in Python
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("word"))
        .filter(F.length("word") <= MAX_WORD_CHARS)
        .collect()
    )
    freq = Counter()
    for r in words:
        for ch in r.word:
            freq[ch] += 1
    want_drop = [c for _, c in sorted((v, k) for k, v in freq.items())][
        :UV_BF_DROP
    ]
    assert dropped == want_drop

    vocab = {
        r.piece: r.nll6 for r in uv_bf_scores(spark, sf_dir).collect()
    }
    assert vocab and not any(
        any(d in p for d in dropped) for p in vocab
    )

    def py_dp(word):
        # best[i] = (cost, ntok, fb) to cover word[:i]
        INF = (float("inf"), 0, 0)
        best = [(0, 0, 0)] + [INF] * len(word)
        for i in range(1, len(word) + 1):
            cands = []
            for j in range(max(0, i - 8), i):
                piece = word[j:i]
                if piece in vocab and best[j][0] != float("inf"):
                    c, n, f = best[j]
                    cands.append((c + vocab[piece], n + 1, f))
            # byte-fallback edge for word[i-1]
            nb = len(word[i - 1].encode("utf-8"))
            c, n, f = best[i - 1]
            if c != float("inf"):
                cands.append((c + nb * UV_BF_NLL6, n + nb, f + nb))
            best[i] = min(cands)
        return best[len(word)]

    got = {
        r.word: (r.best.c, r.best.n, r.best.f)
        for r in uv_bf_word_segments(spark, sf_dir).collect()
    }
    assert got
    total_fb = 0
    for w, (c, n, f) in got.items():
        assert py_dp(w) == (c, n, f), w
        total_fb += f
    assert total_fb > 0  # fallback genuinely fires on this corpus


def test_byte_level_bpe_on_multibyte_text(spark, tmp_path):
    """Byte alphabet semantics on planted non-ASCII: multi-byte chars
    decompose to their UTF-8 bytes (hex pairs), merges recover
    frequent byte sequences, and NOTHING is out-of-alphabet — the
    emoji-bearing word still encodes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datapipelinedemo_spark.plans.tokenizer_ops import (
        _byte_word_histogram,
        bpe_byte_level_token_counts,
        trained_byte_merges,
    )

    texts = [
        "café café café naïve",  # é = C3A9, ï = C3AF
        "café über über",
        "ascii only words here",
        "emoji 🚀 test",  # 🚀 = F09F9A80 (4 bytes)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["fr", "de", "en", "en"],
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    sf = str(tmp_path)

    syms = {
        r.word: list(r.syms)
        for r in _byte_word_histogram(spark, sf).collect()
    }
    assert syms["café"] == ["63", "61", "66", "C3", "A9", "</w>"]
    assert syms["🚀"] == ["F0", "9F", "9A", "80", "</w>"]

    merges = trained_byte_merges(spark, sf)
    assert len(merges) == 4
    # every merged symbol is a concatenation of hex pairs
    assert all(len(m[3].replace("</w>", "")) % 2 == 0 for m in merges)

    got = {
        r.doc_id: (r.n_words, r.n_utf8_bytes, r.n_byte_bpe_tokens)
        for r in bpe_byte_level_token_counts(spark, sf).collect()
    }
    # every word of every doc encodes (no OOV under a byte alphabet)
    assert {d for d in got} == {0, 1, 2, 3}
    assert got[0][0] == 4
    # café = 5 bytes x 3 + naïve = 6 bytes -> 21 bytes > 19 chars
    assert got[0][1] == 21
    # token count is bounded by bytes + one </w> per word, and merges
    # only shrink it
    for d, (nw, nb, nt) in got.items():
        assert nt <= nb + nw
        assert nt >= nw  # at least one token per word


def test_wordpiece_unk_vs_bytes_policies(spark, tmp_path, monkeypatch):
    """OOV policy semantics on planted rare characters: with the
    coverage budget squeezed, a word containing a dropped char costs
    1 ([UNK] policy) vs its UTF-8 byte count (byte-fallback policy);
    in-vocab words cost the same greedy count under both."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import datapipelinedemo_spark.plans.tokenizer_ops as T

    texts = [
        "the cat sat on the mat",
        "the qat zag",          # q and z are corpus-rare
        "naïve café words",     # multi-byte chars, also rare
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    # squeeze coverage so the rare chars (q, z, accents, ...) drop
    monkeypatch.setattr(T, "WP_CHAR_KEEP", 12)

    # python mirror of the coverage budget + both policies
    from collections import Counter

    wcnt = Counter()
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= T.MAX_WORD_CHARS:
                wcnt[w] += 1
    chist = Counter()
    for w, c in wcnt.items():
        for ch in w:
            chist[ch] += c
    keep = {
        ch
        for ch, _ in sorted(chist.items(), key=lambda kv: (-kv[1], kv[0]))[
            :12
        ]
    }
    oov = {w for w in wcnt if any(ch not in keep for ch in w)}
    # the planted rare-char words must actually be OOV
    assert {"qat", "zag", "naïve", "café"} <= oov

    got = {
        r.doc_id: r
        for r in T.wordpiece_unk_vs_bytes(spark, str(tmp_path)).collect()
    }
    for d, text in enumerate(texts):
        ws = [w for w in text.lower().split() if w]
        n_oov = sum(1 for w in ws if w in oov)
        assert got[d].n_words == len(ws)
        assert got[d].n_unk_words == n_oov, (d, oov)
        # byte policy charges len(utf8 bytes) per OOV word vs 1 [UNK];
        # in-vocab words cost the same greedy count under both
        want_delta = sum(
            len(w.encode("utf-8")) - 1 for w in ws if w in oov
        )
        assert (
            got[d].n_bytefb_tokens - got[d].n_unk_policy_tokens
            == want_delta
        )
        assert got[d].n_unk_policy_tokens >= len(ws)
