"""BPE merge-table trainer (operators/bpe_trainer.py) — deterministic
DataFrame training whose output drops into kernel/bpe.py.

The exact-merge-sequence fixture is hand-computed: pieces aaab×2, ab×1.
  round 1: (a,a)=4 vs (a,b)=3            → merge (a,a)
  round 2: vocab [aa,a,b]×2, [a,b]×1 → (aa,a)=2, (a,b)=3 → merge (a,b)
  round 3: vocab [aa,ab]×2           → (aa,ab)=2          → merge (aa,ab)
  round 4: all pieces single-symbol → stop.
"""

import re
from collections import Counter

from ragstudio_spark.kernel import bpe
from ragstudio_spark.operators import bpe_trainer


def _pieces(spark, rows):
    return spark.createDataFrame(rows, "piece string, cnt long")


class TestTrainer:
    def test_known_corpus_exact_merge_sequence(self, spark):
        merges = bpe_trainer.bpe_train(
            _pieces(spark, [("aaab", 2), ("ab", 1)]), n_merges=10)
        assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]

    def test_partition_and_order_independent(self, spark):
        rows = [("the", 30), ("then", 9), ("them", 7), ("rat", 5),
                ("hat", 11), ("that", 13), ("ab", 1)]
        expect = bpe_trainer.bpe_train(_pieces(spark, rows), n_merges=6)
        got_rep = bpe_trainer.bpe_train(
            _pieces(spark, rows).repartition(7), n_merges=6)
        got_rev = bpe_trainer.bpe_train(
            _pieces(spark, list(reversed(rows))).repartition(3), n_merges=6)
        assert expect == got_rep == got_rev
        assert len(expect) > 0

    def test_min_count_stops_training(self, spark):
        # every pair unique → top count 1 < min_count 2 → zero merges
        merges = bpe_trainer.bpe_train(
            _pieces(spark, [("ab", 1), ("cd", 1)]), n_merges=5)
        assert merges == []

    def test_tie_break_is_lexicographic(self, spark):
        # (x,y) and (a,b) both count 2 → (a,b) wins rank 0
        merges = bpe_trainer.bpe_train(
            _pieces(spark, [("xy", 2), ("ab", 2)]), n_merges=1)
        assert merges == [("a", "b")]


class TestPretokenizeParity:
    def test_matches_kernel_pretokenizer(self, spark):
        """PRETOKEN_JAVA ((?U)) must produce the same (piece, cnt)
        vocabulary as the kernel's Python regex — including accents,
        contractions, punctuation runs, digits, and whitespace runs."""
        texts = [
            "the cat's hat isn't l'équipe française gère les données!",
            "we'll we've we're i'm i'd  —  multi   space\truns\nhere",
            "nums 12345 mix3d punct!!! ... (parens) [brackets]",
            "héllo wörld ÉTÉ déjà naïve œuvre 汉字",
        ]
        py = Counter()
        for t in texts:
            py.update(bpe._PRETOKEN_RE.findall(t))
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = {r["piece"]: r["cnt"]
               for r in bpe_trainer.pretokenize(df).collect()}
        assert got == dict(py)


class TestComposition:
    def test_trained_merges_drop_into_tokenizer(self, spark, tmp_path):
        merges = bpe_trainer.bpe_train(
            _pieces(spark, [("aaab", 2), ("ab", 1)]), n_merges=10)
        path = str(tmp_path / "merges.txt")
        bpe_trainer.save_merges(merges, path)
        tok = bpe.load_merges(path)
        # full merge chain applies: aaab → one token
        assert tok._bpe("aaab") == ("aaab",)
        assert tok.token_boundaries("aaab") == [0, 4]
        # and windows remain verbatim substrings
        text = "aaab ab aaab"
        for c in bpe.bpe_split(text, max_tokens=3, overlap=1, tokenizer=tok):
            assert c in text

    def test_whitespace_tokens_round_trip_through_merges_file(
            self, spark, tmp_path):
        """The GPT-2-style pre-tokenizer makes space-prefixed pieces the
        COMMON case, so trained merges contain space-bearing tokens like
        (' ', 't') — the file format must round-trip them exactly
        (save → load == identity), not corrupt the space-separated lines
        (pre-fix: split(' ') saw 3 fields and load_merges raised)."""
        df = spark.createDataFrame(
            [("the thing then and the other thing went",),
             ("then the thing sang and the thing went on",)],
            "text string")
        merges = bpe_trainer.train_from_corpus(df, n_merges=12)
        assert any(" " in a or " " in b for a, b in merges), \
            "fixture must exercise whitespace-bearing tokens"
        path = str(tmp_path / "merges.txt")
        bpe_trainer.save_merges(merges, path)
        tok = bpe.load_merges(path)
        assert [tuple(p) for p in sorted(tok.ranks, key=tok.ranks.get)] \
            == merges
        # and the loaded tokenizer behaves identically to the in-memory one
        direct = bpe.BPETokenizer(merges)
        for t in ("the thing then", " and then", "went on "):
            assert tok.token_boundaries(t) == direct.token_boundaries(t)

    def test_escape_round_trip_adversarial_tokens(self):
        """Escaping itself: backslashes, literal '\\u0041' text, tabs,
        newlines, non-breaking space — all identity under load∘save."""
        cases = ["\\", "\\\\", "\\u0041", " t", "\t", "\n\n", " x",
                 "plain", " ", "a b", "#", "##", "#version", "a#b"]
        for tok in cases:
            esc = bpe.escape_merge_token(tok)
            assert " " not in esc and "\n" not in esc and "\t" not in esc
            assert "#" not in esc    # would read back as a comment line
            assert bpe.unescape_merge_token(esc) == tok

    def test_hash_tokens_survive_the_file_round_trip(self, tmp_path):
        """A merge of markdown-heading tokens must not serialize to a
        line the comment-skipping parser drops (review-found: ('#','#')
        vanished and every later rank shifted)."""
        merges = [("#", "#"), ("a", "b"), ("ab", "c")]
        path = str(tmp_path / "m.txt")
        bpe_trainer.save_merges(merges, path)
        tok = bpe.load_merges(path)
        assert [tuple(pair) for pair in sorted(tok.ranks, key=tok.ranks.get)] \
            == merges
        assert tok._bpe("##") == ("##",)

    def test_foreign_merges_file_parses_tokens_raw(self, tmp_path):
        """Unescaping is gated on the '#version: ragstudio_spark …'
        header save_merges writes. An externally trained GPT-2-style
        file may legitimately contain pieces with literal '\\\\' or
        '\\uXXXX' substrings (Windows paths, JSON escapes from code
        corpora) — those must parse RAW, not be silently rewritten
        (review-found: piece '\\u0041' became 'A')."""
        foreign = str(tmp_path / "gpt2.txt")
        with open(foreign, "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n\\ u0041\n\\\\ path\na b\n")
        assert bpe.parse_merges(open(foreign, encoding="utf-8")) == [
            ("\\", "u0041"), ("\\\\", "path"), ("a", "b")]
        # headerless files are foreign too
        bare = str(tmp_path / "bare.txt")
        with open(bare, "w", encoding="utf-8") as f:
            f.write("\\u0041 x\n")
        assert bpe.parse_merges(open(bare, encoding="utf-8")) == [
            ("\\u0041", "x")]
        # while a save_merges round-trip still unescapes (our header)
        ours = str(tmp_path / "ours.txt")
        bpe_trainer.save_merges([("\\u0041", " t")], ours)
        tok = bpe.load_merges(ours)
        assert list(tok.ranks) == [("\\u0041", " t")]

    def test_train_from_corpus_end_to_end(self, spark):
        df = spark.createDataFrame(
            [("the thing then and the other thing",),
             ("then the thing sang and the thing went",)],
            "text string")
        merges = bpe_trainer.train_from_corpus(df, n_merges=4)
        assert 0 < len(merges) <= 4
        # ranks are usable by the tokenizer immediately
        tok = bpe.BPETokenizer(merges)
        b = tok.token_boundaries("the thing then")
        assert b[0] == 0 and b[-1] == len("the thing then")


class TestPairCounts:
    def test_overlapping_pairs_both_count(self, spark):
        vocab = spark.createDataFrame(
            [(["a", "a", "a"], 2)], "symbols array<string>, cnt long")
        got = {(r["a"], r["b"]): r["n"]
               for r in bpe_trainer.pair_counts(vocab).collect()}
        assert got == {("a", "a"): 4}  # 2 overlapping pairs × cnt 2

    def test_single_symbol_pieces_contribute_nothing(self, spark):
        vocab = spark.createDataFrame(
            [(["a"], 5), (["b", "c"], 1)], "symbols array<string>, cnt long")
        got = {(r["a"], r["b"]): r["n"]
               for r in bpe_trainer.pair_counts(vocab).collect()}
        assert got == {("b", "c"): 1}
