"""Deterministic subword tokenization — greedy longest-match WordPiece
(the Wu et al. 2016 inference algorithm; BERT's runtime tokenizer): each
whitespace word is consumed left-to-right by the LONGEST vocab piece that
matches, continuation pieces carrying the conventional '##' prefix;
anything unmatched becomes UNK. This is the id-production step between a
prepared corpus and sequence packing — pack by REAL token counts, not the
whitespace heuristic.

Scale shape: a pure mapInPandas projection (zero shuffle); the vocab
rides the closure broadcast (tens of MB at most — vocabularies are
bounded by construction, unlike corpora). Greedy matching is exact and
deterministic: same text + same vocab → same ids on any engine, any
partitioning (test mirrors it in pure python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


def _encode_word(word: str, vocab: dict, max_piece: int, unk_id: int) -> list[int]:
    """Greedy longest-match; one UNK for the whole word if any position
    cannot match (the WordPiece rule — partial matches are discarded)."""
    ids, pos, n = [], 0, len(word)
    while pos < n:
        prefix = "" if pos == 0 else "##"
        end = min(n, pos + max_piece)
        piece_id = None
        while end > pos:
            cand = prefix + word[pos:end]
            if cand in vocab:
                piece_id = vocab[cand]
                break
            end -= 1
        if piece_id is None:
            return [unk_id]
        ids.append(piece_id)
        pos = end
    return ids


def tokenize_greedy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    unk: str = UNK,
) -> DataFrame:
    """(id, ids array<int>, n_tokens): WordPiece ids per doc. ``vocab`` is
    the piece list (index = id); continuation pieces use the '##' prefix;
    ``unk`` must be present in the vocab."""
    if unk not in vocab:
        raise ValueError(f"tokenize_greedy: vocab must contain the unk piece {unk!r}")
    vmap = {p: i for i, p in enumerate(vocab)}
    if len(vmap) != len(vocab):
        raise ValueError("tokenize_greedy: vocab contains duplicate pieces")
    unk_id = vmap[unk]
    max_piece = max(len(p) for p in vocab)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        for pdf in batches:
            out_ids = []
            for t in pdf["t"]:
                ids: list[int] = []
                if isinstance(t, str):
                    # ASCII \s+ — the SAME token boundary as the DuckDB
                    # wp_md5 oracle mirror's regex \s+ (RE2 is ASCII);
                    # python str.split() also splits on unicode
                    # whitespace like NBSP and would diverge on
                    # non-ASCII web text (r6, advisor finding — the same
                    # boundary lm.LMClassifier documents)
                    for w in re.split(r"\s+", t, flags=re.ASCII):
                        if w:
                            ids.extend(_encode_word(w, vmap, max_piece, unk_id))
                out_ids.append(ids)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "ids": out_ids,
                    "n_tokens": pd.Series(
                        [len(x) for x in out_ids], dtype="int64"
                    ),
                }
            )

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    # id keeps the caller's type (string/decimal doc ids crashed or
    # corrupted the hardcoded 'id bigint' — r6, advisor finding; the
    # same fix classify/normalize/winnow got in r5)
    id_ddl = src.schema["id"].dataType.simpleString()
    return src.mapInPandas(
        kernel, schema=f"id {id_ddl}, ids array<int>, n_tokens bigint"
    )


def decode_ids(ids: list[int], vocab: list[str]) -> str:
    """Inverse for round-trip checks: pieces joined, '##' continuations
    fused to their predecessor."""
    words: list[str] = []
    for i in ids:
        p = vocab[i]
        if p.startswith("##") and words:
            words[-1] += p[2:]
        else:
            words.append(p)
    return " ".join(words)


def build_char_vocab(df: DataFrame, text_col: str, extra: list[str] | None = None) -> list[str]:
    """Minimal complete vocabulary: every character observed in the corpus
    (as start and '##' continuation pieces) + UNK + ``extra`` merges —
    guarantees no word ever degrades to UNK (the base a BPE-merge list
    extends). One distinct-aggregation over exploded characters."""
    chars = [
        r.c
        for r in df.select(
            F.explode(F.split(F.regexp_replace(text_col, r"\s+", ""), "")).alias("c")
        )
        .where(F.col("c") != "")
        .distinct()
        .collect()
    ]
    vocab = [UNK] + sorted(chars) + ["##" + c for c in sorted(chars)]
    for piece in extra or []:
        if piece not in vocab:
            vocab.append(piece)
    return vocab


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    sample_docs: int = 10_000,
    id_col: str | None = None,
) -> list[str]:
    """Learn ``n_merges`` BPE merge pieces from a DETERMINISTIC corpus
    sample (the md5-smallest ``sample_docs`` docs — same engine-portable
    sampling as sampling.sample_fixed) and return them in '##'-aware
    WordPiece form, ready for ``build_char_vocab(extra=...)``.

    Why sampled-on-driver: BPE training is inherently sequential — each
    merge changes the pair statistics the next merge counts, so a faithful
    distributed version is n_merges full corpus passes. Production
    tokenizers train on a bounded sample anyway (merge ranks stabilize
    quickly); the driver holds only the sample's word-frequency table.
    Deterministic: sample, tie-breaks (count desc, pair lexicographic)
    and merge order are all pure functions of the data."""
    from collections import Counter

    if id_col is not None:
        from .sampling import sample_uniform

        src = df.select(F.col(text_col).alias("t"), sample_uniform(F.col(id_col)).alias("u"))
        rows = src.orderBy("u").limit(sample_docs).collect()
    else:
        # deterministic even without an id: order by md5 of the text
        # itself (a bare limit() samples whatever the scan yields first —
        # partition-layout-dependent merges, contradicting the docstring;
        # r5 review). TakeOrderedAndProject, never a full sort.
        rows = (
            df.select(F.col(text_col).alias("t"))
            .orderBy(F.md5(F.coalesce(F.col("t"), F.lit(""))), "t")
            .limit(sample_docs)
            .collect()
        )

    word_freq = Counter()
    for r in rows:
        if isinstance(r.t, str):
            word_freq.update(r.t.split())
    # symbol sequences per word: first char bare, rest '##'-prefixed
    seqs = {
        w: tuple([w[0]] + ["##" + c for c in w[1:]]) for w in word_freq if w
    }
    merges: list[str] = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, seq in seqs.items():
            f = word_freq[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )  # count desc, pair lexicographic
        if cnt < 2:
            break
        merged = a + b[2:] if b.startswith("##") else a + b
        merges.append(merged)
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges
