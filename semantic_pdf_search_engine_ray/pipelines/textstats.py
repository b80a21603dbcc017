"""Text-analysis stages over a documents table: language ID, quality
scoring, token counting, content fingerprinting.

Generalizes the reference's chunk-quality predicates
(`/root/reference/src/chunk.rs:64-116` ``is_valid_chunk``: min length,
min words, alpha ratio, ellipsis/code heuristics — SURVEY.md §2.2 M5-M8)
from per-chunk to per-document, and adds the training-data operators the
reference lacks. Every numeric rule here is deliberately expressible in
ANSI SQL (DuckDB RE2 regexes + list lambdas) so the driver's oracle can
validate the distributed run value-for-value.

Vectorization: per-row counts use ``pyarrow.compute.count_substring_regex``
(zero-copy Arrow in, no Python row loop); only the token-set membership
ops (stopword hits) walk tokens, inside an actor-holding-compiled-state
stage.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from semantic_pdf_search_engine_ray.config import TOKEN_PATTERN
from semantic_pdf_search_engine_ray.functions.num import (
    round6_half_away as _r6,
    round6_half_away_arr as _r6_arr,
)
from semantic_pdf_search_engine_ray.functions.shingle import winnow_fingerprints
from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

# Patterns shared verbatim with the SQL oracle (RE2-compatible, ASCII
# classes only so Python re and DuckDB agree byte-for-byte).
ALPHA_CHAR_PATTERN = "[A-Za-z]"
ALNUM_CHAR_PATTERN = "[a-z0-9]"
WORD_RUN_PATTERN = "[A-Za-z]+"
NUMBER_RUN_PATTERN = "[0-9]+"
PUNCT_CHAR_PATTERN = "[^A-Za-z0-9 \\t\\n\\r]"
WS_RUN_PATTERN = "[ \\t\\n\\r]+"

# PII-ish surface features a training-data pipeline masks or filters on
# (RE2, ASCII classes — identical bytes on both engines).
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
URL_PATTERN = "https?://[^ \\t\\n\\r]+"
LONG_DIGIT_RUN_PATTERN = "[0-9]{7,}"

# Tiny pinned stopword lists (module constants = part of the operator
# contract; the SQL oracle embeds the same lists).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "para"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # argmax tie-break priority

# M5 thresholds, doc-level (chunk.rs:74 len>=50; :80 words>=8; :92 ratio>=0.5)
QUALITY_MIN_CHARS = 50
QUALITY_MIN_WORDS = 8
QUALITY_MIN_ALPHA_RATIO = 0.5


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, doc_len, text_chars, alnum_chars) — all vectorized."""
    lower = pc.utf8_lower(batch.column("text"))
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "doc_len": pc.count_substring_regex(lower, TOKEN_PATTERN).cast(
                pa.int64()
            ),
            "text_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
            "alnum_chars": pc.count_substring_regex(
                lower, ALNUM_CHAR_PATTERN
            ).cast(pa.int64()),
        }
    )


def token_class_counts_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token classes: word runs, number runs, punctuation chars."""
    text = batch.column("text")
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_words": pc.count_substring_regex(text, WORD_RUN_PATTERN).cast(
                pa.int64()
            ),
            "n_numbers": pc.count_substring_regex(
                text, NUMBER_RUN_PATTERN
            ).cast(pa.int64()),
            "n_punct": pc.count_substring_regex(text, PUNCT_CHAR_PATTERN).cast(
                pa.int64()
            ),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Doc-level M5 predicate + its inputs.

    alpha_ratio = [A-Za-z] chars / chars (chunk.rs:84-92 semantics);
    is_quality = trimmed chars >= 50 AND words >= 8 AND ratio >= 0.5.
    Ratios rounded to 6 dp to absorb float formatting across engines.
    """
    text = batch.column("text")
    lower = pc.utf8_lower(text)
    chars = pc.utf8_length(text).cast(pa.int64()).to_numpy()
    trimmed = pc.utf8_length(pc.utf8_trim(text, " \t\n\r")).cast(
        pa.int64()
    ).to_numpy()  # ASCII-ws trim: pinned to match SQL trim(text, chr-list)
    words = pc.count_substring_regex(lower, TOKEN_PATTERN).cast(
        pa.int64()
    ).to_numpy()
    alpha = pc.count_substring_regex(text, ALPHA_CHAR_PATTERN).cast(
        pa.int64()
    ).to_numpy()
    ratio = np.where(chars > 0, alpha / np.maximum(chars, 1), 0.0)
    is_q = (
        (trimmed >= QUALITY_MIN_CHARS)
        & (words >= QUALITY_MIN_WORDS)
        & (ratio >= QUALITY_MIN_ALPHA_RATIO)
    )
    # ratio stays UNROUNDED: int/int double division is bit-identical in
    # every engine, while round() tie rules differ (half-even vs away).
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_chars_trim": pa.array(trimmed, type=pa.int64()),
            "n_tokens": pa.array(words, type=pa.int64()),
            "alpha_chars": pa.array(alpha, type=pa.int64()),
            "alpha_ratio": pa.array(ratio, type=pa.float64()),
            "is_quality": pa.array(is_q, type=pa.bool_()),
        }
    )


class LangIdStage:
    """Actor-pool stage: stopword-hit argmax language ID.

    pred_lang = language with the most stopword token hits (tie order
    en > de > fr > es); 'und' when no list hits at all. State (frozen
    sets) built once per actor (T1 pattern)."""

    def __init__(self):
        self.sets = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        preds: list[str] = []
        hit_cols: dict[str, list[int]] = {lang: [] for lang in LANG_ORDER}
        for t in texts:
            toks = tokenize(t)
            best_lang, best_hits = "und", 0
            for lang in LANG_ORDER:
                hits = sum(1 for tok in toks if tok in self.sets[lang])
                hit_cols[lang].append(hits)
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            preds.append(best_lang)
        cols = {"doc_id": pa.array(ids, type=pa.int64()),
                "pred_lang": pa.array(preds, type=pa.string())}
        for lang in LANG_ORDER:
            cols[f"{lang}_hits"] = pa.array(hit_cols[lang], type=pa.int64())
        return pa.table(cols)


_WS_RE = re.compile(WS_RUN_PATTERN)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint: md5 of the whitespace-collapsed, lowercased,
    trimmed text (the SQL-checkable exact fingerprint), plus winnowing
    k-gram fingerprints (Schleimer'03; no SQL analog — count + min)."""
    ids = batch.column("doc_id").to_pylist()
    # lowercase via Arrow (simple case mapping, == DuckDB lower())
    texts = pc.utf8_lower(batch.column("text")).to_pylist()
    md5s, n_win, min_win = [], [], []
    for t in texts:
        canon = _WS_RE.sub(" ", t.strip(" \t\n\r"))
        md5s.append(hashlib.md5(canon.encode("utf-8")).hexdigest())
        prints = winnow_fingerprints(canon)
        n_win.append(len(prints))
        min_win.append(f"{min(prints):016x}" if prints else "")
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "content_md5": pa.array(md5s, type=pa.string()),
            "n_winnow": pa.array(n_win, type=pa.int64()),
            "min_winnow": pa.array(min_win, type=pa.string()),
        }
    )


# --------------------------------------------------------------------------
# dataset-level entry points
# --------------------------------------------------------------------------

# OOV collection-frequency floor: a token outside the broadcast
# vocabulary (pruned by min_count, or genuinely unseen when scoring a
# different corpus) scores as if it were a singleton. Pinned here AND in
# the SQL oracle (coalesce(cf, 1)).
UNIGRAM_OOV_CF = 1.0


def unigram_logprob(docs: rd.Dataset, min_count: int = 2) -> rd.Dataset:
    """Per-doc unigram LM score: sum over tokens of ln(cf(t)/total) —
    the corpus-fit quality signal (low = off-distribution/garbage).

    Two-pass, Ray-first: pass 1 computes the corpus unigram table with a
    partial-aggregating groupby (collection frequencies); pass 2 scores
    each doc against it vectorized.

    Memory bound (the 100 TB story): only terms with cf >= ``min_count``
    enter the broadcast vocabulary, so the model holds at most
    total_tokens/min_count entries no matter how heavy-tailed the web
    vocabulary is (typos/ids/hashes are effectively unbounded otherwise —
    r1 broadcast the FULL vocab). ``total`` stays the unpruned token
    count; pruned/unseen tokens score with the pinned UNIGRAM_OOV_CF
    floor, mirrored exactly in the SQL oracle.
    """
    import ray
    from ray.data.aggregate import Sum

    def to_tokens(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column("text"))
        cleaned = pc.replace_substring_regex(lower, "[^a-z0-9]+", " ")
        lists = pc.split_pattern(cleaned, " ")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"term": flat,
                         "n": pa.array(np.ones(len(flat), np.int64))})

    cf_parts = [
        p
        for p in ray.get(
            docs.map_batches(to_tokens, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n", alias_name="cf"))
            .to_arrow_refs()
        )
        if p.num_rows  # groupby can emit schema-less empty blocks
    ]
    cf_tbl = pa.concat_tables(cf_parts) if cf_parts else pa.table(
        {"term": pa.array([], type=pa.string()),
         "cf": pa.array([], type=pa.int64())}
    )
    cf_all = cf_tbl.column("cf").to_numpy()
    total = int(cf_all.sum()) if len(cf_all) else 0
    keep = cf_all >= min_count
    cf = dict(zip(
        np.asarray(cf_tbl.column("term").to_pylist(), dtype=object)[keep],
        cf_all[keep],
    ))
    model_ref = ray.put((cf, total))

    def score(batch: pa.Table) -> pa.Table:
        model, tot = ray.get(model_ref)
        ids, lls, ns = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = tokenize(text)
            if toks:
                freqs = np.fromiter(
                    (model.get(t, UNIGRAM_OOV_CF) for t in toks),
                    dtype=np.float64, count=len(toks),
                )
                ll = float(np.log(freqs / tot).sum())
            else:
                ll = 0.0
            ids.append(doc_id)
            lls.append(round(ll, 6))
            ns.append(len(toks))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_tokens": pa.array(ns, type=pa.int64()),
             "loglik": pa.array(lls, type=pa.float64())}
        )

    return docs.map_batches(score, batch_format="pyarrow")


# interpolation weight on the bigram term (Jelinek-Mercer); pinned in
# the SQL oracle's literals
BIGRAM_LAMBDA = 0.75
BIGRAM_MIN_COUNT = 2


def bigram_logprob(
    docs: rd.Dataset,
    min_count: int = BIGRAM_MIN_COUNT,
    lam: float = BIGRAM_LAMBDA,
) -> rd.Dataset:
    """Per-doc interpolated bigram-LM score (Jelinek-Mercer):
    ll = sum over transitions (v, w) of
    ln(lam * c(v,w)/c(v.) + (1-lam) * p_uni(w)) — the next-order
    corpus-fit signal above ``unigram_logprob`` (detects scrambled /
    template text a unigram model scores as fluent).

    Memory bounds (the 100 TB story): the broadcast model keeps ONLY
    bigrams with c >= ``min_count`` (<= total_tokens/min_count entries),
    context counts ONLY for contexts of surviving bigrams (same bound),
    and the min-count-pruned unigram table with the UNIGRAM_OOV_CF
    floor — a pruned/unseen bigram contributes nothing to the first
    term (c = 0), so its context count is never consulted. All counts
    come from partial-aggregating groupbys; nothing token-sized is ever
    collected.
    """
    import ray
    from ray.data.aggregate import Sum

    def to_transitions(batch: pa.Table) -> pa.Table:
        bgs: list[str] = []
        for text in batch.column("text").to_pylist():
            toks = tokenize(text)
            bgs.extend(f"{toks[i]} {toks[i + 1]}"
                       for i in range(len(toks) - 1))
        return pa.table({"bigram": pa.array(bgs, type=pa.string()),
                         "n": pa.array(np.ones(len(bgs), np.int64))})

    def to_tokens(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column("text"))
        cleaned = pc.replace_substring_regex(lower, "[^a-z0-9]+", " ")
        flat = pc.list_flatten(pc.split_pattern(cleaned, " "))
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"term": flat,
                         "n": pa.array(np.ones(len(flat), np.int64))})

    def _collect(ds, key):
        parts = [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
        return pa.concat_tables(parts) if parts else pa.table(
            {key: pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64())}
        )

    trans = docs.map_batches(to_transitions, batch_format="pyarrow")
    # full bigram counts stay a (materialized, spillable) Dataset; the
    # driver only ever collects the PRUNED subset
    bgds = (trans.groupby("bigram")
            .aggregate(Sum("n", alias_name="c")).materialize())

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("c"), min_count))

    bg_tbl = _collect(bgds.map_batches(prune, batch_format="pyarrow"),
                      "bigram")
    bigrams = dict(zip(
        (str(b) for b in bg_tbl.column("bigram").to_pylist()),
        bg_tbl.column("c").to_numpy(),
    ))
    # context totals c(v.) — exact (summed over UNpruned bigrams),
    # retained only for contexts of surviving bigrams: a pruned/unseen
    # bigram scores its first term 0, so other contexts are never read
    need_ctx = frozenset(b.split(" ", 1)[0] for b in bigrams)
    need_ref = ray.put(need_ctx)

    def to_ctx(batch: pa.Table) -> pa.Table:
        need = ray.get(need_ref)
        vs = [b.split(" ", 1)[0]
              for b in batch.column("bigram").to_pylist()]
        mask = pa.array([v in need for v in vs])
        return pa.table(
            {"v": pa.array(vs, type=pa.string()),
             "c": batch.column("c")}
        ).filter(mask)

    ctx_tbl = _collect(
        bgds.map_batches(to_ctx, batch_format="pyarrow")
        .groupby("v").aggregate(Sum("c", alias_name="c")),
        "v",
    )
    ctx_all = dict(zip(ctx_tbl.column("v").to_pylist(),
                       ctx_tbl.column("c").to_numpy()))

    cf_tbl = _collect(
        docs.map_batches(to_tokens, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("n", alias_name="c")),
        "term",
    )
    cf_all = cf_tbl.column("c").to_numpy()
    total = int(cf_all.sum()) if len(cf_all) else 0
    ukeep = cf_all >= min_count
    cf = dict(zip(
        np.asarray(cf_tbl.column("term").to_pylist(), dtype=object)[ukeep],
        cf_all[ukeep],
    ))
    model_ref = ray.put((bigrams, ctx_all, cf, total))

    def score(batch: pa.Table) -> pa.Table:
        big, ctx, uni, tot = ray.get(model_ref)
        ids, lls, ns = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = tokenize(text)
            n_bg = max(len(toks) - 1, 0)
            ll = 0.0
            if n_bg:
                ps = np.empty(n_bg, dtype=np.float64)
                for i in range(n_bg):
                    v, w = toks[i], toks[i + 1]
                    c = big.get(f"{v} {w}")
                    first = lam * c / ctx[v] if c else 0.0
                    ps[i] = first + (1.0 - lam) * (
                        uni.get(w, UNIGRAM_OOV_CF) / tot)
                ll = float(np.log(ps).sum())
            ids.append(doc_id)
            lls.append(round(ll, 6))
            ns.append(n_bg)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_bigrams": pa.array(ns, type=pa.int64()),
             "loglik": pa.array(lls, type=pa.float64())}
        )

    return docs.map_batches(score, batch_format="pyarrow")


def regex_features_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_emails, n_urls, n_long_digit_runs, has_pii) — the
    PII-surface counts a filtering/masking stage keys on; fully
    vectorized (count_substring_regex, no row loop)."""
    text = batch.column("text")
    n_email = pc.count_substring_regex(text, EMAIL_PATTERN).cast(pa.int64())
    n_url = pc.count_substring_regex(text, URL_PATTERN).cast(pa.int64())
    n_dig = pc.count_substring_regex(
        text, LONG_DIGIT_RUN_PATTERN
    ).cast(pa.int64())
    has = pc.or_(pc.greater(n_email, 0), pc.greater(n_dig, 0))
    return pa.table(
        {"doc_id": batch.column("doc_id").cast(pa.int64()),
         "n_emails": n_email,
         "n_urls": n_url,
         "n_long_digit_runs": n_dig,
         "has_pii": has}
    )


def regex_features(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(regex_features_batch, batch_format="pyarrow")


def _doc_term_tf(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows — computed map-side (a document's term
    frequencies never need a shuffle)."""
    ids: list[int] = []
    terms: list[str] = []
    tfs: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        toks = tokenize(text)
        if not toks:
            continue
        uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                 return_counts=True)
        ids.extend([doc_id] * len(uniq))
        terms.extend(uniq.tolist())
        tfs.extend(int(c) for c in counts)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "term": pa.array(terms, type=pa.string()),
         "tf": pa.array(tfs, type=pa.int64())}
    )


def tfidf_top_terms(
    docs: rd.Dataset, k: int = 3, num_partitions: int = 8
) -> rd.Dataset:
    """Per-doc top-k terms by tf-idf (tf * ln(N/df)) — the corpus-keyword
    operator of a training-data pipeline.

    Fully distributed: map-side (doc_id, term, tf) rows, a term-keyed
    groupby for df, a hash JOIN of term rows against the df table (the
    df side is corpus-vocabulary-sized — too big to broadcast at web
    scale, exactly what Dataset.join exists for), then a per-doc
    groupby top-k. Ties pinned (tfidf DESC, term ASC).
    """
    from ray.data.aggregate import Count

    n_docs = docs.count()
    term_rows = docs.map_batches(
        _doc_term_tf, batch_format="pyarrow"
    ).materialize()
    df_tbl = term_rows.groupby("term").aggregate(Count(alias_name="df"))
    joined = term_rows.join(
        df_tbl, join_type="inner", num_partitions=num_partitions,
        on=("term",),
    )

    def topk_group(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy().astype(np.float64)
        df = group.column("df").to_numpy().astype(np.float64)
        tfidf = tf * np.log(n_docs / df)
        terms = group.column("term").to_pylist()
        order = sorted(range(len(terms)),
                       key=lambda i: (-tfidf[i], terms[i]))[:k]
        return pa.table(
            {"doc_id": group.column("doc_id").take(pa.array(order)),
             "rank": pa.array(range(1, len(order) + 1), type=pa.int64()),
             "term": pa.array([terms[i] for i in order], type=pa.string()),
             "tf": group.column("tf").take(pa.array(order)),
             "df": group.column("df").take(pa.array(order)),
             "tfidf": pa.array([_r6(float(tfidf[i])) for i in order],
                               type=pa.float64())}
        )

    return joined.groupby("doc_id").map_groups(
        topk_group, batch_format="pyarrow"
    )


HASHED_TFIDF_DIM = 64


def hashed_tfidf(
    docs: rd.Dataset, dim: int = HASHED_TFIDF_DIM, num_partitions: int = 8,
    dense: bool = False, round6: bool = False,
) -> rd.Dataset:
    """Hashing-trick tf-idf document featurizer: every doc becomes an
    L2-normalized ``dim``-dimensional sparse vector,
    bucket(term) = md5-low64(term) % dim, value = sum of tf * ln(N/df)
    over the bucket's terms — the classic no-vocabulary featurizer
    (Weinberger et al., ICML'09) that turns raw text into an embedding
    column the ANN / SemDeDup / cluster operators can consume.

    Output is LONG form (doc_id, bucket, value) with zero buckets
    omitted — schema-stable at any ``dim``, joins cheaply, and the SQL
    oracle mirrors it row for row (md5_number_lower % dim, window L2).
    Same distribution shape as tfidf_top_terms: map-side (doc, term,
    tf) rows, vocab-sized df table JOINED not broadcast, per-doc
    normalize in one groupby."""
    from ray.data.aggregate import Count

    from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64

    n_docs = docs.count()
    term_rows = docs.map_batches(
        _doc_term_tf, batch_format="pyarrow"
    ).materialize()
    df_tbl = term_rows.groupby("term").aggregate(Count(alias_name="df"))
    joined = term_rows.join(
        df_tbl, join_type="inner", num_partitions=num_partitions,
        on=("term",),
    )

    def vec_group(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy().astype(np.float64)
        df = group.column("df").to_numpy().astype(np.float64)
        w = tf * np.log(n_docs / df)
        buckets = np.fromiter(
            (md5_hash64(t) % dim for t in group.column("term").to_pylist()),
            dtype=np.int64, count=group.num_rows,
        )
        acc = np.zeros(dim, dtype=np.float64)
        np.add.at(acc, buckets, w)
        norm = float(np.sqrt((acc * acc).sum()))
        if norm > 0.0:
            acc = acc / norm
        doc_id = group.column("doc_id")[0].as_py()
        if dense:
            # one (doc_id, embedding) row — the shape the ANN / near-dup
            # / SemDeDup family consumes. round6=True emits the SAME
            # half-away-rounded values as the long form, so a dense dot
            # product equals the long form's bucket-join cosine exactly
            # (the hybrid IVF leg's oracle-equivalence relies on this)
            vec = _r6_arr(acc) if round6 else acc
            return pa.table(
                {"doc_id": pa.array([doc_id], type=pa.int64()),
                 "embedding": pa.array([vec.tolist()],
                                       type=pa.list_(pa.float64()))}
            )
        nz = np.flatnonzero(acc)
        return pa.table(
            {"doc_id": pa.array(np.full(len(nz), doc_id), type=pa.int64()),
             "bucket": pa.array(nz, type=pa.int64()),
             "value": pa.array([_r6(float(acc[i])) for i in nz],
                               type=pa.float64())}
        )

    return joined.groupby("doc_id").map_groups(
        vec_group, batch_format="pyarrow"
    )


def _bigram_rows(batch: pa.Table) -> pa.Table:
    return _pair_rows(batch, 1)


def _pair_rows(batch: pa.Table, window: int) -> pa.Table:
    """Ordered token pairs at distance 1..window ("a b" strings;
    distances collapse into one count). window=1 == adjacent bigrams."""
    ids: list[str] = []
    for text in batch.column("text").to_pylist():
        toks = tokenize(text)
        for d in range(1, window + 1):
            ids.extend(f"{a} {b}" for a, b in zip(toks, toks[d:]))
    return pa.table({"bigram": pa.array(ids, type=pa.string())})


def _unigram_rows(batch: pa.Table) -> pa.Table:
    lower = pc.utf8_lower(batch.column("text"))
    cleaned = pc.replace_substring_regex(lower, "[^a-z0-9]+", " ")
    flat = pc.list_flatten(pc.split_pattern(cleaned, " "))
    flat = flat.filter(pc.not_equal(flat, ""))
    return pa.table({"term": flat})


def collocations_pmi(
    docs: rd.Dataset, min_count: int = 5, k: int = 20,
    num_partitions: int = 8, window: int = 1,
) -> pa.Table:
    """Top-k bigram collocations by pointwise mutual information:
    pmi = ln( (c_xy / T_bigrams) / ((c_x / T_uni) * (c_y / T_uni)) ),
    bigrams with c_xy < min_count dropped (MLE PMI is noise at low
    counts). Ties pinned (pmi DESC, bigram ASC); pmi rounded 6 dp.

    Distributed shape: map-side bigram/unigram emission, two count
    groupbys, the (frequent-)bigram table hash-JOINED against the
    unigram counts on each constituent word — the marginal table is
    vocabulary-sized, so it is joined, not broadcast."""
    from ray.data.aggregate import Count, Sum

    big = docs.map_batches(lambda b: _pair_rows(b, window),
                           batch_format="pyarrow")
    uni = docs.map_batches(_unigram_rows, batch_format="pyarrow")
    bcnt = big.groupby("bigram").aggregate(
        Count(alias_name="c_xy")
    ).materialize()
    ucnt = uni.groupby("term").aggregate(Count(alias_name="c")).materialize()
    # totals from the (materialized) count tables — summing them is a
    # tiny aggregate; a .count() on uni/big would re-execute the whole
    # token/bigram emission pass
    t_uni = int((ucnt.aggregate(Sum("c")) or {}).get("sum(c)") or 0)
    t_big = int((bcnt.aggregate(Sum("c_xy")) or {}).get("sum(c_xy)") or 0)

    def frequent_and_split(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("c_xy"), min_count))
        parts = pc.split_pattern(t.column("bigram"), " ")
        return t.append_column(
            "w1", pc.list_element(parts, 0)
        ).append_column("w2", pc.list_element(parts, 1))

    freq = bcnt.map_batches(frequent_and_split, batch_format="pyarrow")
    j1 = freq.join(
        ucnt, join_type="inner", num_partitions=num_partitions,
        on=("w1",), right_on=("term",), right_suffix="_w1",
    ).rename_columns({"c": "c_x"})
    j2 = j1.join(
        ucnt, join_type="inner", num_partitions=num_partitions,
        on=("w2",), right_on=("term",), right_suffix="_w2",
    ).rename_columns({"c": "c_y"})

    def pmi_batch(t: pa.Table) -> pa.Table:
        cxy = t.column("c_xy").to_numpy().astype(np.float64)
        cx = t.column("c_x").to_numpy().astype(np.float64)
        cy = t.column("c_y").to_numpy().astype(np.float64)
        pmi = np.log((cxy * t_uni * t_uni) / (t_big * cx * cy))
        # RAW pmi here: the top-k ordering must use the unrounded value
        # (the SQL oracle ranks on pmi_raw); rounding happens on output
        return pa.table(
            {"bigram": t.column("bigram"),
             "c_xy": t.column("c_xy"),
             "pmi_raw": pa.array(pmi, type=pa.float64())}
        )

    import ray

    raw_schema = pa.schema([("bigram", pa.string()), ("c_xy", pa.int64()),
                            ("pmi_raw", pa.float64())])
    out_schema = pa.schema([("bigram", pa.string()), ("c_xy", pa.int64()),
                            ("pmi", pa.float64())])
    _SORT = [("pmi_raw", "descending"), ("bigram", "ascending")]

    def topk_block(t: pa.Table) -> pa.Table:
        # per-block partial top-k: the frequent-bigram table is
        # vocabulary²-bounded, not k-bounded, so the driver must only
        # ever see k rows per block. np.partition prunes to the pmi
        # threshold first (>= keeps every boundary tie, so the true
        # top-k under the full (pmi DESC, bigram ASC) order survives),
        # then one vectorized Arrow multi-key sort finishes the block.
        if t.num_rows == 0:
            return raw_schema.empty_table()
        t = t.select(raw_schema.names).cast(raw_schema)
        n = t.num_rows
        if n > 4 * k:
            pmi = t.column("pmi_raw").to_numpy()
            thr = np.partition(pmi, n - k)[n - k]
            t = t.filter(pc.greater_equal(t.column("pmi_raw"), thr))
        idx = pc.sort_indices(t, sort_keys=_SORT)
        return t.take(idx[:k])

    partial = j2.map_batches(pmi_batch, batch_format="pyarrow").map_batches(
        topk_block, batch_format="pyarrow")
    scored_parts = [p for p in ray.get(partial.to_arrow_refs()) if p.num_rows]
    if not scored_parts:
        return out_schema.empty_table()
    # driver merge is k×blocks rows, never the scored table itself
    scored = pa.concat_tables(
        [p.select(raw_schema.names).cast(raw_schema) for p in scored_parts]
    )
    top = scored.take(pc.sort_indices(scored, sort_keys=_SORT)[:k])
    return pa.table(
        {"bigram": top.column("bigram"),
         "c_xy": top.column("c_xy"),
         "pmi": pa.array([_r6(x.as_py()) for x in top.column("pmi_raw")],
                         type=pa.float64()),
         "rank": pa.array(range(1, top.num_rows + 1), type=pa.int64())}
    )




def doc_stats(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(doc_stats_batch, batch_format="pyarrow")


def token_class_counts(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(token_class_counts_batch, batch_format="pyarrow")


def quality(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def lang_id(docs: rd.Dataset) -> rd.Dataset:
    # instance (task pool): the stopword frozensets are tiny; actor-pool
    # startup would dominate at any batch count
    return docs.map_batches(LangIdStage(), batch_format="pyarrow")


def fingerprints(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


def gopher_repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals from the Gopher/MassiveText filter
    family (Rae et al. 2021 §A1.1), emitted as INTEGER numerators/
    denominators (a filter stage derives the ratios; integers keep the
    distributed result bit-identical to the SQL oracle):

    - line_chars / dup_line_chars: total bytes across lines vs bytes in
      lines whose exact text occurs more than once (every occurrence
      counted) — the "fraction of chars in duplicate lines" rule.
    - n_ellipsis_lines: lines ending in "..." (boilerplate signal).
    - top_bigram_count: occurrences of the most frequent word bigram —
      the "fraction of chars in most common n-gram" rule's numerator.

    Map-side only: every signal is per-document, so the whole operator
    is one streaming map_batches — no shuffle at any corpus size."""
    from collections import Counter

    out = {k: [] for k in ("doc_id", "n_lines", "line_chars",
                           "dup_line_chars", "n_ellipsis_lines",
                           "top_bigram_count")}
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        lines = text.split("\n")
        cnt = Counter(lines)
        out["doc_id"].append(doc_id)
        out["n_lines"].append(len(lines))
        out["line_chars"].append(sum(len(l.encode()) for l in lines))
        out["dup_line_chars"].append(
            sum(len(l.encode()) for l in lines if cnt[l] > 1)
        )
        out["n_ellipsis_lines"].append(
            sum(1 for l in lines if l.endswith("..."))
        )
        toks = tokenize(text)
        bg = Counter(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
        out["top_bigram_count"].append(max(bg.values()) if bg else 0)
    return pa.table(
        {k: pa.array(v, type=pa.int64()) for k, v in out.items()}
    )


def gopher_repetition(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(gopher_repetition_batch, batch_format="pyarrow")


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_emails, n_long_digit_runs, redacted_md5): emails then
    long digit runs replaced with [EMAIL] / [NUM] placeholders, fully
    vectorized (Arrow RE2 kernels — the same regex engine DuckDB's
    regexp_replace uses, so the oracle md5-matches the redacted text).
    Email replacement runs FIRST: an email's local/domain parts may
    contain digit runs, and the order is part of the contract."""
    text = batch.column("text")
    n_email = pc.count_substring_regex(text, EMAIL_PATTERN).cast(pa.int64())
    n_dig = pc.count_substring_regex(
        text, LONG_DIGIT_RUN_PATTERN
    ).cast(pa.int64())
    red = pc.replace_substring_regex(text, EMAIL_PATTERN, "[EMAIL]")
    red = pc.replace_substring_regex(red, LONG_DIGIT_RUN_PATTERN, "[NUM]")
    md5 = [hashlib.md5(t.encode()).hexdigest() for t in red.to_pylist()]
    return pa.table(
        {"doc_id": batch.column("doc_id").cast(pa.int64()),
         "n_emails": n_email,
         "n_long_digit_runs": n_dig,
         "redacted_md5": pa.array(md5, type=pa.string())}
    )


def pii_redact(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(pii_redact_batch, batch_format="pyarrow")


def dedup_lines_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_lines_in, n_lines_kept, cleaned_md5): duplicate lines
    removed keeping the FIRST occurrence — the fix-up counterpart of
    ``gopher_repetition``'s duplicate-line measurement. Compared by md5
    of the cleaned text (the same convention as ``normalize``/
    ``pii_redact``); map-side only, no shuffle."""
    ids, n_in, n_kept, md5s = [], [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        lines = text.split("\n")
        seen: dict[str, None] = {}
        for l in lines:
            seen.setdefault(l)
        cleaned = "\n".join(seen)
        ids.append(doc_id)
        n_in.append(len(lines))
        n_kept.append(len(seen))
        md5s.append(hashlib.md5(cleaned.encode()).hexdigest())
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "n_lines_in": pa.array(n_in, type=pa.int64()),
         "n_lines_kept": pa.array(n_kept, type=pa.int64()),
         "cleaned_md5": pa.array(md5s, type=pa.string())}
    )


def dedup_lines(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(dedup_lines_batch, batch_format="pyarrow")


class QualityFilterStage:
    """C4/Gopher-style composed keep filter — the operators above wired
    into one verdict, the way a production curation pipeline actually
    runs them (one fused pass over the text, not three jobs):

    keep = is_quality (M5 doc-level rule)
         AND pred_lang != 'und' (any stopword evidence)
         AND dup_line_chars * 2 <= line_chars (< half of bytes in
             repeated lines — Gopher A1.1)
         AND top_bigram_count * 10 <= n_tokens (top bigram < 10% of
             tokens)

    All conditions are integer/exact, so the composition carries a SQL
    oracle. Actor-pool stage: the stopword automata live in __init__.
    Output: (doc_id, n_tokens, pred_lang) for kept docs."""

    def __init__(self):
        self._lang = LangIdStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        g = gopher_repetition_batch(batch)
        lang = self._lang(batch)
        keep = pc.and_(
            pc.and_(
                q.column("is_quality"),
                pc.not_equal(lang.column("pred_lang"), "und"),
            ),
            pc.and_(
                pc.less_equal(
                    pc.multiply(g.column("dup_line_chars"), 2),
                    g.column("line_chars"),
                ),
                pc.less_equal(
                    pc.multiply(g.column("top_bigram_count"), 10),
                    q.column("n_tokens"),
                ),
            ),
        )
        out = pa.table(
            {"doc_id": q.column("doc_id"),
             "n_tokens": q.column("n_tokens"),
             "pred_lang": lang.column("pred_lang")}
        )
        return out.filter(keep)


def quality_filter_apply(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(
        QualityFilterStage, batch_format="pyarrow", concurrency=(1, 8)
    )


class CurationReportStage:
    """Per-batch PARTIAL per-source curation tallies (the map-side
    combiner for ``curation_report``): one row per source seen in the
    batch with doc/kept/token sums. The downstream groupby then moves
    |sources| x |batches| rows instead of one row per document — the
    pre-aggregate-before-shuffle rule."""

    def __init__(self):
        self._filter = QualityFilterStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kept = self._filter(batch)
        kept_ids = set(kept.column("doc_id").to_pylist())
        kept_tokens = dict(zip(kept.column("doc_id").to_pylist(),
                               kept.column("n_tokens").to_pylist()))
        agg: dict[str, list[int]] = {}
        for doc_id, source in zip(batch.column("doc_id").to_pylist(),
                                  batch.column("source").to_pylist()):
            a = agg.setdefault(source, [0, 0, 0])
            a[0] += 1
            if doc_id in kept_ids:
                a[1] += 1
                a[2] += kept_tokens[doc_id]
        # NULL source is an ordinary group (matches SQL GROUP BY); a
        # plain sorted() would raise on None-vs-str comparison
        sources = sorted((s for s in agg if s is not None))
        if None in agg:
            sources.append(None)
        return pa.table(
            {"source": pa.array(sources, type=pa.string()),
             "n_docs": pa.array([agg[s][0] for s in sources],
                                type=pa.int64()),
             "n_kept": pa.array([agg[s][1] for s in sources],
                                type=pa.int64()),
             "kept_tokens": pa.array([agg[s][2] for s in sources],
                                     type=pa.int64())}
        )


def curation_report(docs: rd.Dataset) -> rd.Dataset:
    """(source, n_docs, n_kept, kept_tokens): the curation summary a
    data team ships — quality_filter verdicts rolled up per source.
    Map-side partials (CurationReportStage) then a |sources|-keyed
    groupby; the corpus never shuffles."""
    from ray.data.aggregate import Sum

    partial = docs.map_batches(
        CurationReportStage, batch_format="pyarrow", concurrency=(1, 8)
    )
    return partial.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_kept", alias_name="n_kept"),
        Sum("kept_tokens", alias_name="kept_tokens"),
    )


LENGTH_OUTLIER_LO_Q = 0.05
LENGTH_OUTLIER_HI_Q = 0.95


def length_outlier_filter(
    docs: rd.Dataset,
    lo_q: float = LENGTH_OUTLIER_LO_Q,
    hi_q: float = LENGTH_OUTLIER_HI_Q,
    group_col: str = "source",
) -> rd.Dataset:
    """Distribution-based length filter: flag docs whose n_chars falls
    outside the [lo_q, hi_q] quantile band OF THEIR OWN source — the
    per-domain outlier clip real curation recipes apply (absolute
    thresholds misfire when sources have different length regimes).

    Quantiles use the pinned DuckDB quantile_disc convention (sorted
    element at ceil(q*n)-1, exact data values, no interpolation). Two
    cheap passes: a |sources|-sized bounds table from one group-quantile
    shuffle over (source, n_chars) ONLY (columns pruned at the read),
    broadcast into a map-side flagging pass. Output keeps every row with
    a boolean ``keep`` so downstream chooses flag-vs-drop."""
    import math

    import ray

    def group_bounds(group: pa.Table) -> pa.Table:
        vals = np.sort(group.column("n_chars").to_numpy(
            zero_copy_only=False))
        n = len(vals)
        lo = int(vals[max(int(math.ceil(lo_q * n)) - 1, 0)])
        hi = int(vals[max(int(math.ceil(hi_q * n)) - 1, 0)])
        return pa.table(
            {group_col: pa.array([group.column(group_col)[0].as_py()]),
             "lo": pa.array([lo], type=pa.int64()),
             "hi": pa.array([hi], type=pa.int64())}
        )

    bounds_parts = [
        p for p in ray.get(
            docs.select_columns([group_col, "n_chars"])
            .groupby(group_col)
            .map_groups(group_bounds, batch_format="pyarrow")
            .to_arrow_refs()
        ) if p.num_rows
    ]
    bounds: dict[str, tuple[int, int]] = {}
    for p in bounds_parts:
        for r in p.to_pylist():
            bounds[r[group_col]] = (r["lo"], r["hi"])
    b_ref = ray.put(bounds)

    def flag(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        n = batch.column("n_chars").to_numpy()
        keeps = []
        for src, nc in zip(batch.column(group_col).to_pylist(), n):
            lo, hi = b[src]
            keeps.append(bool(lo <= nc <= hi))
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             group_col: batch.column(group_col),
             "n_chars": batch.column("n_chars").cast(pa.int64()),
             "keep": pa.array(keeps, type=pa.bool_())}
        )

    return docs.select_columns(["doc_id", group_col, "n_chars"]) \
        .map_batches(flag, batch_format="pyarrow")


def source_token_kl(docs: rd.Dataset, num_partitions: int = 8) -> rd.Dataset:
    """Token-distribution drift per source: KL(source || corpus) =
    sum_t p_s(t) * ln(p_s(t) / p_c(t)) over the source's observed
    terms — the "is this domain's language off-distribution" curation
    signal (high KL = jargon/spam/templated source).

    Exact and fully distributed: (source, term) counts from one
    partial-aggregating groupby, corpus term totals derived by a second
    groupby over THAT table (never re-tokenizing), the vocab-sized term
    totals JOINED back (not broadcast); only the |sources|-sized totals
    table is collected/broadcast. Output (source, n_tokens, kl)."""
    import ray
    from ray.data.aggregate import Sum

    def to_rows(batch: pa.Table) -> pa.Table:
        srcs: list[str] = []
        terms: list[str] = []
        for src, text in zip(batch.column("source").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = tokenize(text)
            srcs.extend([src] * len(toks))
            terms.extend(toks)
        return pa.table({"source": pa.array(srcs, type=pa.string()),
                         "term": pa.array(terms, type=pa.string()),
                         "n": pa.array(np.ones(len(terms), np.int64))})

    st = (docs.select_columns(["source", "text"])
          .map_batches(to_rows, batch_format="pyarrow")
          .groupby(["source", "term"])
          .aggregate(Sum("n", alias_name="c"))
          .materialize())
    term_tot = st.groupby("term").aggregate(Sum("c", alias_name="ct"))
    src_parts = [
        p for p in ray.get(
            st.groupby("source").aggregate(Sum("c", alias_name="cs"))
            .to_arrow_refs()
        ) if p.num_rows
    ]
    src_tot = {r["source"]: int(r["cs"])
               for p in src_parts for r in p.to_pylist()}
    total = sum(src_tot.values())
    tot_ref = ray.put((src_tot, total))

    joined = st.join(term_tot.materialize(), "inner", num_partitions,
                     on=("term",))

    def partial_kl(batch: pa.Table) -> pa.Table:
        s_tot, tot = ray.get(tot_ref)
        srcs = batch.column("source").to_pylist()
        c = batch.column("c").to_numpy().astype(np.float64)
        ct = batch.column("ct").to_numpy().astype(np.float64)
        cs = np.fromiter((s_tot[s] for s in srcs), dtype=np.float64,
                         count=len(srcs))
        contrib = (c / cs) * np.log((c / cs) / (ct / tot))
        return pa.table(
            {"source": batch.column("source"),
             "kl_part": pa.array(contrib, type=pa.float64()),
             "n_part": batch.column("c")}
        )

    agg = (joined.map_batches(partial_kl, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("kl_part", alias_name="kl_raw"),
                      Sum("n_part", alias_name="n_tokens")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"source": batch.column("source"),
             "n_tokens": batch.column("n_tokens").cast(pa.int64()),
             "kl": pa.array(
                 [_r6(float(v)) for v in
                  batch.column("kl_raw").to_pylist()],
                 type=pa.float64())}
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def lang_confusion(docs: rd.Dataset) -> rd.Dataset:
    """Language-ID evaluation: confusion matrix of predicted vs
    LABELED language — the eval every classifier stage needs before it
    gates a corpus. One fused pass (LangIdStage's argmax per doc, then
    an in-batch (label, pred) partial count) so the exchange is at most
    |langs|^2 rows per block; a tiny grouped sum finishes."""
    from ray.data.aggregate import Sum

    stage = LangIdStage()

    def partial(batch: pa.Table) -> pa.Table:
        pred = stage(batch)
        t = pa.table({
            "lang": batch.column("lang"),
            "pred_lang": pred.column("pred_lang"),
        })
        return (
            t.group_by(["lang", "pred_lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "pred_lang", "n"])
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .map_batches(
            lambda t: pa.table({
                "lang": t.column("lang"),
                "pred_lang": t.column("pred_lang"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def _source_term_rows(batch: pa.Table) -> pa.Table:
    """(source, text) batch -> batch-distinct (source, term) rows."""
    out_s, out_t = [], []
    seen = set()
    for src, text in zip(batch.column("source").to_pylist(),
                         batch.column("text").to_pylist()):
        for tok in set(tokenize(text)):
            if (src, tok) not in seen:
                seen.add((src, tok))
                out_s.append(src)
                out_t.append(tok)
    return pa.table({
        "source": pa.array(out_s, type=pa.string()),
        "term": pa.array(out_t, type=pa.string()),
    })


def _spill_parquet(ds: rd.Dataset, prefix: str) -> rd.Dataset:
    """Execute ``ds`` once into node-local parquet scratch and hand back
    a lazy re-read. Unlike ``.materialize()`` the result does NOT occupy
    the object store between consumers — a corpus-sized intermediate
    that two downstream legs both need costs disk/tmpfs, not plasma, and
    each leg streams it back with normal backpressure. (On a multi-node
    cluster point $SPSE_SCRATCH at shared storage; everything written
    here is derivable scratch.)

    Spill dirs are deleted at process exit (atexit): per-call mkdtemp
    with no cleanup would leak a corpus-sized parquet copy per
    invocation — on a tmpfs scratch that is leaked RAM. They cannot be
    deleted eagerly because the returned Dataset re-reads the files
    lazily, possibly long after this call returns."""
    import atexit
    import shutil as _shutil
    import tempfile

    from semantic_pdf_search_engine_ray.config import scratch_root

    out = tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
    atexit.register(_shutil.rmtree, out, ignore_errors=True)
    ds.write_parquet(out)
    return rd.read_parquet(out)


def source_vocab_overlap(docs: rd.Dataset) -> rd.Dataset:
    """Pairwise vocabulary Jaccard between sources — the corpus-level
    similarity matrix used to spot near-duplicate crawls / mirrored
    domains before mixing weights are chosen.

    Plan: distinct (source, term) pairs via one groupby (the only
    corpus-sized exchange); the pair table then self-joins ON TERM
    (vocabulary-sized, not corpus-sized) with the ordered-pair filter
    applied post-join; |sources|^2 intersection counts and |sources|
    vocab sizes are tiny and combine on the driver. Jaccard =
    inter / (|A| + |B| - inter): exact integers + one float division
    (identical expression in SQL).

    ALL-PAIRS form: a term present in s sources emits s^2 join rows, so
    this is the conformance-scale oracle shape. At web scale (thousands
    of sources all sharing head terms) use
    :func:`source_vocab_overlap_thresholded`, whose prefix filter bounds
    the join while staying exact for every pair above the threshold."""
    from ray.data.aggregate import Count as AggCount

    st = (
        docs.map_batches(_source_term_rows, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(AggCount(alias_name="_n"))
        .select_columns(["source", "term"])
        .materialize()
    )
    sizes = {
        r["source"]: int(r["n"]) for r in
        st.groupby("source").aggregate(
            AggCount(alias_name="n")).take_all()
    }

    inter = (
        st.join(st, "inner", 8, on=("term",), right_on=("term",),
                right_suffix="_r")
        .map_batches(
            lambda t: t.filter(
                pa.compute.less(t.column("source"),
                                t.column("source_r"))),
            batch_format="pyarrow",
        )
        .groupby(["source", "source_r"])
        .aggregate(AggCount(alias_name="n_common"))
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t.column("source").to_pylist()
        b = t.column("source_r").to_pylist()
        n = t.column("n_common").to_numpy().astype(np.int64)
        jac = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            jac[i] = n[i] * 1.0 / (sizes[x] + sizes[y] - int(n[i]))
        jac_r = np.copysign(np.floor(np.abs(jac) * 1e6 + 0.5), jac) / 1e6
        return pa.table({
            "source_a": pa.array(a, type=pa.string()),
            "source_b": pa.array(b, type=pa.string()),
            "n_common": pa.array(n),
            "jaccard_r": pa.array(jac_r, type=pa.float64()),
        })

    return inter.map_batches(finish, batch_format="pyarrow")


def source_vocab_overlap_thresholded(
    docs: rd.Dataset,
    threshold: float = 0.5,
    num_partitions: int = 8,
    stats: dict | None = None,
) -> rd.Dataset:
    """Pairwise source vocabulary Jaccard RESTRICTED to pairs with
    J >= threshold — the scale path for :func:`source_vocab_overlap`.

    The all-pairs form self-joins the distinct (source, term) table on
    term, so a head term present in s sources emits s^2 rows: total work
    is sum_t df(t)^2, which at web scale (every source contains 'the')
    degenerates to |vocab| x |sources|^2. This variant bounds candidate
    generation with PREFIX FILTERING (SSJoin, Chaudhuri et al. ICDE'06;
    PPJoin, Xiao et al. WWW'08) — EXACT, unlike a MinHash screen: no
    missed-pair probability, so the SQL oracle (same expression + WHERE)
    mirrors it value-for-value.

      Order the vocabulary globally by (df ASC, term ASC) — rare first.
      A source with n terms keeps only its first  n - ceil(t*n) + 1
      terms under that order as its PREFIX. If J(A,B) >= t, B must hit
      A's prefix: missing all of it leaves |A ∩ B| <= ceil(t|A|) - 1
      < t|A| <= t|A ∪ B|, a contradiction. So every qualifying pair
      shares a prefix term of BOTH sides, and prefixes are rare-first,
      so per-term join fan-out is small by construction.

    Stages (driver holds only the |sources|-sized size dict):
      distinct (source,term)  [spilled to scratch parquet — read by the
      df leg, the prefix leg and the verify leg without pinning the
      object store]
      -> per-term df -> join back -> per-source prefix
         (groupby(source).map_groups: sort by (df, term), take p)
      -> prefix self-join on term = candidate pairs (+ size filter:
         J >= t forces t*|B| <= |A| <= |B|/t)
      -> the candidate SOURCE set restricts the exact verification
         self-join; per-pair groupby = exact n_common
      -> J >= t filter (exact n/(|A|+|B|-n), identical in SQL).
    Recall is exact (every J>=t pair reaches verification); precision is
    restored by the final filter. Candidate volume scales with similar
    pairs, not sources^2 — evidenced by tools/vocab_overlap_soak.py."""
    import math

    from ray.data.aggregate import Count as AggCount

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1] for the prefix "
                         "filter; use source_vocab_overlap for all pairs")

    st = _spill_parquet(
        docs.map_batches(_source_term_rows, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(AggCount(alias_name="_n"))
        .select_columns(["source", "term"]),
        "spse_vocab_st_",
    )
    sizes = {
        r["source"]: int(r["n"]) for r in
        st.groupby("source").aggregate(
            AggCount(alias_name="n")).take_all()
    }

    dfagg = st.groupby("term").aggregate(AggCount(alias_name="df"))

    def prefix_group(g: pa.Table) -> pa.Table:
        n = g.num_rows
        p = n - math.ceil(threshold * n) + 1
        idx = pc.sort_indices(
            g, sort_keys=[("df", "ascending"), ("term", "ascending")])
        return g.take(idx[:p]).select(["source", "term"])

    # spilled: Ray Data has no common-subexpression elimination, so the
    # self-join below would otherwise execute this whole chain (df
    # aggregate over st + join + per-source sort) once PER SIDE
    pref = _spill_parquet(
        st.join(dfagg, "inner", num_partitions, on=("term",),
                right_on=("term",), right_suffix="_r")
        .groupby("source")
        .map_groups(prefix_group, batch_format="pyarrow"),
        "spse_vocab_pref_",
    )

    def cand_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("source"), t.column("source_r")))
        if t.num_rows == 0:
            return t.select(["source", "source_r"])
        # size filter: J >= t needs min(|A|,|B|) >= t * max(|A|,|B|)
        na = np.array([sizes[s] for s in
                       t.column("source").to_pylist()], dtype=np.float64)
        nb = np.array([sizes[s] for s in
                       t.column("source_r").to_pylist()], dtype=np.float64)
        ok = np.minimum(na, nb) >= threshold * np.maximum(na, nb)
        return t.filter(pa.array(ok)).select(["source", "source_r"])

    cand = (
        pref.join(pref, "inner", num_partitions, on=("term",),
                  right_on=("term",), right_suffix="_r")
        .map_batches(cand_filter, batch_format="pyarrow")
        .groupby(["source", "source_r"])
        .aggregate(AggCount(alias_name="_nb"))
    )

    # candidate SOURCE set (<= |sources|, driver already holds `sizes`)
    cand_sources: set[str] = set()
    n_cand_pairs = 0
    import ray as _ray

    for part in _ray.get(cand.select_columns(["source", "source_r"])
                         .to_arrow_refs()):
        if part.num_rows:
            n_cand_pairs += part.num_rows
            cand_sources.update(part.column("source").to_pylist())
            cand_sources.update(part.column("source_r").to_pylist())
    if stats is not None:
        stats["n_candidate_pairs"] = n_cand_pairs
        stats["n_candidate_sources"] = len(cand_sources)
        stats["n_sources"] = len(sizes)
    if not cand_sources:
        return rd.from_arrow(pa.table({
            "source_a": pa.array([], type=pa.string()),
            "source_b": pa.array([], type=pa.string()),
            "n_common": pa.array([], type=pa.int64()),
            "jaccard_r": pa.array([], type=pa.float64()),
        }))

    cand_arr = pa.array(sorted(cand_sources), type=pa.string())

    def restrict(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t.column("source"), value_set=cand_arr))

    stc = st.map_batches(restrict, batch_format="pyarrow")
    inter = (
        stc.join(stc, "inner", num_partitions, on=("term",),
                 right_on=("term",), right_suffix="_r")
        .map_batches(
            lambda t: t.filter(
                pc.less(t.column("source"), t.column("source_r"))),
            batch_format="pyarrow",
        )
        .groupby(["source", "source_r"])
        .aggregate(AggCount(alias_name="n_common"))
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t.column("source").to_pylist()
        b = t.column("source_r").to_pylist()
        n = t.column("n_common").to_numpy().astype(np.int64)
        jac = np.empty(len(a), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a, b)):
            jac[i] = n[i] * 1.0 / (sizes[x] + sizes[y] - int(n[i]))
        keep = jac >= threshold  # exact value, identical WHERE in SQL
        jac_r = np.copysign(np.floor(np.abs(jac) * 1e6 + 0.5), jac) / 1e6
        out = pa.table({
            "source_a": pa.array(a, type=pa.string()),
            "source_b": pa.array(b, type=pa.string()),
            "n_common": pa.array(n),
            "jaccard_r": pa.array(jac_r, type=pa.float64()),
        })
        return out.filter(pa.array(keep))

    return inter.map_batches(finish, batch_format="pyarrow")


def ngram_novelty(docs: rd.Dataset, n: int = 3) -> rd.Dataset:
    """Per-doc novelty: the fraction of its DISTINCT word n-grams that
    appear in no other document — high novelty separates original
    content from boilerplate/templated text (the inverse signal of the
    dedup family, useful as a curation feature).

    Plan: distinct (n-gram, doc) rows -> per-n-gram doc-frequency via
    one hash groupby (map-side combine) -> the df table joins BACK to
    the per-doc rows on the n-gram key (both sides shingle-keyed; this
    is the honest corpus-sized exchange and is exactly
    ``ngram_jaccard``'s physical shape) -> per-doc unique/total counts.
    Output: (doc_id, n_shingles, n_unique, novelty_r)."""
    from ray.data.aggregate import Count as AggCount, Sum as AggSum

    from semantic_pdf_search_engine_ray.functions.shingle import (
        word_ngram_strings,
    )

    def shingle_rows(batch: pa.Table) -> pa.Table:
        out_d, out_g = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for g in set(word_ngram_strings(t, n)):
                out_d.append(d)
                out_g.append(g)
        return pa.table({
            "doc_id": pa.array(out_d, type=pa.int64()),
            "g": pa.array(out_g, type=pa.string()),
        })

    # the corpus-sized shingle table is consumed TWICE (df leg + join
    # left side): spill it to scratch parquet instead of materialize()
    # so it never pins the object store; each leg streams it back.
    rows = _spill_parquet(
        docs.map_batches(shingle_rows, batch_format="pyarrow"),
        "spse_novelty_rows_",
    )
    df = rows.groupby("g").aggregate(AggCount(alias_name="df"))
    joined = rows.join(
        df, "inner", 8, on=("g",), right_on=("g",),
        right_suffix="_r",
    )

    def mark(t: pa.Table) -> pa.Table:
        dfv = t.column("df").to_numpy()
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "one": pa.array(np.ones(len(t), dtype=np.int64)),
            "uniq": pa.array((dfv == 1).astype(np.int64)),
        })

    agg = (
        joined.map_batches(mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(AggSum("one", alias_name="n_shingles"),
                   AggSum("uniq", alias_name="n_unique"))
    )

    def finish(t: pa.Table) -> pa.Table:
        ns = t.column("n_shingles").to_numpy().astype(np.int64)
        nu = t.column("n_unique").to_numpy().astype(np.int64)
        nov = nu * 1.0 / ns
        nov_r = np.copysign(np.floor(np.abs(nov) * 1e6 + 0.5), nov) / 1e6
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_shingles": pa.array(ns),
            "n_unique": pa.array(nu),
            "novelty_r": pa.array(nov_r, type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def token_entropy(docs: rd.Dataset) -> rd.Dataset:
    """Per-doc Shannon entropy of the token distribution (nats) — the
    lexical-diversity feature (low entropy flags repetitive/templated
    text, complementing the Gopher repetition signals). Map-side only:
    each doc's term counts live within its own batch; no shuffle.
    H = ln(n) - (sum tf*ln(tf)) / n, computed with that exact
    expression on both engines (per-term products summed once)."""

    def ent(batch: pa.Table) -> pa.Table:
        import math

        ids = batch.column("doc_id").to_pylist()
        out_n, out_h = [], []
        for t in batch.column("text").to_pylist():
            toks = tokenize(t)
            n = len(toks)
            if n == 0:
                out_n.append(0)
                out_h.append(0.0)
                continue
            counts: dict[str, int] = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            s = sum(c * math.log(c) for c in counts.values())
            h = math.log(n) - s / n
            out_h.append(math.copysign(
                math.floor(abs(h) * 1e6 + 0.5), h) / 1e6)
            out_n.append(n)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(out_n, type=pa.int64()),
            "entropy_r": pa.array(out_h, type=pa.float64()),
        })

    return docs.map_batches(ent, batch_format="pyarrow")


def vocab_growth(docs: rd.Dataset, n_buckets: int = 10) -> rd.Dataset:
    """Heaps-law vocabulary growth: cumulative distinct-term count
    after each doc_id decile of the corpus — the curve that tells you
    whether more data still buys new vocabulary. One corpus exchange
    (term -> min doc_id via hash groupby with map-side combine); the
    decile bucketing and cumulative sum run on the vocabulary-sized
    first-seen table."""
    from ray.data.aggregate import Count, Min as AggMin

    n_docs = docs.count()

    def term_rows(batch: pa.Table) -> pa.Table:
        out_t, out_d = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for tok in set(tokenize(t)):
                out_t.append(tok)
                out_d.append(d)
        return pa.table({
            "term": pa.array(out_t, type=pa.string()),
            "doc_id": pa.array(out_d, type=pa.int64()),
        })

    first_seen = (
        docs.map_batches(term_rows, batch_format="pyarrow")
        .groupby("term")
        .aggregate(AggMin("doc_id", alias_name="first_doc"))
    )

    def bucketize(t: pa.Table) -> pa.Table:
        fd = t.column("first_doc").to_numpy()
        # decile b covers doc_ids [0, (b+1)*n/10): bucket of a term =
        # the first decile whose boundary exceeds its first_doc
        b = (fd * n_buckets) // n_docs
        return pa.table({"bucket": pa.array(
            np.minimum(b, n_buckets - 1).astype(np.int64))})

    per_bucket = (
        first_seen.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_new_terms"))
        .to_pandas()  # <= n_buckets rows
        .sort_values("bucket")
    )
    buckets = per_bucket["bucket"].to_numpy().astype(np.int64)
    new = per_bucket["n_new_terms"].to_numpy().astype(np.int64)
    full_new = np.zeros(n_buckets, dtype=np.int64)
    full_new[buckets] = new
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "decile": pa.array(np.arange(1, n_buckets + 1, dtype=np.int64)),
        "n_new_terms": pa.array(full_new),
        "vocab_size": pa.array(np.cumsum(full_new)),
    }))


def source_dup_rate(docs: rd.Dataset, num_partitions: int = 8) -> rd.Dataset:
    """Per-source EXACT-duplicate rate: fraction of a source's docs
    whose content fingerprint appears more than once anywhere in the
    corpus — the first metric a crawl-quality dashboard shows. Plan:
    (md5, source) rows -> corpus-wide per-md5 copy counts (one
    groupby) -> joined back on md5 (hash join; both sides
    fingerprint-keyed) -> per-source dup/total counts. Rate = exact
    ints + one float division (identical SQL expression)."""
    from ray.data.aggregate import Count as AggCount, Sum as AggSum

    def fp(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column("text"))
        out = []
        for t in lower.to_pylist():
            canon = _WS_RE.sub(" ", t.strip(" \t\n\r"))
            out.append(hashlib.md5(canon.encode("utf-8")).hexdigest())
        return pa.table({
            "md5": pa.array(out, type=pa.string()),
            "source": batch.column("source"),
        })

    rows = docs.map_batches(fp, batch_format="pyarrow").materialize()
    copies = rows.groupby("md5").aggregate(AggCount(alias_name="n_copies"))
    joined = rows.join(
        copies.materialize(), "inner", num_partitions,
        on=("md5",), right_on=("md5",), right_suffix="_r",
    )

    def mark(t: pa.Table) -> pa.Table:
        n = t.column("n_copies").to_numpy()
        return pa.table({
            "source": t.column("source"),
            "one": pa.array(np.ones(len(t), dtype=np.int64)),
            "dup": pa.array((n > 1).astype(np.int64)),
        })

    def finish(t: pa.Table) -> pa.Table:
        nd = t.column("n_docs").to_numpy().astype(np.int64)
        du = t.column("n_dup_docs").to_numpy().astype(np.int64)
        rate = du * 1.0 / nd
        rate_r = np.copysign(np.floor(np.abs(rate) * 1e6 + 0.5),
                             rate) / 1e6
        return pa.table({
            "source": t.column("source"),
            "n_docs": pa.array(nd),
            "n_dup_docs": pa.array(du),
            "dup_rate_r": pa.array(rate_r, type=pa.float64()),
        })

    return (
        joined.map_batches(mark, batch_format="pyarrow")
        .groupby("source")
        .aggregate(AggSum("one", alias_name="n_docs"),
                   AggSum("dup", alias_name="n_dup_docs"))
        .map_batches(finish, batch_format="pyarrow")
    )
