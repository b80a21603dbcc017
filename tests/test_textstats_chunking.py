"""Text-analysis batch kernels (pure Arrow in/out — no Ray needed) and
the ported reference chunker contract."""

from __future__ import annotations

import pyarrow as pa

from semantic_pdf_search_engine_ray.functions.chunking import (
    chunk_per_page,
    is_garbage_sentence,
    is_valid_chunk,
    looks_like_code,
    smart_chunk_text,
)
from semantic_pdf_search_engine_ray.pipelines.textstats import (
    LangIdStage,
    doc_stats_batch,
    fingerprint_batch,
    quality_batch,
    token_class_counts_batch,
)


def _batch(texts: list[str]) -> pa.Table:
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )


def test_doc_stats_counts():
    out = doc_stats_batch(_batch(["Hello, World 42!", ""]))
    assert out.column("doc_len").to_pylist() == [3, 0]
    assert out.column("text_chars").to_pylist() == [16, 0]
    assert out.column("alnum_chars").to_pylist() == [12, 0]


def test_token_classes():
    out = token_class_counts_batch(_batch(["ab 12 cd-ef, 9!"]))
    assert out.column("n_words").to_pylist() == [3]  # ab, cd, ef
    assert out.column("n_numbers").to_pylist() == [2]  # 12, 9
    assert out.column("n_punct").to_pylist() == [3]  # - , !


def test_quality_predicate():
    good = "the quick brown fox jumps over the lazy dog repeatedly today"
    bad = "x"
    out = quality_batch(_batch([good, bad]))
    assert out.column("is_quality").to_pylist() == [True, False]


def test_lang_id_argmax_and_und():
    stage = LangIdStage()
    out = stage(_batch([
        "the cat and the dog in a house",   # en
        "der hund und die katze ist nicht", # de
        "zzz qqq www",                       # no stopword hits
    ]))
    assert out.column("pred_lang").to_pylist() == ["en", "de", "und"]


def test_fingerprint_ws_invariance():
    out = fingerprint_batch(_batch(["a  b\tc", " a b c "]))
    md5s = out.column("content_md5").to_pylist()
    assert md5s[0] == md5s[1]


# ---- chunker: reference contract (chunk.rs:562-604 test analog) ----------

PAGE1 = (
    "Introduction to Systems. "
    "Distributed systems are collections of independent computers that "
    "appear to users as a single coherent system. They communicate by "
    "passing messages over a network and coordinate their actions to "
    "achieve common goals. "
    "Fault tolerance is achieved through replication of components. "
    "Consistency models define the contract between the data store and "
    "its clients about the results of read and write operations."
)


def test_smart_chunk_nonempty_and_overlap():
    chunks = smart_chunk_text(PAGE1, chunk_size=200, remove_headers=False)
    assert chunks
    assert all(c.strip() for c in chunks)
    if len(chunks) > 1:
        # overlap carry: some sentence text of chunk i reappears in i+1
        tail = chunks[0].split(".")[-2]
        assert tail.strip()[:20] in chunks[1]


def test_chunk_per_page_filters_garbage():
    toc = "Chapter 1 . . . . . . . . . . . . . . 3"
    chunks = chunk_per_page(toc)
    assert all(not is_garbage_sentence(c) for c in chunks)


def test_is_valid_chunk_thresholds():
    assert not is_valid_chunk("short")
    assert not is_valid_chunk("references")
    assert not is_valid_chunk(
        "{ } function var const let => // { } function more filler words here"
    )
    assert is_valid_chunk(
        "This sentence has more than eight words and plenty of alphabetic "
        "characters to pass every check."
    )


def test_analyzer_simple_case_mapping_matches_arrow_and_sql():
    """tokenize() must agree with Arrow utf8_lower (== DuckDB lower) on
    full-vs-simple case-mapping characters — the build side, query side
    and SQL oracle share one analyzer."""
    import duckdb

    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize
    from semantic_pdf_search_engine_ray.stages.postings import (
        flat_token_pairs,
    )

    hazard = "İstanbul KİT here ŉa STRASSE ß end"
    py_tokens = tokenize(hazard)
    _parents, flat = flat_token_pairs(pa.array([hazard]))
    assert py_tokens == flat.to_pylist()
    sql = duckdb.sql(
        "SELECT unnest(regexp_extract_all(lower($1), '[a-z0-9]+'))",
        params=[hazard],
    ).fetchall()
    assert py_tokens == [r[0] for r in sql]


def test_header_heuristic_uses_byte_length():
    from semantic_pdf_search_engine_ray.functions.textnorm import (
        is_likely_header,
    )

    # 60 chars but 120 UTF-8 bytes: the reference (Rust byte len) skips it
    assert not is_likely_header("Г" * 60)
    assert is_likely_header("INTRODUCTION")


def test_looks_like_code():
    assert looks_like_code("function f() { return x => x; }")
    assert not looks_like_code("plain prose without indicators")


def test_semantic_chunks_break_priority():
    """C1 splitter (TextSplitter::new semantics): prefers paragraph
    breaks, then sentence breaks, then words; chunks trimmed and within
    capacity."""
    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    para1 = "First paragraph sentence one. And sentence two here."
    para2 = "Second paragraph follows after a blank line. More text."
    text = f"{para1}\n\n{para2}"
    # both paragraphs fit separately but not together -> paragraph break
    cap = max(len(para1), len(para2)) + 5
    assert semantic_chunks(text, cap) == [para1, para2]
    # whole text fits -> one chunk (trimmed, newlines preserved inside)
    assert semantic_chunks(text, len(text)) == [text]
    # force sentence-level splitting inside a paragraph
    s1, s2 = "Alpha beta gamma delta. ", "Epsilon zeta eta theta."
    got = semantic_chunks(s1 + s2, max(len(s1), len(s2)) + 1)
    assert got == [s1.strip(), s2.strip()]
    # a single overlong sentence falls back to word boundaries
    words = "word " * 30
    for c in semantic_chunks(words, 24):
        assert len(c) <= 24
        assert not c.startswith(" ") and not c.endswith(" ")
        assert all(w == "word" for w in c.split())
    # reconstruction: non-whitespace content is preserved in order
    joined = "".join(semantic_chunks(text, 30))
    assert joined.replace(" ", "").replace("\n", "") == \
        text.replace(" ", "").replace("\n", "")


def test_semantic_chunks_abbreviation_not_split():
    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    text = ("The metric improved by 3.14 percent overall, e.g. when the "
            "cache was warm during the run. A second sentence follows "
            "and it is fairly long too for the test.")
    got = semantic_chunks(text, 120)
    # the decimal and "e.g." must not open a chunk boundary
    assert not any(c.startswith(("14 ", "g. ", "when")) for c in got)
    assert got[0].endswith("run.")


def test_chunk_document_is_splitter_plus_validity():
    from semantic_pdf_search_engine_ray.functions.chunking import (
        chunk_document,
        is_valid_chunk,
    )
    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    text = ("A realistic paragraph with plenty of prose inside it that "
            "keeps going for a while so the validity filter passes. " * 8)
    got = chunk_document(text, 500)
    assert got == [c for c in semantic_chunks(text, 500)
                   if is_valid_chunk(c)]
    assert got and all(len(c) <= 500 for c in got)


def test_png_codec_roundtrip_all_color_types():
    from semantic_pdf_search_engine_ray.functions.png import (
        decode_png,
        encode_png,
    )

    for ctype, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 7, 5
        pix = bytes((i * 37 + ch) % 256 for i in range(w * h * ch))
        data = encode_png(w, h, pix, color_type=ctype)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        dw, dh, dch, dpix = decode_png(data)
        assert (dw, dh, dch) == (w, h, ch)
        assert dpix == pix


def test_png_decoder_reverses_every_filter_type():
    """Hand-build a PNG whose scanlines use filters 1..4 (Sub/Up/
    Average/Paeth) — the encoder only emits filter 0, so this proves the
    DECODER's unfilter paths independently."""
    import struct
    import zlib

    from semantic_pdf_search_engine_ray.functions.png import (
        decode_png,
        encode_png,
    )

    w, h, ch = 4, 5, 3
    pix = bytes((i * 11 + 3) % 256 for i in range(w * h * ch))
    stride = w * ch
    rows = [bytearray(pix[y * stride:(y + 1) * stride]) for y in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = b""
    prev = bytearray(stride)
    for y, row in enumerate(rows):
        ftype = [0, 1, 2, 3, 4][y % 5]
        out = bytearray(stride)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            up_left = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                out[i] = row[i]
            elif ftype == 1:
                out[i] = (row[i] - left) & 0xFF
            elif ftype == 2:
                out[i] = (row[i] - up) & 0xFF
            elif ftype == 3:
                out[i] = (row[i] - ((left + up) >> 1)) & 0xFF
            else:
                out[i] = (row[i] - paeth(left, up, up_left)) & 0xFF
        filtered += bytes([ftype]) + bytes(out)
        prev = row

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(filtered))
            + chunk(b"IEND", b""))
    dw, dh, dch, dpix = decode_png(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert dpix == pix
    # and the filter-0 encoder round-trips the same image
    assert decode_png(encode_png(w, h, pix))[3] == pix
