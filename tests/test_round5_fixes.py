"""Round-5 ADVICE regression tests: scoped inline regex flags,
zero-weight hybrid query buckets, serving-config validation, and
wildcard queries under the composed serving tier."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# ADVICE r4 #1 (substring.py): scoped flag groups like (?i:...) set
# add_flags on the SUBPATTERN node without touching parsed.state.flags,
# so the top-level guard alone would index 'abc' case-sensitively while
# re.search verifies case-insensitively — silent false negatives.
# ---------------------------------------------------------------------------
def test_scoped_inline_flags_refused(ray_session, tmp_path):
    from semantic_pdf_search_engine_ray.pipelines.substring import (
        TrigramReader,
        build_trigram_index,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["ABCdef here", "abcdef there"]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, input_lineage={"t": "r5-flags"})
    r = TrigramReader(idx)

    # global inline flag: already refused (round-4 guard)
    with pytest.raises(ValueError, match="inline flags"):
        r.regex_search("(?i)abcdef")
    # scoped flag group: the round-5 guard — doc 0 ('ABCdef') matches
    # re.search but its trigrams would never be indexed under 'abc'
    with pytest.raises(ValueError, match="inline flags"):
        r.regex_search("(?i:abc)def")
    # nested inside an outer group too
    with pytest.raises(ValueError, match="inline flags"):
        r.regex_search("((?i:abc))def")
    # plain non-capturing group without flags still plans fine
    assert r.regex_search("(?:abc)def") == [1]


# ---------------------------------------------------------------------------
# ADVICE r4 #2 (rerank.py): a query term with df == n_docs has
# ln(N/df) == 0; the oracle's qvec drops that bucket (WHERE w != 0) but
# the Python side used to emit qval=0.0 rows, letting cos == 0 docs
# occupy vector-leg rank slots the oracle never assigns.
# ---------------------------------------------------------------------------
def test_hybrid_zero_weight_query_bucket_dropped(ray_session, tmp_path):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64
    from semantic_pdf_search_engine_ray.pipelines import textstats as ts
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        hybrid_sparse_rrf,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    dim = ts.HASHED_TFIDF_DIM
    # pick filler terms whose hash buckets don't collide with 'rare'
    # (a collision would legitimately give a filler doc cos > 0)
    rare_b = md5_hash64("rare") % dim
    fillers = [w for w in ("kiwi", "mango", "papaya", "plum", "fig",
                           "date", "lychee", "guava")
               if md5_hash64(w) % dim != rare_b][:5]
    assert len(fillers) == 5
    texts = ["common rare"] + [f"common {w}" for w in fillers]
    n = len(texts)
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["t"] * n),
    })
    index_dir = str(tmp_path / "idx")
    build_index_from_docs(rd.from_arrow(tbl), index_dir,
                          input_lineage={"t": "r5-hybrid"})
    vec_dir = str(tmp_path / "hvec")
    ts.hashed_tfidf(rd.from_arrow(tbl)).write_parquet(vec_dir)

    queries = pa.table({
        "query_id": pa.array([0], type=pa.int64()),
        "query": pa.array(["common rare"]),
    })
    got = hybrid_sparse_rrf(index_dir, vec_dir, queries,
                            k=n, k_cand=10, dim=dim)

    # expected: vector leg contains ONLY doc 0 (the sole doc sharing a
    # non-zero query bucket); every other doc's rrf is lexical-only
    reader = IndexReader(index_dir)
    lex_rank = {
        d: i + 1
        for i, (d, _s) in enumerate(reader.top_k_auto("common rare", 10))
    }
    assert set(lex_rank) == set(range(n))  # 'common' matches every doc
    want = {d: 1.0 / (60 + r) for d, r in lex_rank.items()}
    want[0] += 1.0 / (60 + 1)  # doc 0 is vrank 1

    have = dict(zip(got.column("doc_id").to_pylist(),
                    got.column("rrf_r").to_pylist()))
    assert set(have) == set(want)
    for d in want:  # rrf_r is rounded to 6 dp in the output table
        assert have[d] == pytest.approx(round(want[d], 6), abs=1e-9), (
            f"doc {d}: zero-weight bucket leaked into the vector leg")


# ---------------------------------------------------------------------------
# ADVICE r4 #3 + #4 (sharding.py): configure_serving input validation,
# and wildcard queries routed through (not around) the serving path.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def serving_root(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        build_sharded_index,
    )

    base = tmp_path_factory.mktemp("r5serving")
    n = 240
    rng = np.random.RandomState(11)
    langs = np.array(["en", "de"])[rng.randint(0, 2, n)]
    words = ["shared", "shard", "sharp", "alpha", "beta", "rare"]
    texts = [" ".join(words[rng.randint(0, len(words))] for _ in range(10))
             for _ in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
    })
    mono = str(base / "mono")
    build_index_from_docs(rd.from_arrow(tbl), mono,
                          input_lineage={"t": "r5-mono"})
    root = str(base / "sharded")
    build_sharded_index(rd.from_arrow(tbl), root, n_shards=3,
                        input_lineage={"t": "r5-shard"})
    rank_dir = str(base / "rank")
    os.makedirs(rank_dir)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "rank_micro": pa.array([(i * 53) % 3000 + 50 for i in range(n)],
                               type=pa.int64()),
    }), os.path.join(rank_dir, "part-0.parquet"))
    return {"mono": mono, "root": root, "rank_dir": rank_dir,
            "langs": langs, "n": n}


def test_configure_serving_validates_inputs(serving_root, tmp_path):
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
    )

    r = ShardedReader(serving_root["root"])
    with pytest.raises(ValueError, match="filter_values"):
        r.configure_serving(filter_col="lang")  # values forgotten
    with pytest.raises(ValueError, match="rank_weight"):
        r.configure_serving(rank_dir=serving_root["rank_dir"],
                            rank_weight=-0.5)
    # a rank store with rank_micro <= 0 must refuse, not emit -inf/nan
    bad_dir = str(tmp_path / "badrank")
    os.makedirs(bad_dir)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "rank_micro": pa.array([0, 100], type=pa.int64()),
    }), os.path.join(bad_dir, "part-0.parquet"))
    with pytest.raises(ValueError, match="rank_micro"):
        r.configure_serving(rank_dir=bad_dir)


def test_prefix_query_routes_through_serving(serving_root):
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        OwnedQueryTier,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    langs, n = serving_root["langs"], serving_root["n"]
    reader = IndexReader(serving_root["mono"])
    size = len(reader.doc_len)
    allowed = np.zeros(size, dtype=bool)
    allowed[:n] = langs == "en"
    rt = pq.read_table(serving_root["rank_dir"])
    prior = np.zeros(size, dtype=np.float64)
    prior[rt.column("doc_id").to_numpy()] = 0.1 * np.log(
        rt.column("rank_micro").to_numpy().astype(np.float64))

    qtbl = pa.table({
        "query_id": pa.array([0, 1], type=pa.int64()),
        "query": pa.array(["shar*", "alpha"]),
    })
    serving = {"filter_col": "lang", "filter_values": {"en"},
               "rank_dir": serving_root["rank_dir"], "rank_weight": 0.1}
    with OwnedQueryTier(serving_root["root"], n_owners=2,
                        serving=serving) as tier:
        got = tier.query(qtbl, k=5)

    by_q: dict[int, list] = {}
    for qid, doc, score in zip(got.column("query_id").to_pylist(),
                               got.column("doc_id").to_pylist(),
                               got.column("score").to_pylist()):
        by_q.setdefault(qid, []).append((doc, score))

    # wildcard: must be the PREFIX scorer under the full mask+prior
    # composition (it used to be scored as the literal token 'shar*')
    want_pfx = reader.top_k_prefix("shar", 5, allowed=allowed, prior=prior)
    assert by_q.get(0, []) == want_pfx
    assert want_pfx, "prefix query should match docs in this corpus"
    # plain query: unchanged blended path
    want_plain = reader.top_k_blended("alpha", 5, prior, allowed=allowed)
    assert by_q.get(1, []) == want_plain
    # every surfaced doc respects the facet filter
    for docs in by_q.values():
        assert all(langs[d] == "en" for d, _ in docs)


def test_chunks_reconstruct_ws_class_matches_str_isspace():
    """The chunker-coverage oracle strips the FULL str.isspace() set on
    both sides (the splitter trims with str.strip()); an ASCII-only
    class would false-fail the md5 on docs with NBSP/U+2028/etc. at a
    chunk boundary. Pin: the Python class == str.isspace() for every
    codepoint, and the SQL mirror strips an NBSP-bearing sample to the
    same bytes."""
    import re

    import duckdb

    from semantic_pdf_search_engine_ray.pipelines import conformance as cf

    m = re.search(r"regexp_replace\(text,\s*'(\[[^']+\]\+)'",
                  cf.ORACLE_SQL["chunks_reconstruct"])
    assert m, "SQL mirror must strip a whitespace class"
    sql_cls = m.group(1)

    # the Python side's compiled class lives inside q_chunks_reconstruct;
    # rebuild it from the same ranges the implementation uses and check
    # exhaustively against str.isspace()
    ranges = [(0x9, 0xD), (0x1C, 0x20), (0x85, 0x85), (0xA0, 0xA0),
              (0x1680, 0x1680), (0x2000, 0x200A), (0x2028, 0x2029),
              (0x202F, 0x202F), (0x205F, 0x205F), (0x3000, 0x3000)]
    py = re.compile("[" + "".join(
        re.escape(chr(a)) + ("-" + re.escape(chr(b)) if b > a else "")
        for a, b in ranges) + "]+")
    for i in range(0x110000):
        assert bool(py.fullmatch(chr(i))) == chr(i).isspace(), hex(i)

    sample = "hello world bye\tnow"
    got = duckdb.sql(
        "SELECT regexp_replace(?, '" + sql_cls + "', '', 'g')",
        params=[sample]).fetchone()[0]
    assert got == py.sub("", sample) == "helloworldbyenow"
