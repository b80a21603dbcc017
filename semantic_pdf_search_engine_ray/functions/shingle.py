"""Shingling + stable hashing kernels for the dedup family.

The reference has no dedup at all (re-uploading a PDF double-indexes it
under a fresh uuid, `/root/reference/src/qdrant.rs:48`) — these kernels
back the engine additions required for a large-scale training-data
pipeline: exact dedup, MinHash+LSH, SimHash, n-gram Jaccard
(SURVEY.md §2.6 A5 and the training-data operator set).

All hashing is explicitly seeded/keyed (blake2b + multiply-shift mixing)
so signatures are stable across processes, Python versions and
PYTHONHASHSEED — a hard requirement for resumable distributed builds
where different workers must agree on every bucket key.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE61 = (1 << 61) - 1


def word_shingles(tokens: list[str], n: int = 3) -> list[str]:
    """Distinct word n-gram shingles, order-preserving first occurrence.

    A document shorter than ``n`` tokens has no shingles (matches the SQL
    oracle's ``generate_series(1, len(ts)-n+1)`` which is empty then).
    """
    if len(tokens) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(tokens) - n + 1):
        seen[" ".join(tokens[i : i + n])] = None
    return list(seen)


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (blake2b, process-stable)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def hash_shingles(shingles: list[str]) -> np.ndarray:
    """uint64 base hashes of a shingle set."""
    return np.fromiter(
        (stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles)
    )


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameters for ``num_perm`` universal hash permutations over
    the Mersenne prime field 2^61-1. Seeded -> identical on every worker."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """Vectorized MinHash: shingle base hashes -> ``num_perm`` signature.

    h_i(x) = a_i * x + b_i with uint64 wraparound (multiply-shift family;
    a_i odd). Fully vectorized — one (n_shingles x num_perm) uint64
    broadcast + min per doc — and bit-deterministic on every worker
    (numpy uint64 wrap is well-defined)."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        self.num_perm = num_perm
        a, self.b = _perm_params(num_perm, seed)
        self.a = a | np.uint64(1)  # odd multipliers -> bijective mixing

    def signature(self, base_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-MAX for an empty set."""
        if base_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        vals = base_hashes[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """LSH band bucket keys: blake2b over each contiguous signature band,
    band index mixed in so bands never collide across band positions."""
    rows = len(sig) // bands
    keys = []
    for i in range(bands):
        h = hashlib.blake2b(digest_size=8)
        h.update(i.to_bytes(4, "little"))
        h.update(sig[i * rows : (i + 1) * rows].tobytes())
        keys.append(int.from_bytes(h.digest(), "little"))
    return keys


def md5_hash64(s: str) -> int:
    """64-bit hash matching DuckDB's ``md5_number_lower``: the LOWER half
    of md5 = little-endian uint64 of digest bytes 8..16 (verified against
    DuckDB 1.0). Used where a SQL oracle must recompute the same hash."""
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[8:], "little"
    )


def simhash64(terms: list[str], counts: np.ndarray) -> int:
    """64-bit SimHash over weighted term features (weight = tf).

    Term hash is ``md5_hash64`` (== DuckDB ``md5_number_lower``) so the
    whole signature is recomputable in ANSI-ish SQL — that is what turns
    dedup_simhash from a rows-only entry into an oracle-exact one."""
    if not terms:
        return 0
    hashes = np.fromiter(
        (md5_hash64(t) for t in terms), dtype=np.uint64, count=len(terms)
    )
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    signed = np.where(bits.astype(np.int64) == 1, 1, -1)
    weighted = (signed * counts[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for bit in np.flatnonzero(weighted > 0):
        out |= np.uint64(1) << np.uint64(bit)
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor over uint64 arrays."""
    x = np.bitwise_xor(a, b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard(a: set, b: set) -> float:
    """Exact Jaccard of two sets (float64)."""
    if not a and not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def winnow_fingerprints(
    text: str, k: int = 8, window: int = 4
) -> list[int]:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hashes of char k-grams, min-sampled per window with the rightmost-
    minimum tie rule, deduped, order of first selection preserved.

    K-gram hash is ``md5_hash64`` (== DuckDB ``md5_number_lower`` over
    ``substr``) so the whole fingerprint set is recomputable in SQL —
    the winnow selection itself is a windowed rightmost-argmin, which
    SQL expresses with ``min() OVER (ROWS k-1 PRECEDING)`` + position
    arithmetic (see conformance ``_SQL_WINNOW``)."""
    n = len(text)
    if n < k:
        return []
    grams = np.fromiter(
        (md5_hash64(text[i : i + k]) for i in range(n - k + 1)),
        dtype=np.uint64,
        count=n - k + 1,
    )
    if len(grams) <= window:
        return [int(grams.min())]
    # vectorized rightmost-argmin per sliding window
    wins = np.lib.stride_tricks.sliding_window_view(grams, window)
    m = window - 1 - np.argmin(wins[:, ::-1], axis=1)
    pos = np.arange(len(wins)) + m
    keep = np.concatenate(([True], pos[1:] != pos[:-1]))
    out = grams[pos[keep]]
    seen: dict[int, None] = {}
    for f in out:
        seen[int(f)] = None
    return list(seen)


def word_ngram_strings(text: str, n: int) -> list[str]:
    """Overlapping word n-grams as space-joined strings (the
    decontamination unit: GPT-3 appendix C uses 13-gram strings)."""
    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

    toks = tokenize(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
