"""SimHash 64-bit signatures over word tokens — vectorized pandas UDF.

Complementary near-dup family to MinHash (dedup surface required by the
build spec): token-frequency-weighted random hyperplane hash; Hamming
distance between simhashes approximates cosine distance of the bag-of-
words vectors.  Reference analog: an alternative similarity key over the
same standardized strings (the reference only ships cosine; SimHash is
our additional scale path for cheap prefilters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized FNV-1a 64 over a list of tokens: pad to a byte matrix and
    fold column-by-column (≤ max-token-length iterations per batch)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    encoded = [t.encode("utf-8", "ignore") for t in tokens]
    maxlen = max(len(e) for e in encoded)
    mat = np.zeros((len(encoded), max(maxlen, 1)), dtype=np.uint8)
    lens = np.zeros(len(encoded), dtype=np.int64)
    for i, e in enumerate(encoded):
        mat[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lens[i] = len(e)
    h = np.full(len(encoded), _FNV_OFFSET, dtype=np.uint64)
    for col in range(mat.shape[1]):
        active = lens > col
        h[active] = (h[active] ^ mat[active, col].astype(np.uint64)) * _FNV_PRIME
    return h


def simhash_py(text: str) -> int:
    """Driver-side mirror (tests): 64-bit SimHash of whitespace tokens of
    already-normalized text."""
    toks = [t for t in (text or "").split() if t]
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = fnv1a64_tokens(list(uniq))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(np.int64(out))


def simhash_udf():
    """pandas UDF: normalized_text -> long (64-bit SimHash)."""

    @F.pandas_udf(LongType())
    def _udf(texts: pd.Series) -> pd.Series:
        return pd.Series([simhash_py(t) for t in texts], dtype=np.int64)

    return _udf
