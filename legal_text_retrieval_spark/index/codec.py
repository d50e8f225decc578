"""Delta + varint (LEB128) posting-list codec — pure vectorized NumPy.

Replaces the reference's dense per-term posting cache
(/root/reference/src/custom_rank_bm25.py:153-157) with real compressed
posting lists.  Encode/decode loop over BYTE POSITIONS (≤10), never
over values, so a million-posting segment costs ~10 numpy passes.

Layout per posting segment (one row of the postings table):

- ``doc_ids``: strictly increasing int64 → delta vs predecessor
  (first delta vs the segment's base docID) → LEB128.
- ``tfs`` / ``dls``: positive int64 → LEB128 (no delta).
- blocks of ``block_size`` postings carry (first_doc, last_doc,
  max_tf_part) metadata for block-max WAND pruning.
"""

from __future__ import annotations

import numpy as np


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int64/uint64 array."""
    vals = np.asarray(values, dtype=np.uint64)
    if len(vals) == 0:
        return b""
    nb = np.ones(len(vals), dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nb += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nb
    remaining = vals.copy()
    for i in range(int(nb.max())):
        mask = nb > i
        idx = starts[mask] + i
        cont = (nb[mask] - 1) > i
        out[idx] = (remaining[mask] & np.uint64(0x7F)).astype(np.uint8) | (
            cont.astype(np.uint8) << 7
        )
        remaining = remaining >> np.uint64(7)
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    end_pos = np.nonzero(is_end)[0]
    n = len(end_pos)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = end_pos[:-1] + 1
    vals = np.zeros(n, dtype=np.uint64)
    width = end_pos - starts + 1
    for i in range(int(width.max())):
        mask = width > i
        vals[mask] |= (b[starts[mask] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * i
        )
    return vals


def encode_docids(doc_ids: np.ndarray, base: int) -> bytes:
    """Delta-encode strictly-increasing docIDs against ``base`` then
    varint.  First value stores (doc_ids[0] - base); the rest store
    gaps-1? No — plain gaps (≥1), keeping the codec branch-free."""
    d = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty(len(d), dtype=np.int64)
    if len(d):
        deltas[0] = d[0] - base
        deltas[1:] = np.diff(d)
    return encode_varint(deltas)


def decode_docids(buf: bytes, base: int) -> np.ndarray:
    deltas = decode_varint(buf).astype(np.int64)
    if len(deltas) == 0:
        return deltas
    out = np.cumsum(deltas)
    return out + base


def tf_part(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float, variant: str) -> np.ndarray:
    """Vectorized matched-part BM25 kernel (same algebra as
    operators/bm25._tf_part; /root/reference/src/custom_rank_bm25.py:
    158-159 plus-variant, :118-119 okapi-variant)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    if variant == "plus":
        return (tf * (k1 + 1)) / (k1 * (1 - b + b * dl / avgdl) + tf)
    return (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
