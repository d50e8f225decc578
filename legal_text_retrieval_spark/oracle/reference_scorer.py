"""Pure-NumPy clone of the reference's lexical scoring — the M0 oracle.

Line-for-line semantic reimplementation (NOT a copy) of:

- ``standardize_data``           /root/reference/src/utils.py:16-28
- ``BM25Plus`` / ``BM25Okapi``   /root/reference/src/custom_rank_bm25.py:30-173
- sklearn TfidfVectorizer(ngram_range=(1,2)) + cosine path
                                 /root/reference/src/tfidf_classifier.py:17-46
- score combination (weighted / interleave)
                                 /root/reference/src/tfidf_classifier.py:44-51,
                                 /root/reference/src/utils.py:188-205
- top-k argsort tie-break        /root/reference/src/utils.py:207-213 (T1),
                                 /root/reference/src/tfidf_classifier.py:48-49 (T2)

The Spark engine's output must match this oracle's scores to ≤1e-9
relative tolerance and its top-k docID sequences exactly.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np

from ..config import PUNCT_CHARS, SKLEARN_TOKEN_PATTERN, BM25Params

_SK_TOKEN_RE = re.compile(SKLEARN_TOKEN_PATTERN)


def standardize_data(row: str) -> str:
    """Reference normalize: each punct char → one space, strip, lower.

    The reference's two regexes are verified no-ops (SURVEY.md §1.4), so
    only the 13 ``.replace`` calls + ``.strip().lower()`` have effect.
    """
    for ch in PUNCT_CHARS:
        row = row.replace(ch, " ")
    return row.strip().lower()


def ws_split(s: str) -> list[str]:
    """Python ``s.split(' ')`` — keeps empty tokens; '' → ['']."""
    return s.split(" ")


class RefBM25:
    """Forward-index BM25 identical to the reference classes.

    ``variant='plus'`` clones BM25Plus (idf = ln((N+1)/df); score adds
    delta for every query-term occurrence); ``variant='okapi'`` clones
    BM25Okapi (idf = ln(N-df+0.5)-ln(df+0.5) with eps*avg_idf floor).
    Duplicate query terms contribute once per occurrence; unseen terms
    score idf 0 — matching get_scores exactly.
    """

    def __init__(self, corpus_tokens: list[list[str]], params: BM25Params):
        self.p = params
        self.corpus_size = len(corpus_tokens)
        self.doc_len = np.array([len(d) for d in corpus_tokens], dtype=np.float64)
        self.avgdl = self.doc_len.sum() / self.corpus_size
        self.doc_freqs = [Counter(d) for d in corpus_tokens]
        nd: Counter = Counter()
        for f in self.doc_freqs:
            nd.update(f.keys())
        self.idf: dict[str, float] = {}
        if params.variant == "plus":
            for w, df in nd.items():
                self.idf[w] = math.log((self.corpus_size + 1) / df)
        else:
            neg = []
            s = 0.0
            for w, df in nd.items():
                v = math.log(self.corpus_size - df + 0.5) - math.log(df + 0.5)
                self.idf[w] = v
                s += v
                if v < 0:
                    neg.append(w)
            eps = params.epsilon * (s / len(self.idf))
            for w in neg:
                self.idf[w] = eps

    def get_scores(self, query_tokens: list[str]) -> np.ndarray:
        p = self.p
        score = np.zeros(self.corpus_size)
        dl = self.doc_len
        for q in query_tokens:
            q_freq = np.array([(doc.get(q) or 0) for doc in self.doc_freqs], dtype=np.float64)
            idf = self.idf.get(q) or 0
            if p.variant == "plus":
                score += idf * (
                    p.delta
                    + (q_freq * (p.k1 + 1)) / (p.k1 * (1 - p.b + p.b * dl / self.avgdl) + q_freq)
                )
            else:
                score += idf * (
                    q_freq * (p.k1 + 1) / (q_freq + p.k1 * (1 - p.b + p.b * dl / self.avgdl))
                )
        return score


class RefTfidf:
    """sklearn-default TfidfVectorizer(ngram_range=(1,2)) semantics:

    token_pattern \\b\\w\\w+\\b over the standardized string, raw tf,
    smooth idf = ln((1+N)/(1+df)) + 1, L2 row norm; transform drops
    out-of-vocabulary terms.  Cosine = dot of normalized vectors.
    """

    def __init__(self, corpus_std: list[str]):
        self.n = len(corpus_std)
        docs = [self._analyze(d) for d in corpus_std]
        df: Counter = Counter()
        for d in docs:
            df.update(set(d))
        self.idf = {w: math.log((1 + self.n) / (1 + c)) + 1.0 for w, c in df.items()}
        self.doc_vecs = [self._vectorize(d) for d in docs]

    @staticmethod
    def _analyze(std: str) -> list[str]:
        toks = _SK_TOKEN_RE.findall(std)
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def _vectorize(self, analyzed: list[str]) -> dict[str, float]:
        tf = Counter(t for t in analyzed if t in self.idf)
        vec = {w: c * self.idf[w] for w, c in tf.items()}
        norm = math.sqrt(sum(v * v for v in vec.values()))
        if norm > 0:
            vec = {w: v / norm for w, v in vec.items()}
        return vec

    def cosine_scores(self, query_std: str) -> np.ndarray:
        qv = self._vectorize(self._analyze(query_std))
        out = np.zeros(self.n)
        for i, dv in enumerate(self.doc_vecs):
            if len(qv) < len(dv):
                out[i] = sum(w * dv.get(t, 0.0) for t, w in qv.items())
            else:
                out[i] = sum(w * qv.get(t, 0.0) for t, w in dv.items())
        return out


def topk_desc(scores: np.ndarray, k: int) -> np.ndarray:
    """T2: ``scores.argsort()[::-1][:k]`` — best→worst, ties → higher
    doc index first (reversal of stable ascending argsort)."""
    return scores.argsort(kind="stable")[::-1][:k]


def topk_tail(scores: np.ndarray, k: int) -> np.ndarray:
    """T1: ``scores.argsort()[-k:]`` — worst→best tail selection; same
    selected set as T2, reversed order."""
    return scores.argsort(kind="stable")[-k:]


def combine_weighted(tfidf_mat: np.ndarray, bm25_mat: np.ndarray) -> np.ndarray:
    """Q6: 0.33*cosine + 0.67*bm25/max(bm25) — max over the whole
    queries×docs matrix (/root/reference/src/tfidf_classifier.py:44-46)."""
    return 0.33 * tfidf_mat + 0.67 * bm25_mat / np.max(bm25_mat)


def combine_interleave(idx_tfidf: np.ndarray, idx_bm25: np.ndarray, top_k: int) -> list[list[int]]:
    """Q7: alternate bm25[j], tfidf[j], dedup keep-first, stop at k
    (/root/reference/src/utils.py:188-205)."""
    preds = []
    for i in range(len(idx_bm25)):
        item: list[int] = []
        for j in range(len(idx_bm25[i])):
            if idx_bm25[i][j] not in item:
                item.append(int(idx_bm25[i][j]))
            if len(item) == top_k:
                break
            if idx_tfidf[i][j] not in item:
                item.append(int(idx_tfidf[i][j]))
            if len(item) == top_k:
                break
        preds.append(item)
    return preds
