"""Deterministic synthetic fixtures (FIXTURES.md) — seed=42, no external data.

Generates the Iceberg-shaped source-code corpus
``(repo, path, commit, lang, content)`` per BASELINE.json ``input_hint``,
a query set exercising the reference's scoring edge cases (duplicate
terms, OOV terms, punctuation / double-space empty-token paths), and
qrels for the pair-generation / evaluation operators.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_LANGS = ["py", "java", "scala", "go", "js"]
_EXT = {"py": "py", "java": "java", "scala": "scala", "go": "go", "js": "js"}

# 500-term code-ish vocabulary; first few get mega-df weights (skew).
_KEYWORDS = [
    "def", "import", "class", "return", "self", "if", "else", "for", "while",
    "try", "except", "lambda", "yield", "async", "await", "public", "static",
    "void", "int", "string", "func", "var", "val", "let", "const", "new",
    "null", "true", "false", "print", "len", "range", "map", "filter",
    "reduce", "open", "close", "read", "write", "append", "split", "join",
    "strip", "lower", "upper", "format", "assert", "raise", "pass", "break",
    "continue",
]
_VOCAB = _KEYWORDS + [f"v{i}" for i in range(500 - len(_KEYWORDS))]


def _zipf_weights(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def make_corpus(n_docs: int, seed: int = 42, punct_frac: float = 0.02) -> pd.DataFrame:
    """Synthetic source-code corpus; deterministic in (n_docs, seed)."""
    weights = _zipf_weights(len(_VOCAB))
    rows = []
    for i in range(n_docs):
        rng = np.random.default_rng(seed + i)
        dlen = int(5 + (400 - 5) * rng.random() ** 3)  # Zipf-ish in [5, 400]
        toks = rng.choice(_VOCAB, size=dlen, p=weights)
        content = " ".join(toks)
        if rng.random() < punct_frac:
            # punctuation + doubled spaces: exercises standardize
            # no-op/empty-token semantics (SURVEY.md §1.4).
            content = content.replace(" ", ",  ", 2) + " ."
        lang = _LANGS[i % len(_LANGS)]
        rows.append(
            {
                "repo": f"org{i % 7}/repo{i % 23}",
                "path": f"src/mod{i % 11}/file_{i}.{_EXT[lang]}",
                "commit": hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40],
                "lang": lang,
                "content": content,
            }
        )
    return pd.DataFrame(rows)


def make_corpus_fast(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Vectorized corpus generator for the scaling benchmark (single
    RNG draw; same shape/distribution as make_corpus but ~100× faster;
    not per-doc-seed compatible with it)."""
    rng = np.random.default_rng(seed)
    weights = _zipf_weights(len(_VOCAB))
    lens = (5 + (400 - 5) * rng.random(n_docs) ** 3).astype(np.int64)
    toks = rng.choice(np.array(_VOCAB), size=int(lens.sum()), p=weights)
    bounds = np.cumsum(lens)[:-1]
    contents = [" ".join(c) for c in np.split(toks, bounds)]
    idx = np.arange(n_docs)
    langs = np.array(_LANGS)[idx % len(_LANGS)]
    return pd.DataFrame(
        {
            "doc_id": idx,
            "repo": pd.Series(idx % 7).map(lambda i: f"org{i}") + "/" + pd.Series(idx % 23).map(lambda i: f"repo{i}"),
            "path": [f"src/mod{i % 11}/file_{i}.{_EXT[langs[i]]}" for i in idx],
            "commit": [hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40] for i in idx],
            "lang": langs,
            "content": contents,
        }
    )


def make_queries(n_queries: int, seed: int = 4242) -> pd.DataFrame:
    """Query set: ~20% duplicate-term, ~10% OOV-term, ~10% punctuation
    /double-space queries (FIXTURES.md §2)."""
    weights = _zipf_weights(len(_VOCAB))
    rows = []
    for j in range(n_queries):
        rng = np.random.default_rng(seed + j)
        qlen = int(rng.integers(3, 26))
        toks = list(rng.choice(_VOCAB, size=qlen, p=weights))
        r = rng.random()
        if r < 0.20 and qlen >= 2:
            toks[1] = toks[0]  # duplicate occurrence path
        elif r < 0.30:
            toks[0] = f"zzqq{j}"  # OOV → idf 0 path
        text = " ".join(toks)
        if rng.random() < 0.10:
            text = text.replace(" ", " ,  ", 1) + " ?"  # empty-token path
        rows.append({"query_id": f"q{j:04d}", "query_text": text})
    return pd.DataFrame(rows)


def make_qrels(queries: pd.DataFrame, n_docs: int, seed: int = 777) -> pd.DataFrame:
    """1-5 gold docs per query (random half — enough for nontrivial
    P/R/F metrics; FIXTURES.md §3)."""
    rows = []
    for j, qid in enumerate(queries["query_id"]):
        rng = np.random.default_rng(seed + j)
        for d in rng.choice(n_docs, size=int(rng.integers(1, 6)), replace=False):
            rows.append({"query_id": qid, "doc_id": int(d)})
    return pd.DataFrame(rows)
