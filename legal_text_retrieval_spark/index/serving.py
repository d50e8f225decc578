"""Low-latency local serving over a built index — the engine's
counterpart of the reference's online-inference init_state/serve loop
(/root/reference/src/infer.py:156-208, which unpickles the fitted
scorer and serves queries in-process).

``LocalIndexServer.load`` collects the (compressed) index into driver
memory — legitimate whenever the index fits one node, exactly like the
reference's pickle — and answers top-k queries in microseconds using
the SAME codec and the same term-ordered accumulation as the WAND
kernel, so results are bit-identical to the distributed path
(tests/test_serving.py).

For indexes too large for one node, use index/wand.query_topk (the
distributed path); this module exists because per-query Spark job
overhead (~1-2 s) is the wrong tool for interactive serving.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import BM25Params
from ..oracle.reference_scorer import standardize_data, ws_split
from . import codec
from .builder import IndexPaths


@dataclass
class _TermPostings:
    # raw doc_ids are NOT kept: query() accumulates into a slot-indexed
    # dense array and recovers ids via all_doc_ids[matched], so resident
    # cost is slots + contribs only (12 B/posting with int32 slots)
    slots: np.ndarray  # int32 (int64 if n_docs >= 2**31) census positions
    contribs: np.ndarray  # float64 matched-part contribution (idf excluded)


#: conservative floor for the auto-derived resident budget (used when
#: the host's physical memory cannot be probed).  At 100× scale the
#: answer is not a bigger budget but sharded serving: partition the
#: index by term range (each shard loads its dictionary slice +
#: postings) or by doc partition (scatter-gather top-k merge, same
#: merge rule as the WAND window) — the on-disk layout already supports
#: both (postings are (term_id, seg_id) range-partitioned parquet).
DEFAULT_MEMORY_BUDGET = 8 << 30


def system_memory_budget() -> int:
    """Default serving budget: half this host's physical RAM (the rest
    is left for the OS page cache, the JVM, and query scratch), with an
    8 GiB floor when the probe fails.  Derived per host rather than
    hardcoded (ADVICE r5: a fixed 8 GiB budget — this sandbox's heap —
    wrongly rejected larger-but-fitting indexes on bigger nodes)."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        if total > 0:
            return int(total // 2)
    except (AttributeError, ValueError, OSError):
        pass
    return DEFAULT_MEMORY_BUDGET


#: the forked shard workers' handle to the parent's loaded server
#: (set by start_workers immediately before the fork, inherited COW)
_SHARD_SERVER: "LocalIndexServer | None" = None


def _shard_topk(args):
    """Worker body: dense accumulation over one census slice, then the
    slice's top-k by the same (score, doc_id) lexsort rule as
    ``LocalIndexServer.query``.  Pure numpy over fork-inherited arrays
    — no py4j, no imports, no writes to shared pages."""
    s, S, terms, k = args
    srv = _SHARD_SERVER
    census = srv.all_doc_ids
    size = len(census)
    lo, hi = s * size // S, (s + 1) * size // S
    score = np.zeros(hi - lo, dtype=np.float64)
    matched = np.zeros(hi - lo, dtype=bool)
    for t, w in terms:  # ascending term order == the engine fold
        tp = srv.term_post.get(t)
        if tp is None:
            continue
        i0, i1 = np.searchsorted(tp.slots, (lo, hi))
        sl = tp.slots[i0:i1] - lo
        score[sl] += w * tp.contribs[i0:i1]
        matched[sl] = True
    cand_ids = census[lo:hi][matched]
    cand_ms = score[matched]
    n = len(cand_ids)
    if n > k:
        order = np.lexsort((cand_ids, cand_ms))[-k:]
        cand_ids, cand_ms = cand_ids[order], cand_ms[order]
    return n, cand_ids, cand_ms


class LocalIndexServer:
    def __init__(self, params: BM25Params, avgdl: float, n_docs: int):
        self.params = params
        self.avgdl = avgdl
        self.n_docs = n_docs
        self.term_idf: dict[str, float] = {}
        self.term_post: dict[str, _TermPostings] = {}
        self.all_doc_ids: np.ndarray | None = None

    @staticmethod
    def resident_estimate(manifest: dict) -> int:
        """Bytes this server will hold resident across load, estimated
        from manifest stats alone (no data read).  This budgets the
        load-time PEAK (what the admission guard must cover), not just
        the end state: staging arrays are two 8-byte arrays per posting
        (int64 doc_ids + float64 tf-part) that free as the resident
        form (int32 slots + float64 contribs, 12 B/posting) builds,
        the dictionary ~150 B/term (string + two dict entries), the
        doc-id census 8 B/doc, and the driver collect of the
        compressed posting rows (~3x bytes_compressed for Row/py4j
        framing, calibrated against the measured 3.2M-doc load)."""
        return int(
            16 * manifest.get("total_postings", 0)
            + 150 * manifest.get("vocab_size", 0)
            + 8 * manifest.get("n_docs", 0)
            + 3 * manifest.get("bytes_compressed", 0)
        )

    @classmethod
    def load(
        cls,
        spark,
        root: str,
        allow_legacy: bool = False,
        memory_budget_bytes: int | str | None = "auto",
    ) -> "LocalIndexServer":
        from .wand import FulltextIndex

        paths = IndexPaths(root)
        manifest = json.loads(Path(paths.manifest).read_text())
        if memory_budget_bytes == "auto":
            memory_budget_bytes = system_memory_budget()
        est = cls.resident_estimate(manifest)
        if memory_budget_bytes is not None and est > memory_budget_bytes:
            raise MemoryError(
                f"index at {root} needs ≈{est / (1 << 30):.1f} GiB resident "
                f"(total_postings={manifest.get('total_postings')}, "
                f"vocab_size={manifest.get('vocab_size')}, "
                f"n_docs={manifest.get('n_docs')}) > "
                f"budget {memory_budget_bytes / (1 << 30):.1f} GiB. "
                "Single-node serving is for indexes that fit one node "
                "(like the reference's pickled scorer). Raise "
                "memory_budget_bytes (or pass None) if this node really "
                "has the headroom; otherwise shard serving by term range "
                "or doc partition, or use the distributed path "
                "(index.wand.query_topk)."
            )
        fv = manifest.get("format_version")
        if fv != FulltextIndex.REQUIRED_FORMAT_VERSION or "eps_fold" not in manifest:
            msg = (
                f"index at {root}: format_version={fv!r} / eps_fold "
                f"{'present' if 'eps_fold' in manifest else 'MISSING'} — serving "
                f"requires format_version={FulltextIndex.REQUIRED_FORMAT_VERSION} "
                "with eps_fold (see FulltextIndex.load). Rebuild, or pass "
                "allow_legacy=True."
            )
            if not allow_legacy:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        p = manifest["params"]
        params = BM25Params(
            k1=p["k1"], b=p["b"], delta=p["delta"], variant=p["variant"], epsilon=p["epsilon"]
        )
        srv = cls(params, manifest["avgdl"], manifest["n_docs"])
        window = p["segment_doc_window"]

        dict_rows = spark.read.parquet(paths.dictionary).select("term", "term_id", "idf").collect()
        id2term = {}
        for r in dict_rows:
            srv.term_idf[r.term] = r.idf
            id2term[r.term_id] = r.term
        # same global switch as wand.query_topk's negative_weights: with
        # a negative okapi ε floor, pads can outrank matched for EVERY
        # query (including exact qconst ties), so padding keys off the
        # dictionary minimum, not a per-query score heuristic
        srv.has_negative_idf = (
            params.variant == "okapi"
            and bool(srv.term_idf)
            and min(srv.term_idf.values()) < 0
        )

        parts: dict[str, list] = {}
        for r in (
            spark.read.parquet(paths.postings)
            .select("term_id", "seg_id", "doc_ids_enc", "tfs_enc", "dls_enc")
            .collect()
        ):
            term = id2term[r.term_id]
            base = r.seg_id * window
            ids = codec.decode_docids(bytes(r.doc_ids_enc), base)
            tfs = codec.decode_varint(bytes(r.tfs_enc)).astype(np.int64)
            dls = codec.decode_varint(bytes(r.dls_enc)).astype(np.int64)
            tfp = codec.tf_part(tfs, dls, params.k1, params.b, srv.avgdl, params.variant)
            parts.setdefault(term, []).append((r.seg_id, ids, tfp))
        srv.all_doc_ids = np.sort(
            np.fromiter(
                (r.doc_id for r in spark.read.parquet(paths.docstats).select("doc_id").collect()),
                dtype=np.int64,
            )
        )
        # slot = position in the sorted census: the accumulator is
        # sized by n_docs, not max doc_id — sparse id spaces (e.g.
        # chunked corpora at CHUNK_ID_BASE ≈ 1e9) stay O(n_docs).
        # parts entries are popped as they convert so the 16 B/posting
        # staging arrays free while the 12 B/posting resident form
        # builds — load peak stays ~16 B/posting instead of stacking
        # both forms (the round-6 3.2M measurement caught exactly that:
        # 5.83 GiB resident where the estimate said 3.86).
        slot_dtype = np.int32 if len(srv.all_doc_ids) < (1 << 31) else np.int64
        for term in list(parts):
            segs = parts.pop(term)
            segs.sort(key=lambda t: t[0])  # docID order across segments
            ids = np.concatenate([s[1] for s in segs])
            srv.term_post[term] = _TermPostings(
                np.searchsorted(srv.all_doc_ids, ids).astype(slot_dtype, copy=False),
                np.concatenate([s[2] for s in segs]),
            )
        return srv

    def query(self, query_text: str, k: int) -> list[tuple[int, float]]:
        """[(doc_id, score)] rank order — identical semantics to
        wand.query_topk (term-ordered accumulation, δ constant,
        argsort-parity ties, δ-padding)."""
        p = self.params
        toks = ws_split(standardize_data(query_text))
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1

        # δ constant folded in term order (matches the engine fold)
        qconst = 0.0
        if p.variant == "plus":
            acc = 0.0
            for t in sorted(qtf):
                acc += qtf[t] * self.term_idf.get(t, 0.0)
            qconst = p.delta * acc

        # dense scatter-add accumulation: per doc the additions happen
        # in ascending term order (same fold as the WAND kernel →
        # bit-identical scores), but each term costs O(postings)
        # instead of an O(n log n) candidate re-sort.  The accumulator
        # is slot-indexed (position in the sorted doc-id census) so
        # sparse id spaces — chunked corpora at CHUNK_ID_BASE ≈ 1e9 —
        # cost O(n_docs), not O(max_id).
        size = len(self.all_doc_ids)
        score = np.zeros(size, dtype=np.float64)
        matched = np.zeros(size, dtype=bool)
        for t in sorted(qtf):  # == term_id order (lexical dictionary)
            tp = self.term_post.get(t)
            idf = self.term_idf.get(t, 0.0)
            if tp is None or idf == 0.0:
                continue
            w = float(qtf[t]) * idf
            score[tp.slots] += w * tp.contribs  # doc_ids unique per term
            matched[tp.slots] = True
        cand_ids = self.all_doc_ids[matched]
        cand_ms = score[matched]

        n = len(cand_ids)
        # δ-padding: unmatched docs score exactly qconst, and only the
        # k highest unmatched ids can ever place.  Pads join the
        # candidate pool whenever they could outrank a matched row —
        # deficit (n < k) or negative weights (okapi ε < 0 → matched
        # can score below qconst); the union then ranks on the FULL
        # score (qconst + ms vs qconst), exactly like the distributed
        # pad-query window.  The no-pad fast path ranks on raw ms (the
        # distributed matched window) — adding the constant only after
        # selection, so no tie can be manufactured by the addition.
        need_pads = n < k or getattr(self, "has_negative_idf", False)
        if not need_pads:
            order = np.lexsort((cand_ids, cand_ms))
            sel = order[-min(k, n):][::-1]
            return [(int(cand_ids[i]), qconst + float(cand_ms[i])) for i in sel]

        cand_scores = qconst + cand_ms
        matched_set = set(cand_ids.tolist())
        pad_ids = []
        for d in self.all_doc_ids[::-1]:
            if len(pad_ids) == k:
                break
            if int(d) not in matched_set:
                pad_ids.append(int(d))
        if pad_ids:
            cand_ids = np.concatenate([cand_ids, np.array(pad_ids, dtype=np.int64)])
            cand_scores = np.concatenate(
                [cand_scores, np.full(len(pad_ids), qconst, dtype=np.float64)]
            )
        k_loc = min(k, len(cand_ids))
        order = np.lexsort((cand_ids, cand_scores))
        sel = order[-k_loc:][::-1]
        return [(int(cand_ids[i]), float(cand_scores[i])) for i in sel]

    # ------------------------------------------------------------------
    # sharded serving: doc-partition scatter-gather inside one node
    # ------------------------------------------------------------------
    def start_workers(self, n_workers: int) -> None:
        """Fork a pool of ``n_workers`` shard workers, each owning a
        contiguous slice of the doc-id census.  Fork shares the loaded
        postings copy-on-write (numpy data pages are never written, so
        resident cost stays one index), and each query fans out as
        slice-local dense accumulation + slice top-k, merged by the
        SAME lexsort rule as ``query`` — results are bit-identical
        (tests/test_serving.py::test_query_sharded_bit_identical):
        per-doc adds stay in ascending term order inside one shard,
        shards own disjoint doc ids, and the global top-k is a subset
        of the union of per-shard top-ks.  This is the single-node
        half of the documented scale-out story (the cross-node half is
        the same scatter-gather over doc partitions).

        ONE pool per process: workers resolve the module-global
        ``_SHARD_SERVER`` at fork time, so a second live pool in the
        same process would keep serving its own fork-time snapshot
        while the global silently repoints — refused here
        (tests/test_serving.py::test_one_pool_per_process)."""
        import multiprocessing as mp

        if getattr(self, "_pool", None) is not None:
            raise RuntimeError("workers already started")
        global _SHARD_SERVER
        if (
            _SHARD_SERVER is not None
            and _SHARD_SERVER is not self
            and getattr(_SHARD_SERVER, "_pool", None) is not None
        ):
            raise RuntimeError(
                "another LocalIndexServer's worker pool is live in this "
                "process — one pool per process (workers capture the "
                "module-global server at fork time); stop_workers() on "
                "the other server first"
            )
        _SHARD_SERVER = self
        ctx = mp.get_context("fork")  # COW-share the loaded index
        self._pool = ctx.Pool(n_workers)
        self._n_workers = n_workers

    def stop_workers(self) -> None:
        global _SHARD_SERVER
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.terminate()
            pool.join()
            self._pool = None
        if _SHARD_SERVER is self:
            # release the global so the multi-GiB postings arrays are
            # collectable and the next start_workers starts clean
            _SHARD_SERVER = None

    def __enter__(self) -> "LocalIndexServer":
        return self

    def __exit__(self, *exc) -> None:
        self.stop_workers()

    def query_sharded(self, query_text: str, k: int) -> list[tuple[int, float]]:
        """``query`` semantics, computed by the forked shard pool.
        Deficit (< k matches) and negative-idf padding are decided from
        the shards' matched counts and served by the sequential path —
        rare at the scales where sharding matters, and bit-identity is
        then trivial."""
        if getattr(self, "_pool", None) is None:
            raise RuntimeError("call start_workers(n) first")
        p = self.params
        toks = ws_split(standardize_data(query_text))
        qtf: dict[str, int] = {}
        for t in toks:
            qtf[t] = qtf.get(t, 0) + 1
        qconst = 0.0
        if p.variant == "plus":
            acc = 0.0
            for t in sorted(qtf):
                acc += qtf[t] * self.term_idf.get(t, 0.0)
            qconst = p.delta * acc
        terms = [
            (t, float(qtf[t]) * self.term_idf[t])
            for t in sorted(qtf)
            if t in self.term_idf and self.term_idf[t] != 0.0
        ]

        S = self._n_workers
        parts = self._pool.map(_shard_topk, [(s, S, terms, k) for s in range(S)])
        n_matched = sum(n for n, _, _ in parts)
        if n_matched < k or getattr(self, "has_negative_idf", False):
            return self.query(query_text, k)
        cand_ids = np.concatenate([ids for _, ids, _ in parts])
        cand_ms = np.concatenate([ms for _, _, ms in parts])
        order = np.lexsort((cand_ids, cand_ms))
        sel = order[-min(k, len(cand_ids)):][::-1]
        return [(int(cand_ids[i]), qconst + float(cand_ms[i])) for i in sel]

    def query_parents(self, query_text: str, k: int, sharded: bool = False) -> list[int]:
        """Top-k over a chunked-corpus index (operators.chunk.
        chunked_corpus id space) with the reference's sub-id strip +
        keep-first dedup (/root/reference/src/utils.py:169-183): parent
        doc_ids in rank order — the serving-mode twin of
        operators.chunk.parent_dedup.  ``sharded=True`` routes the
        top-k through the (bit-identical) shard pool — start_workers
        first."""
        from ..operators.chunk import CHUNK_ID_BASE

        topk = self.query_sharded if sharded else self.query
        out: list[int] = []
        for doc_id, _score in topk(query_text, k):
            parent = (
                (doc_id - CHUNK_ID_BASE) // 16 if doc_id >= CHUNK_ID_BASE else doc_id
            )
            if parent not in out:
                out.append(parent)
        return out
