"""Pure-Python reference oracle: dict inverted index + exhaustive BM25.

This is the ground truth the distributed engine must match
rank-identically (docIDs AND fixed-point scores), mirroring how the
reference validates its ANN index against a brute-force scan
(/root/reference/src/query_disk_index.rs:262-276 ``evaluate``).

Shares tokenize/term_hash/bm25 with the Spark UDFs — one source of
truth (SURVEY.md §5.1).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from .common.bm25 import K1, bm25_idf, bm25_tf_norm, to_fixed
from .common.hashing import term_hash
from .common.textproc import tokenize

BLOCK_SIZE = 128  # posting block granularity (block-max metadata unit)


@dataclass
class OracleIndex:
    n_docs: int = 0
    total_len: int = 0
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.total_len / self.n_docs if self.n_docs else 0.0

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, docs: list[tuple[int, str]]) -> "OracleIndex":
        """docs: [(doc_id, text)] — text already extracted."""
        idx = cls()
        for doc_id, text in docs:
            toks = tokenize(text)
            idx.n_docs += 1
            idx.total_len += len(toks)
            idx.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                idx.postings.setdefault(term, {})[doc_id] = tf
        return idx

    # ---------------------------------------------------------------- query
    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, int, int, float]]:
        """Exhaustive BM25 top-k.

        Returns [(rank, doc_id, score_fixed, score)] with rank 1-based.
        Query terms are deduplicated (set semantics, weight 1 each —
        the engine applies the same rule).  Scores are summed in
        fixed-point int64, term contributions added in ascending
        term_hash order; ties broken by ascending doc_id — the T7
        determinism contract (SURVEY.md §2.6).
        """
        terms = sorted(set(tokenize(query_text)), key=term_hash)
        acc: dict[int, int] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(len(plist), self.n_docs)
            for doc_id, tf in plist.items():
                contrib = idf * (K1 + 1.0) * bm25_tf_norm(
                    tf, self.doc_len[doc_id], self.avgdl
                )
                acc[doc_id] = acc.get(doc_id, 0) + to_fixed(contrib)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [
            (r + 1, doc_id, sf, sf / 2.0**32)
            for r, (doc_id, sf) in enumerate(ranked)
        ]

    def topk_weighted(
        self, terms: list[tuple[str, float]], k: int = 10
    ) -> list[tuple[int, int, int, float]]:
        """Weighted multi-term BM25 — the reference's query algebra
        (sum of weighted per-term scores, common.rs:215-274; weights
        may be negative).  Duplicate terms accumulate weight."""
        weights: dict[str, float] = {}
        for text, w in terms:
            for t in tokenize(text):
                weights[t] = weights.get(t, 0.0) + w
        acc: dict[int, int] = {}
        for term in sorted(weights, key=term_hash):
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = bm25_idf(len(plist), self.n_docs)
            w = weights[term]
            for doc_id, tf in plist.items():
                contrib = (
                    idf
                    * (K1 + 1.0)
                    * bm25_tf_norm(tf, self.doc_len[doc_id], self.avgdl)
                ) * w
                acc[doc_id] = acc.get(doc_id, 0) + to_fixed(contrib)
        ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [
            (r + 1, doc_id, sf, sf / 2.0**32)
            for r, (doc_id, sf) in enumerate(ranked)
        ]

    # ------------------------------------------------------------- goldens
    def postings_golden(self, term: str) -> dict | None:
        """Expected decoded index structure for one term
        (FIXTURES.md §4): sorted doc ids, tfs, block count, block-max
        tf_norm per 128-doc block."""
        plist = self.postings.get(term)
        if not plist:
            return None
        items = sorted(plist.items())
        doc_ids = [d for d, _ in items]
        tfs = [t for _, t in items]
        block_maxes = []
        for i in range(0, len(items), BLOCK_SIZE):
            block = items[i : i + BLOCK_SIZE]
            block_maxes.append(
                max(
                    bm25_tf_norm(tf, self.doc_len[d], self.avgdl)
                    for d, tf in block
                )
            )
        return {
            "term_hash": term_hash(term),
            "df": len(items),
            "doc_ids": doc_ids,
            "tfs": tfs,
            "n_blocks": len(block_maxes),
            "block_maxes": block_maxes,
        }

    def stats(self) -> dict:
        return {"N": self.n_docs, "avgdl": self.avgdl}
