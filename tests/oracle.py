"""Single-process parity oracle.

A direct, dictionary-based reimplementation of the reference pipeline's
semantics (reference indexer.py / searcher.py / ranker.py — see SURVEY.md
§3.4 for the quirk list), used as the golden model for the Spark engine's
rank-identity tests. It shares only the token-level text functions with the
engine (search_engine_spark.functions.textproc — single source of truth for
tokenization); all indexing, pruning, and scoring logic here is independent
of the Spark implementation.

Not imported from /root/reference (that code can't run here: Python 3.7 /
NLTK pins, crash-at-import GloVe load, search_engine.py:13-23).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.textproc import parse_sentence, parse_web_doc


class OracleEngine:
    def __init__(self, config: EngineConfig | None = None, glove_dict=None):
        self.cfg = config or EngineConfig()
        self.glove = glove_dict or {}
        self.stemmer = None
        if self.cfg.stemming:
            from search_engine_spark.functions.stemmer import Stemmer

            self.stemmer = Stemmer()
        # term -> df  (reference inverted_idx without the file id)
        self.inverted_idx: dict[str, int] = {}
        # term -> list[(url, doc_length, tf)]
        self.postings: dict[str, list] = {}
        # url -> (doc_length, warc_ts, glove_vec)
        self.doc_stats: dict[str, tuple] = {}
        self.global_capitals: dict[str, bool] = {}
        self.entities_dict: Counter = Counter()
        self.n_docs = 0
        self.sum_dl = 0
        self.avg_dl = 0.0

    # -- build (indexer.py:33-108 semantics) --------------------------------
    def add_doc(self, url, warc_ts, text):
        doc = parse_web_doc(url, text, stemmer=self.stemmer)
        if doc is None:
            return
        for term, cap in doc.capitals.items():
            if term not in self.global_capitals:
                self.global_capitals[term] = cap
            elif not cap:
                self.global_capitals[term] = False
        for ent in doc.entities:
            self.entities_dict[ent] += 1

        gvec = np.zeros(self.cfg.glove_dim)
        if self.glove:
            for term in doc.term_tf:
                if term in self.glove:
                    gvec = gvec + self.glove[term]
            gvec = gvec / len(doc.term_tf)

        self.doc_stats[url] = (doc.doc_length, warc_ts, gvec)
        self.n_docs += 1
        self.sum_dl += doc.doc_length
        for term, tf in doc.term_tf.items():
            self.inverted_idx[term] = self.inverted_idx.get(term, 0) + 1
            self.postings.setdefault(term, []).append(
                (url, doc.doc_length, tf)
            )

    def finalize(self):
        """Merge-time vocabulary semantics (indexer.py:156-169)."""
        self.avg_dl = self.sum_dl / self.n_docs
        final_postings: dict[str, list] = {}
        final_idx: dict[str, int] = {}
        for term in sorted(self.postings):
            df = self.inverted_idx[term]
            # entity prune: literal case-sensitive membership (a faithful
            # no-op — entity keys keep original capitalization)
            if term in self.entities_dict and self.entities_dict[term] < 2:
                continue
            out_term = term
            if term in self.global_capitals and self.global_capitals[term]:
                out_term = term.upper()
            if df == 1:
                continue
            final_postings[out_term] = self.postings[term]
            final_idx[out_term] = df
        self.postings = final_postings
        self.inverted_idx = final_idx

    # -- query (searcher.py:22-136 + ranker.py:17-109 semantics) ------------
    def search(self, query_text: str, k: int = 10):
        """Returns top-k as a list of (rank, url, score, warc_ts), rank 1 best."""
        cfg = self.cfg
        query = parse_sentence(query_text, stemmer=self.stemmer).tokens
        if not query:
            return []
        n_q = len(query)

        qterm_to_idf = {}
        query_glove_vec = np.zeros(cfg.glove_dim)
        query_vec = np.zeros((2, n_q))
        term_to_doclist = {}
        for idx, term in enumerate(query):
            if self.glove and term in self.glove:
                query_glove_vec += self.glove[term]
            if term in self.inverted_idx:
                qterm_to_idf[term] = math.log10(
                    self.n_docs / self.inverted_idx[term]
                )
                query_vec[1, idx] = qterm_to_idf[term]
                if term not in term_to_doclist:
                    term_to_doclist[term] = [{idx}, self.postings[term]]
                else:
                    term_to_doclist[term][0].add(idx)
            else:
                qterm_to_idf[term] = 0
                if term not in term_to_doclist:
                    term_to_doclist[term] = [{idx}, None]
                else:
                    term_to_doclist[term][0].add(idx)
        query_glove_vec /= n_q

        threshold = int(n_q * cfg.min_match_ratio)
        pre_doc: dict[str, tuple] = {}
        counter: Counter = Counter()
        relevant: dict[str, tuple] = {}
        for term, (term_indices, doc_list) in term_to_doclist.items():
            if doc_list is None:
                continue
            for url, dl, tf_count in doc_list:
                counter[url] += 1
                if url not in pre_doc:
                    pre_doc[url] = (np.zeros((2, n_q)), dl)
                vec = pre_doc[url][0]
                tf = tf_count / dl
                for index in term_indices:
                    vec[0, index] = tf
                for idx, q_term in enumerate(query):
                    vec[1, idx] = qterm_to_idf[q_term]
                    query_vec[0, idx] = len(term_to_doclist[q_term][0]) / n_q
                if url not in relevant and counter[url] >= threshold:
                    relevant[url] = pre_doc[url]

        # ranker (ranker.py:17-109)
        scored = []
        for url, (vec, dl) in relevant.items():
            gvec = self.doc_stats[url][2]
            ts = self.doc_stats[url][1]
            word_cos = cfg.w_cosine * self._cosine(
                vec[0] * vec[1], query_vec[0] * query_vec[1]
            )
            bm25 = cfg.w_bm25 * self._bm25(vec, dl)
            glove_cos = cfg.w_glove * self._cosine(gvec, query_glove_vec)
            scored.append((word_cos + glove_cos + bm25, url, ts))

        scored.sort()  # bisect.insort equivalent: (score, url, ts) ascending
        ordered = sorted(scored, key=lambda x: (x[0], x[2]))  # stable
        top = ordered[-k:] if k <= len(ordered) else ordered
        # reference returns ascending; rank 1 = best = last element
        return [
            (rank + 1, url, score, ts)
            for rank, (score, url, ts) in enumerate(reversed(top))
        ]

    def _bm25(self, vec, doc_length):
        k, b = self.cfg.bm25_k, self.cfg.bm25_b
        score = 0
        for column in vec.T:
            idf, tf = column[1], column[0]
            score += (idf * tf * (k + 1)) / (
                tf + k * (1 - b + b * (doc_length / self.avg_dl))
            )
        return score

    def _cosine(self, v1, v2):
        num = np.dot(v1, v2)
        den = np.linalg.norm(v1) * np.linalg.norm(v2)
        if den == 0 or num == 0:
            return 0
        return num / den


def build_oracle(rows, config=None, glove_dict=None) -> OracleEngine:
    """rows: iterable of (url, warc_ts, text)."""
    eng = OracleEngine(config, glove_dict)
    for url, ts, text in rows:
        eng.add_doc(url, ts, text)
    eng.finalize()
    return eng
