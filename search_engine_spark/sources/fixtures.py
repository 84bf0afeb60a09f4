"""Deterministic synthetic ``web_pages`` corpus (FIXTURES.md §1).

Seed-42, Zipfian bag-of-words text over a 5,000-term vocabulary with the
special-token rows that exercise every tokenizer operator (SURVEY.md §2.2)
and every pruning/tie-break quirk (SURVEY.md §3.4). No external data.

Generation is vectorized with numpy; rows are deterministic for a given
``n_rows`` (the whole corpus is drawn in one seeded pass).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
CATEGORIES = [
    "news", "sports", "tech", "health", "science", "travel", "food",
    "music", "film", "books", "art", "auto", "home", "style", "biz",
    "law", "edu", "gaming", "space", "nature", "history", "maps", "misc",
]
EPOCH = _dt.datetime(2020, 7, 27, tzinfo=_dt.timezone.utc)

# snippets injected mid-sentence in known row slots (FIXTURES.md special list)
SPECIAL_SNIPPETS = [
    "breaking #COVID19 and #StayHome plus #MixedCaseTag updates",       # P10
    "per @WHO and @some_user reports",                                  # P11
    "counts 68,800 then 123,456,789 and 3.5 billion near 2020 mark",    # P14
    "rates 50 % and 3.5 percent and 10-20 % swings",                    # P13
    "portions 3/4 then 1 3/4 also 6\\8 served",                         # P12
    "truly state-of-the-art COVID-19 methods -start here",              # P15
    "links https://t.co/abc123 with https://www.instagram.com/p/XYZ/?igshid=o9k inline",  # P5/P16
    "gained 5k and 3.2M followers",                                     # P17
    "the World Health Organization convened today",                     # P9
    "index Nasdaq rallied while Nasdaq futures gained",                 # M7 always-cap
    "rare zzyzxunique keyword",                                         # M5 df==1
    "мир 世界 🙂 mixed scripts here",                                    # P6
]
#: appears in exactly one doc → single-doc entity + df==1 paths (M5/M6)
ATLANTIS_SNIPPET = "lost Atlantis resurfaced briefly"
#: rows whose text cleans to nothing (drop path, parser_module.py:164-171)
EMPTY_SNIPPET = "https://t.co/onlyurl 🙂🙂 世界"


def _vocab(vocab_size: int | None = None) -> np.ndarray:
    if vocab_size is None:
        return np.array([f"term{i:04d}" for i in range(VOCAB_SIZE)])
    # wide zero-padding so lexicographic term order stays numeric order at
    # any vocabulary size (parquet row-group term pruning relies on sorted
    # term ranges)
    return np.array([f"t{i:07d}" for i in range(vocab_size)])


def generate_web_pages(
    n_rows: int,
    vocab_size: int | None = None,
    zipf_s: float | None = None,
) -> pa.Table:
    """Build the corpus as an Arrow table (deterministic for given n_rows).

    The default (5,000-term, s=1.1) vocabulary is byte-stable across rounds
    — every cached fixture and test golden depends on it. ``vocab_size`` /
    ``zipf_s`` produce the *web-shaped* variant (e.g. 2M terms: most terms
    df<10 while head terms still cover most tokens) used by the incremental
    compaction benchmark — on the dense default every (bucket, term) group
    is touched by any increment, which says nothing about a real crawl's
    vocabulary.
    """
    rng = np.random.default_rng(SEED)
    vocab = _vocab(vocab_size)
    V = len(vocab)
    ranks = np.arange(1, V + 1, dtype=np.float64)
    probs = ranks ** (-(ZIPF_S if zipf_s is None else zipf_s))
    probs /= probs.sum()

    lengths = rng.integers(5, 201, size=n_rows)
    total = int(lengths.sum())
    flat = rng.choice(V, size=total, p=probs)
    offsets = np.concatenate(([0], np.cumsum(lengths)))

    urls = [
        f"https://site{i % 997}.example/{CATEGORIES[i % 23]}/page-{i}"
        for i in range(n_rows)
    ]
    ts = [EPOCH + _dt.timedelta(seconds=int(i) * 37) for i in range(n_rows)]
    langs = ["en" if i % 50 < 49 else ("de" if i % 100 < 50 else "fr")
             for i in range(n_rows)]

    texts: list[str] = []
    n_special = len(SPECIAL_SNIPPETS)
    for i in range(n_rows):
        words = vocab[flat[offsets[i]:offsets[i + 1]]]
        body = " ".join(words)
        # special snippets recur on a stride so every scale has them
        if i % 17 == 3:
            snip = SPECIAL_SNIPPETS[(i // 17) % n_special]
            body = body[: len(body) // 2] + " " + snip + " " + body[len(body) // 2:]
        if i == 41:
            body = body + " " + ATLANTIS_SNIPPET + " indeed"
        if i % 613 == 7:
            body = EMPTY_SNIPPET  # cleans to nothing → dropped by the parser
        texts.append(body)

    html = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_web_pages(path: str, n_rows: int, row_group_size: int = 8_192,
                    vocab_size: int | None = None,
                    zipf_s: float | None = None) -> str:
    """Write the fixture corpus as one parquet file.

    Row groups are kept small (~15 MB): Spark's byte-range input splits
    cannot cut inside a row group, so a single-file fixture with giant row
    groups silently caps scan parallelism at the row-group count no matter
    how many cores run — production web corpora come as thousands of
    files, which this layout emulates within one file.
    """
    table = generate_web_pages(n_rows, vocab_size=vocab_size, zipf_s=zipf_s)
    pq.write_table(table, path, compression="snappy",
                   row_group_size=row_group_size)
    return path


# Fixture query set (FIXTURES.md §2): exercises hot/rare/unknown terms,
# min-match thresholds, duplicate-term per-position scoring, tokenizer forms,
# pruned-vocabulary misses, and score/date tie-breaks.
FIXTURE_QUERIES = [
    (1, "term0000"),                                 # hottest term
    (2, "term4993"),                                 # rare term
    (3, "qqqqunknownterm"),                          # unknown → idf 0
    (4, "term0001 term0042"),                        # 2 tokens → threshold 0
    (5, "term0000 term0003 term0107 term1500"),
    (6, "term0002 term0002 term0850"),               # duplicated query term
    (7, "#COVID19 cases"),                           # hashtag form
    (8, "@WHO guidance term0004"),                   # mention form
    (9, "68,800 term0005"),                          # number normalization
    (10, "50 % term0006"),                           # percent form
    (11, "3/4 term0007"),                            # fraction form
    (12, "state-of-the-art term0008"),               # dash form
    (13, "world health organization term0009"),      # multi-word entity token
    (14, "zzyzxunique"),                             # df==1 → pruned → empty
    (15, "nasdaq term0010"),                         # uppercase-rewrite miss
    (16, "atlantis"),                                # single-doc entity term
    (17, "term0000 term0001 term0002 term0003 term0004 term0005 term0006 term0007"),
    (18, "term0011 5k"),
    (19, "term0012 3.2M views"),
    (20, "the of and term0013"),                     # stopwords collapse
    (21, "term0500 term0501"),
    (22, "page-100 site100.example"),                # url-token query
    (23, "term0020 term0021 term0022"),
    (24, "covid term0023"),
    (25, "term0100 term0200 term0300 term0400 term0500 term0600"),
]
