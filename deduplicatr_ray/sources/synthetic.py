"""Deterministic synthetic fixture corpora (S6; FIXTURES.md §§1-2).

Mirrors the reference's checked-in fixture trees of known duplicate
files/dirs (``test/fixtures/`` in the public repo, approximate citation —
reference mount empty at survey time), adapted to the page-table world of
BASELINE.json:15. Ground truth pairs are recorded AT INJECTION TIME; the
recall >= 0.99 gate (BASELINE.json:2) is asserted against them.

Everything is a pure function of (corpus name, seed=42) — no wall clock, no
external data. ``truth_pairs`` carries ``jaccard_true`` (exact shingle-set
Jaccard under the canonical config) so recall can be asserted over the pairs
the canonical threshold tau=0.7 is defined to catch.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa

from ..config import CANONICAL
from ..functions.hashing import TokenHasher, shingle_hashes
from ..functions.textnorm import tokenize

SEED = 42
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_LANGS = ["en", "de", "fr", "es", "zh"]
_LANG_W = [0.45, 0.15, 0.13, 0.14, 0.13]

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
    "or", "pa", "qi", "ru", "sa", "te", "ul", "va", "wi", "xo",
]


def _vocab(rng: np.random.Generator, size: int = 200) -> list[str]:
    words = []
    for i in range(size):
        k = int(rng.integers(2, 5))
        words.append("".join(rng.choice(_SYLLABLES) for _ in range(k)) + str(i % 10))
    return words


def _jaccard_sets(sa: np.ndarray, sb: np.ndarray, text_a: str, text_b: str) -> float:
    if len(sa) == 0 and len(sb) == 0:
        return 1.0 if text_a == text_b else 0.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


class _Builder:
    """Accumulates pages + truth pairs for one corpus."""

    def __init__(self, corpus: str, rng: np.random.Generator) -> None:
        self.corpus = corpus
        self.rng = rng
        self.html_only = False  # force every page through the M4 extractor
        self.vocab = _vocab(rng)
        self.urls: list[str] = []
        self.ts: list[int] = []
        self.htmls: list[bytes | None] = []
        self.texts: list[str | None] = []
        self.langs: list[str] = []
        self._bodies: list[str] = []  # true text per row (for truth jaccard)
        self._url_idx: dict[str, int] = {}
        self.truth: list[tuple[str, str, str, float]] = []
        self._cfg = CANONICAL
        self._th = TokenHasher(CANONICAL.token_hash_seed)
        self._shingle_memo: dict[str, np.ndarray] = {}

    def _shingles(self, text: str) -> np.ndarray:
        s = self._shingle_memo.get(text)
        if s is None:
            s = shingle_hashes(
                self._th.hash_tokens(tokenize(text)), self._cfg.shingle_w
            )
            self._shingle_memo[text] = s
        return s

    def sample_tokens(self, n: int) -> list[str]:
        idx = self.rng.integers(0, len(self.vocab), size=n)
        return [self.vocab[i] for i in idx]

    def sample_text(self, lo: int = 30, hi: int = 400) -> str:
        n = int(self.rng.integers(lo, hi + 1))
        return " ".join(self.sample_tokens(n))

    def add_page(self, text: str, lang: str | None = None, html: bytes | None = None) -> str:
        idx = len(self.urls)
        if lang is None:
            lang = str(self.rng.choice(_LANGS, p=_LANG_W))
        url = f"https://fix{self.corpus}.example/{lang}/p{idx:06d}"
        mode = self.rng.random()
        if html is None:
            # round-trips through the frozen extractor: the only text content
            # in the template is the body itself (tokens are [a-z0-9 ] only)
            html = (
                f"<html><head><title></title><style>body{{color:red}}</style>"
                f"</head><body><p>{text}</p><!-- crawl --></body></html>"
            ).encode("utf-8")
        text_col: str | None = text
        html_col: bytes | None = html
        if self.html_only:
            text_col = None      # whole corpus rides the extractor hot path
        elif mode < 0.10:
            text_col = None      # html-only path: extractor must recover text
        elif mode < 0.20:
            html_col = None      # text-only path
        self.urls.append(url)
        self.ts.append(EPOCH_US + idx * 1_000_000)
        self.htmls.append(html_col)
        self.texts.append(text_col)
        self.langs.append(lang)
        self._bodies.append(text)
        self._url_idx[url] = idx
        return url

    def add_truth_cluster(self, urls: list[str], kind: str) -> None:
        """Record all within-cluster pairs (closure), with true Jaccard."""
        body = {u: self._bodies[self._url_idx[u]] for u in urls}
        for a, b in itertools.combinations(sorted(urls), 2):
            j = 1.0 if body[a] == body[b] else _jaccard_sets(
                self._shingles(body[a]), self._shingles(body[b]), body[a], body[b]
            )
            self.truth.append((a, b, kind, j))

    def mutate(self, text: str, frac_lo: float = 0.01, frac_hi: float = 0.08) -> str:
        """Contiguous-span token edit (keeps shingle Jaccard high; FIXTURES §2)."""
        toks = text.split(" ")
        n = len(toks)
        m = max(1, int(n * self.rng.uniform(frac_lo, frac_hi)))
        start = int(self.rng.integers(0, max(1, n - m)))
        op = self.rng.random()
        repl = self.sample_tokens(m)
        if op < 0.34:            # delete span
            toks = toks[:start] + toks[start + m:]
        elif op < 0.67:          # insert span
            toks = toks[:start] + repl + toks[start:]
        else:                    # replace span
            toks = toks[:start] + repl + toks[start + m:]
        return " ".join(toks)

    def tables(self) -> tuple[pa.Table, pa.Table]:
        pages = pa.table(
            {
                "url": pa.array(self.urls, pa.string()),
                "warc_ts": pa.array(self.ts, pa.timestamp("us")),
                "html": pa.array(self.htmls, pa.binary()),
                "text": pa.array(self.texts, pa.string()),
                "lang": pa.array(self.langs, pa.string()),
            }
        )
        truth = pa.table(
            {
                "url_a": pa.array([t[0] for t in self.truth], pa.string()),
                "url_b": pa.array([t[1] for t in self.truth], pa.string()),
                "kind": pa.array([t[2] for t in self.truth], pa.string()),
                "jaccard_true": pa.array([t[3] for t in self.truth], pa.float64()),
            }
        )
        return pages, truth


def _gen_exact(b: _Builder) -> None:
    bases = [b.sample_text() for _ in range(100)]
    urls_per_base = []
    for t in bases:
        urls_per_base.append([b.add_page(t)])
    dup_idx = b.rng.choice(100, size=50, replace=False)
    for i in dup_idx:
        copies = int(b.rng.integers(1, 5))
        for _ in range(copies):
            urls_per_base[i].append(b.add_page(bases[i]))
    for i in dup_idx:
        b.add_truth_cluster(urls_per_base[i], "exact")
    while len(b.urls) < 300:
        b.add_page(b.sample_text())


def _gen_near(b: _Builder) -> None:
    bases = [b.sample_text(100, 400) for _ in range(100)]
    clusters = [[b.add_page(t)] for t in bases]
    dup_idx = b.rng.choice(100, size=60, replace=False)
    for i in dup_idx:
        for _ in range(int(b.rng.integers(1, 4))):
            clusters[i].append(b.add_page(b.mutate(bases[i])))
    for i in dup_idx:
        b.add_truth_cluster(clusters[i], "near")
    while len(b.urls) < 300:
        b.add_page(b.sample_text())


_N_TEMPLATES = 8


def _boiler_wrap(b: _Builder, templates: list[tuple[str, str]], body: str, t: int) -> str:
    head, foot = templates[t]
    return f"{head} {body} {foot}"


def _gen_boiler(b: _Builder) -> None:
    # header ~30 tokens + footer ~20 tokens per template
    templates = [
        (" ".join(b.sample_tokens(30)), " ".join(b.sample_tokens(20)))
        for _ in range(_N_TEMPLATES)
    ]
    # duplicated bodies are long (>=260 tokens) so that same-body /
    # different-template pairs sit above tau=0.7 shingle Jaccard
    clusters = []
    for _ in range(40):
        body = b.sample_text(260, 400)
        k = int(b.rng.integers(2, 5))
        ts = b.rng.choice(_N_TEMPLATES, size=k, replace=False)
        clusters.append([b.add_page(_boiler_wrap(b, templates, body, t)) for t in ts])
    for urls in clusters:
        b.add_truth_cluster(urls, "near")
    # negative controls: unique bodies sharing templates (absent from truth)
    while len(b.urls) < 300:
        t = int(b.rng.integers(0, _N_TEMPLATES))
        b.add_page(_boiler_wrap(b, templates, b.sample_text(30, 120), t))


def _gen_mixed(b: _Builder) -> None:
    # 5 hot clusters of 30-60 members (exercises band-group handling)
    for _ in range(5):
        base = b.sample_text(150, 300)
        k = int(b.rng.integers(30, 61))
        urls = [b.add_page(base)]
        for _ in range(k - 1):
            if b.rng.random() < 0.5:
                urls.append(b.add_page(base))
            else:
                urls.append(b.add_page(b.mutate(base, 0.01, 0.04)))
        b.add_truth_cluster(urls, "near")
    # exact-dup pattern
    for _ in range(60):
        t = b.sample_text()
        urls = [b.add_page(t) for _ in range(int(b.rng.integers(2, 4)))]
        b.add_truth_cluster(urls, "exact")
    # near-dup pattern
    for _ in range(60):
        t = b.sample_text(100, 400)
        urls = [b.add_page(t)]
        for _ in range(int(b.rng.integers(1, 3))):
            urls.append(b.add_page(b.mutate(t)))
        b.add_truth_cluster(urls, "near")
    # ~40% unique singletons
    while len(b.urls) < 1000:
        b.add_page(b.sample_text())


def _gen_edge(b: _Builder) -> None:
    b.add_page("", lang="en")
    b.add_page("   ", lang="en")
    for n in (1, 2, 3, 4):
        b.add_page(" ".join(b.sample_tokens(n)), lang="en")
    # identical text under different lang => still an exact dup (content key)
    t = b.sample_text()
    u1 = b.add_page(t, lang="en")
    u2 = b.add_page(t, lang="de")
    b.add_truth_cluster([u1, u2], "exact")
    # non-utf8 (latin-1) html bytes; no text column
    latin = "caf\xe9 na\xefve r\xe9sum\xe9 " * 10
    html = f"<html><body><p>{latin.strip()}</p></body></html>".encode("latin-1")
    b.urls.append(f"https://fixedge.example/fr/p{len(b.urls):06d}")
    b.ts.append(EPOCH_US + len(b.urls) * 1_000_000)
    b.htmls.append(html)
    b.texts.append(None)
    b.langs.append("fr")
    b._bodies.append(latin.strip())
    # one 200 KiB doc
    big = " ".join(b.sample_tokens(40_000))
    b.add_page(big, lang="en")
    while len(b.urls) < 50:
        b.add_page(b.sample_text(1, 10))


def _gen_htmlmix(b: _Builder) -> None:
    """The ``mixed`` workload with EVERY page html-only (text = NULL): the
    recall gate runs with the M4 extractor in the hot path for 100% of rows
    (VERDICT r1 "What's missing" #4)."""
    b.html_only = True
    _gen_mixed(b)


_GENERATORS = {
    "exact": _gen_exact,
    "near": _gen_near,
    "boiler": _gen_boiler,
    "mixed": _gen_mixed,
    "edge": _gen_edge,
    "htmlmix": _gen_htmlmix,
}


def gen_corpus(name: str, seed: int = SEED) -> tuple[pa.Table, pa.Table]:
    """(pages, truth_pairs) Arrow tables for a named fixture corpus."""
    if name not in _GENERATORS:
        raise KeyError(f"unknown corpus {name!r}; have {sorted(_GENERATORS)}")
    b = _Builder(name, np.random.Generator(np.random.PCG64(seed)))
    _GENERATORS[name](b)
    return b.tables()


def gen_pages_dataset(name: str, seed: int = SEED):
    """Fixture corpus as a ray.data.Dataset (pages schema)."""
    import ray.data as rd

    pages, _ = gen_corpus(name, seed)
    return rd.from_arrow(pages)
